"""Local XLSX workbook reader + the reference's 3-row schema-block parse.

The reference fetches a workbook's usedRange over the Microsoft Graph API
(reference services/sharepoint_schema_builder.py:123-132, session variant
sync_to_onedrive.py:147-157) and consumes it as a 2-D values grid: rows
0/1 carry per-column "Alternative Column Names" / "Column Extraction
Rules" annotations, row 2 the real headers, data from row 3
(reference finetune_commands/excel2training.py:108-116,150-153). The
REMOTE transport is out of scope for this engine (SURVEY §7 — external
nondeterministic service), but the data-processing semantics are not:
this module parses the workbook format itself, from scratch on the
stdlib (zipfile + ElementTree; an .xlsx is a ZIP of SpreadsheetML parts),
and reproduces the same usedRange grid a Graph client would see:

- shared strings (`t="s"`), inline strings (`t="inlineStr"`), cached
  formula strings (`t="str"`), booleans (`t="b"`), numbers (integral
  floats collapse to int, matching Graph's JSON rendering);
- sparse cells: missing `r=` anchors advance column-by-column, gaps fill
  with None;
- usedRange semantics: the grid is trimmed to the bounding box of
  non-empty cells (leading AND trailing empty rows/columns drop).

Dimension workbooks are small by definition (they configure a job), so
the grid parses driver-side and enters Spark via createDataFrame +
F.broadcast — the scan side of the join never shuffles (SURVEY §2 S4).
A malformed workbook raises ValueError: config inputs fail fast, unlike
crawl payloads (failures-as-data applies to the data plane only).
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession

_A1_RE = re.compile(r"([A-Z]+)(\d+)")


def a1_to_rowcol(ref: str) -> tuple[int, int]:
    """'B3' → (row0, col0) = (2, 1)."""
    m = _A1_RE.fullmatch(ref)
    if not m:
        raise ValueError(f"bad cell reference {ref!r}")
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return int(m.group(2)) - 1, col - 1


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find("{*}is")
        if is_el is None:
            return None
        return "".join(tel.text or "" for tel in is_el.iterfind(".//{*}t"))
    v = c.find("{*}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        idx = int(v.text)
        if not 0 <= idx < len(shared):
            raise ValueError(f"shared-string index {idx} out of range")
        return shared[idx]
    if t == "str":
        return v.text
    if t == "b":
        return v.text.strip() == "1"
    # numeric: collapse integral floats to int, the way Graph's JSON does
    f = float(v.text)
    return int(f) if f.is_integer() else f


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iterfind(".//{*}si"):
        out.append("".join(t.text or "" for t in si.iterfind(".//{*}t")))
    return out


def _sheet_part(zf: zipfile.ZipFile, sheet: str | None) -> bytes:
    """Resolve the requested (or first) worksheet part via workbook rels."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    except KeyError:
        raise ValueError("not a workbook: missing xl/workbook.xml")
    rels = {}
    try:
        for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iterfind(
            ".//{*}Relationship"
        ):
            rels[rel.get("Id")] = rel.get("Target")
    except KeyError:
        # workbook has no rels part: legal for minimal writers — sheets
        # then resolve positionally below instead of through r:id targets
        pass
    rid_attr = (
        "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    )
    for sh in wb.iterfind(".//{*}sheet"):
        if sheet is not None and sh.get("name") != sheet:
            continue
        target = rels.get(sh.get(rid_attr), "worksheets/sheet1.xml")
        part = target if target.startswith("xl/") else "xl/" + target.lstrip("/")
        return zf.read(part)
    if sheet is not None:
        raise ValueError(f"worksheet {sheet!r} not found")
    return zf.read("xl/worksheets/sheet1.xml")  # sheetless workbook.xml


def read_xlsx_grid(src: str | bytes, sheet: str | None = None) -> list[list]:
    """Parse an .xlsx (path or bytes) → usedRange-trimmed 2-D value grid."""
    bio = io.BytesIO(src) if isinstance(src, (bytes, bytearray)) else src
    try:
        with zipfile.ZipFile(bio) as zf:
            shared = _shared_strings(zf)
            root = ET.fromstring(_sheet_part(zf, sheet))
    except ValueError:
        raise  # our own fail-fast messages pass through unchanged
    except Exception as e:
        # corrupted containers surface as BadZipFile / zlib.error /
        # ET.ParseError / EOFError / ... depending on WHERE the damage
        # sits; a config-plane reader's contract is one fail-fast
        # exception type, so everything converts to ValueError
        raise ValueError(f"malformed xlsx: {e}") from e
    cells: dict[tuple[int, int], object] = {}
    for r_el in root.iterfind(".//{*}row"):
        row_attr = r_el.get("r")
        row = int(row_attr) - 1 if row_attr else (max((k[0] for k in cells), default=-1) + 1)
        col = -1
        for c in r_el.iterfind(".//{*}c"):
            ref = c.get("r")
            if ref:
                row, col = a1_to_rowcol(ref)
            else:
                col += 1
            val = _cell_value(c, shared)
            if val is not None and val != "":
                cells[(row, col)] = val
    if not cells:
        return []
    r0 = min(k[0] for k in cells)
    r1 = max(k[0] for k in cells)
    c0 = min(k[1] for k in cells)
    c1 = max(k[1] for k in cells)
    return [
        [cells.get((r, c)) for c in range(c0, c1 + 1)] for r in range(r0, r1 + 1)
    ]


def parse_schema_block(grid: list[list]) -> tuple[list[str], dict, dict]:
    """The reference's 3-row schema-block parse → (fields,
    alternative_names, extraction_rules).

    Row 0 carries alternative column names (its label cell "Alternative
    Column Names" is excluded), row 1 extraction rules (label "Column
    Extraction Rules" excluded), row 2 the real headers; empty headers are
    skipped (reference services/sharepoint_schema_builder.py:174-218).
    """
    if len(grid) < 3:
        raise ValueError(
            "Excel file does not have the expected structure "
            "(need at least 3 rows for schema)"
        )
    alt_row, rules_row, headers_row = grid[0], grid[1], grid[2]
    alt_label = next(
        (i for i, c in enumerate(alt_row) if c == "Alternative Column Names"), None
    )
    rules_label = next(
        (i for i, c in enumerate(rules_row) if c == "Column Extraction Rules"), None
    )
    fields: list[str] = []
    alternative_names: dict[str, str] = {}
    extraction_rules: dict[str, str] = {}
    for i, header in enumerate(headers_row):
        if not (isinstance(header, str) and header.strip()):
            continue
        key = header.strip()
        fields.append(key)
        if i < len(alt_row) and alt_row[i] and i != alt_label:
            alternative_names[key] = alt_row[i]
        if i < len(rules_row) and rules_row[i] and i != rules_label:
            extraction_rules[key] = rules_row[i]
    return fields, alternative_names, extraction_rules


def excel_rows_df(spark: SparkSession, src: str | bytes) -> DataFrame:
    """Workbook → data DataFrame: row-3 headers as column names, data from
    row 4, every value stringified ('' for gaps) — the shape the reference
    builds with pd.DataFrame(values[3:], columns=values[2]) before its
    APPROVED filter (reference finetune_commands/excel2training.py:
    108-121,150-153). Requires ≥ 3 schema rows + ≥ 1 data row, like the
    reference."""
    grid = read_xlsx_grid(src)
    if len(grid) < 4:
        raise ValueError(
            "Excel file does not have the expected structure "
            "(need at least 3 schema rows + 1 data row)"
        )
    fields, _, _ = parse_schema_block(grid)
    headers = [
        (h.strip() if isinstance(h, str) else None) for h in grid[2]
    ]
    keep = [i for i, h in enumerate(headers) if h]
    rows = [
        tuple(
            "" if i >= len(r) or r[i] is None else str(r[i]) for i in keep
        )
        for r in grid[3:]
    ]
    return spark.createDataFrame(rows, schema=[headers[i] for i in keep])


def excel_schema_df(spark: SparkSession, src: str | bytes) -> DataFrame:
    """Workbook → schema dimension DataFrame (field, alternative_name,
    extraction_rule), one row per non-empty header."""
    fields, alt, rules = parse_schema_block(read_xlsx_grid(src))
    return spark.createDataFrame(
        [(f, alt.get(f, ""), rules.get(f, "")) for f in fields],
        schema=["field", "alternative_name", "extraction_rule"],
    )
