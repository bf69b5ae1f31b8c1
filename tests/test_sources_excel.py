"""XLSX workbook reader (SURVEY §2 S4) — format parse, 3-row schema
block, and the broadcast-dim query's plan shape.

The reader is pinned two independent ways: a HAND-BUILT workbook whose
XML parts are written literally in this file (so a mirrored bug in the
synth twin's writer cannot hide), and roundtrip properties through
`synth.write_xlsx`."""

from __future__ import annotations

import io
import zipfile

import pytest

from pdf_extractor_spark.sources_excel import (
    a1_to_rowcol,
    excel_rows_df,
    excel_schema_df,
    parse_schema_block,
    read_xlsx_grid,
)
from pdf_extractor_spark.synth import write_xlsx

_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def _zip(parts: dict[str, str]) -> bytes:
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for name, data in parts.items():
            zf.writestr(name, data)
    return bio.getvalue()


def _hand_built_xlsx() -> bytes:
    """A workbook written cell-by-cell BY HAND (not via the twin):
    shared strings (incl. a multi-run <si>), an inline string, a cached
    formula string, a boolean, integral + fractional numbers, a sparse
    row, an unanchored cell (no r=), and a fully empty leading row/col
    (usedRange must trim them)."""
    sheet = f"""<?xml version="1.0"?>
<worksheet {_NS}><sheetData>
<row r="2">
  <c r="B2" t="s"><v>0</v></c>
  <c r="C2" t="s"><v>1</v></c>
  <c r="D2" t="inlineStr"><is><t>inline cell</t></is></c>
</row>
<row r="3">
  <c r="B3"><v>42</v></c>
  <c r="D3"><v>2.5</v></c>
</row>
<row r="4">
  <c r="B4" t="b"><v>1</v></c>
  <c t="str"><v>cached formula</v></c>
  <c r="D4" t="s"><v>2</v></c>
</row>
</sheetData></worksheet>"""
    sst = f"""<?xml version="1.0"?>
<sst {_NS}><si><t>alpha</t></si><si><r><t>be</t></r><r><t>ta</t></r></si>
<si><t>gamma</t></si></sst>"""
    workbook = f"""<?xml version="1.0"?>
<workbook {_NS} xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>"""
    return _zip(
        {
            "xl/workbook.xml": workbook,
            "xl/_rels/workbook.xml.rels": rels,
            "xl/worksheets/sheet1.xml": sheet,
            "xl/sharedStrings.xml": sst,
        }
    )


def test_a1_refs():
    assert a1_to_rowcol("A1") == (0, 0)
    assert a1_to_rowcol("B3") == (2, 1)
    assert a1_to_rowcol("Z9") == (8, 25)
    assert a1_to_rowcol("AA10") == (9, 26)
    assert a1_to_rowcol("AZT3") == (2, 26 * 26 + 26 * 26 + 19)
    with pytest.raises(ValueError):
        a1_to_rowcol("3B")


def test_hand_built_workbook_grid():
    grid = read_xlsx_grid(_hand_built_xlsx())
    # usedRange trims empty row 1 and column A; the unanchored t="str"
    # cell lands one column after B4 (column C)
    assert grid == [
        ["alpha", "beta", "inline cell"],
        [42, None, 2.5],
        [True, "cached formula", "gamma"],
    ]
    # sheet selection by name; unknown name fails fast
    assert read_xlsx_grid(_hand_built_xlsx(), sheet="Data")[0][0] == "alpha"
    with pytest.raises(ValueError):
        read_xlsx_grid(_hand_built_xlsx(), sheet="Nope")


def test_malformed_workbooks_raise():
    with pytest.raises(ValueError):
        read_xlsx_grid(b"not a zip at all")
    with pytest.raises(ValueError):
        read_xlsx_grid(_zip({"word/document.xml": "<a/>"}))  # no workbook
    # shared-string index out of range
    bad = _zip(
        {
            "xl/workbook.xml": f'<workbook {_NS}/>',
            "xl/worksheets/sheet1.xml": (
                f'<worksheet {_NS}><sheetData><row r="1">'
                '<c r="A1" t="s"><v>7</v></c></row></sheetData></worksheet>'
            ),
        }
    )
    with pytest.raises(ValueError):
        read_xlsx_grid(bad)


def test_twin_roundtrip_mixed_types(tmp_path):
    grid = [
        ["Alternative Column Names", "nation name", None, None],
        ["Column Extraction Rules", "uppercase", "quarters", None],
        [None, "N_NAME", "WEIGHT", "APPROVED"],
        [None, "FRANCE", 1.5, "Y"],
        [None, "CANADA", 2, "n"],
        [None, "PERU & <CO>", 0.25, True],  # xml-escaping in the twin
    ]
    path = str(tmp_path / "dim.xlsx")
    payload = write_xlsx(grid, path)
    want = [[c if c not in ("", None) else None for c in r] for r in grid]
    assert read_xlsx_grid(payload) == want
    assert read_xlsx_grid(path) == want  # path form reads the same
    # determinism: same grid → same bytes
    assert write_xlsx(grid) == payload


def test_schema_block_matches_reference_semantics():
    """Reference parse (services/sharepoint_schema_builder.py:174-218):
    label cells excluded from the maps, empty headers skipped, values
    keyed by the stripped header."""
    grid = [
        ["Alternative Column Names", "alt A", None, "alt D"],
        [None, "Column Extraction Rules", "rule C", None],
        [None, " A ", "C", None],
        [None, "data", "rows", "ignored"],
    ]
    fields, alt, rules = parse_schema_block(grid)
    assert fields == ["A", "C"]
    assert alt == {"A": "alt A"}  # col-0 label excluded; col-3 header empty
    # row-1 label sits in column 1 → header 'A' gets NO rule; 'C' does
    assert rules == {"C": "rule C"}
    with pytest.raises(ValueError):
        parse_schema_block(grid[:2])


def test_excel_dfs_and_approved_filter(spark, tmp_path):
    from pyspark.sql import functions as F

    grid = [
        ["Alternative Column Names", "name", None],
        ["Column Extraction Rules", None, "flag"],
        [None, "NAME", "APPROVED"],
        [None, "alpha", "Y"],
        [None, "beta", "y"],
        [None, "gamma", "n"],
        [None, "delta", None],  # gap → '' → filtered like the reference's NaN
    ]
    path = str(tmp_path / "wb.xlsx")
    write_xlsx(grid, path)
    rows = excel_rows_df(spark, path)
    assert rows.columns == ["NAME", "APPROVED"]
    kept = (
        rows.na.fill("")
        .filter(F.upper("APPROVED") == "Y")
        .select("NAME")
        .rdd.map(lambda r: r[0])
        .collect()
    )
    assert sorted(kept) == ["alpha", "beta"]
    schema = excel_schema_df(spark, path).collect()
    assert [(r.field, r.alternative_name, r.extraction_rule) for r in schema] == [
        ("NAME", "name", ""),
        ("APPROVED", "", "flag"),
    ]
    with pytest.raises(ValueError):
        excel_rows_df(spark, str(write_and(tmp_path)))


def write_and(tmp_path):
    p = tmp_path / "short.xlsx"
    write_xlsx([[None, "H1"], [None, "H2"], [None, "H3"]], str(p))  # no data rows
    return p


def test_s4_query_broadcasts_dim(spark):
    """Plan pin: the workbook dim must reach the customer join as a
    broadcast — the fact side never shuffles for it."""
    from pdf_extractor_spark.operators.registry import all_ops

    df = all_ops()["s4_excel_dim"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert df.count() > 0


def test_reader_total_on_mutated_workbooks():
    """Config-plane inputs fail FAST (ValueError) but never crash with
    anything else: byte-flip a valid workbook at every 37th offset and
    assert the reader either parses a grid or raises ValueError."""
    base = bytearray(write_xlsx([[None, "H"], ["x", 1.5], [True, "y"]]))
    outcomes = {"ok": 0, "rejected": 0}
    for off in range(0, len(base), 37):
        mutated = bytes(base[:off]) + bytes([base[off] ^ 0xFF]) + bytes(base[off + 1 :])
        try:
            read_xlsx_grid(mutated)
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    assert outcomes["rejected"] > 0  # corruption is actually detected
    assert sum(outcomes.values()) == len(range(0, len(base), 37))
