"""PDF layout parse: positioned glyph runs → reading-order text.

A from-scratch parser for uncompressed PDF content streams (the kind our
deterministic synthesizer emits and the kind any pre-inflated WARC payload
yields). It extracts positioned text runs from `BT ... ET` text objects —
`Tf` (font size), `Td`/`TD`/`Tm` (positioning), `Tj`/`TJ`/`'` (show text) —
then reconstructs reading order exactly like the reference does for PyMuPDF
span dicts: group runs into visual lines by (page, rounded y), sort lines
top-to-bottom, runs within a line left-to-right, join pages with '\n'
(reference: finetune_commands/excel2training.py:282-316 for the line
grouping/sorting; services/pdf_service.py:38 for the '\n' page join;
span dict shape at services/pdf_service.py:21-36).

Numpy lexsort does the ordering so the whole page sorts in one vectorized
call — no per-span Python comparisons.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

PDF_MAGIC = b"%PDF-"

# y coordinates within this distance belong to the same visual line
# (the reference rounds y to integer: excel2training.py:289 `round(y0)`).
LINE_Y_QUANTUM = 1.0

# optional stream dictionary (for /Filter detection) + stream body
_STREAM_RE = re.compile(
    rb"(?:<<(.*?)>>\s*)?stream\r?\n(.*?)\r?\nendstream", re.DOTALL
)
# direct /Length only: '/Length 7 0 R' is an INDIRECT object reference whose
# first number is an object id, not a byte count — slicing by it would
# destroy the stream. (?!\d) pins the capture to the FULL number first;
# without it, backtracking shrinks '70' to '7' so the R-lookahead passes
# and a prefix of the object id is misread as the length.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R\b)")
_TEXTOBJ_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

# operators inside a text object, in source order
_OP_RE = re.compile(
    rb"/(\w+)\s+([\d.+-]+)\s+Tf"                          # font + size    (g1,g2)
    rb"|([\d.+-]+)\s+([\d.+-]+)\s+T[dD]"                   # move           (g3,g4)
    rb"|([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+Tm"  # matrix (g5..g10)
    rb"|\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"                   # show string    (g11,g12)
    rb"|([\d.+-]+)\s+TL",                                   # leading        (g13)
    re.DOTALL,
)

_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b", b"\\f": b"\f",
    b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}
_ESC_RE = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")


def _unescape_pdf_string(s: bytes) -> str:
    def sub(m: "re.Match[bytes]") -> bytes:
        g = m.group(1)
        if g.isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESCAPES[b"\\" + g]

    return _ESC_RE.sub(sub, s).decode("latin-1")


def parse_glyph_runs(raw: bytes) -> list[dict]:
    """Parse positioned text runs from an uncompressed PDF byte payload.

    Returns the reference's span-record shape (services/pdf_service.py:30-36):
    [{page, bbox: (x0, y0, x1, y1), text, origin: (x, y), font_size}, ...]
    One content stream == one page (our synthesizer's layout; multi-stream
    pages would need the page tree, which the fixtures don't exercise).
    """
    runs: list[dict] = []
    for page_no, sm in enumerate(_STREAM_RE.finditer(raw)):
        sdict, stream = sm.group(1), sm.group(2)
        if sdict and b"FlateDecode" in sdict:
            # real-world content streams are zlib-compressed (/Filter
            # /FlateDecode). Binary data can end in bytes the
            # `\r?\nendstream` terminator regex would swallow, so when the
            # dict declares /Length, slice the body exactly. A corrupt
            # stream is skipped, not fatal — the document degrades to fewer
            # pages ('empty' status if nothing decodes).
            mlen = _LENGTH_RE.search(sdict)
            if mlen:
                body_start = sm.start(2)
                stream = raw[body_start: body_start + int(mlen.group(1))]
            try:
                stream = zlib.decompress(stream)
            except zlib.error:
                continue
        for tm in _TEXTOBJ_RE.finditer(stream):
            body = tm.group(1)
            x = y = 0.0
            font_size = 12.0
            leading = 14.0
            for om in _OP_RE.finditer(body):
                if om.group(2) is not None:  # Tf
                    font_size = float(om.group(2))
                elif om.group(3) is not None:  # Td / TD
                    x += float(om.group(3))
                    y += float(om.group(4))
                elif om.group(5) is not None:  # Tm — absolute placement
                    x = float(om.group(9))
                    y = float(om.group(10))
                elif om.group(11) is not None:  # Tj or '
                    if om.group(12) == b"'":
                        y -= leading
                    text = _unescape_pdf_string(om.group(11))
                    if text:
                        # width estimate: Helvetica-ish 0.5em average advance
                        w = 0.5 * font_size * len(text)
                        runs.append(
                            {
                                "page": page_no,
                                "bbox": (x, y, x + w, y + font_size),
                                "text": text,
                                "origin": (x, y),
                                "font_size": font_size,
                            }
                        )
                        x += w
                elif om.group(13) is not None:  # TL
                    leading = float(om.group(13))
    return runs


def reading_order_text(runs: list[dict]) -> tuple[str, list[dict]]:
    """Reconstruct reading-order text from glyph runs (vectorized lexsort).

    Line grouping and ordering mirror the reference exactly
    (excel2training.py:287-311): lines keyed by (page, round(y)), lines
    sorted by page then y (top of page first — PDF y axis points up, so
    descending y), runs within a line by x; runs joined by ' ' within a
    line, lines by '\n', pages by '\n'.

    Returns (text, span_offsets) where each span is
    {start, end, page, bbox} — offsets into the returned text.
    """
    if not runs:
        return "", []

    pages = np.fromiter((r["page"] for r in runs), dtype=np.int64, count=len(runs))
    ys = np.fromiter((r["bbox"][1] for r in runs), dtype=np.float64, count=len(runs))
    xs = np.fromiter((r["bbox"][0] for r in runs), dtype=np.float64, count=len(runs))
    line_key = np.round(ys / LINE_Y_QUANTUM).astype(np.int64)

    # lexsort: last key is primary → (page asc, line desc(y), x asc)
    order = np.lexsort((xs, -line_key, pages))

    out_parts: list[str] = []
    spans: list[dict] = []
    off = 0
    prev_page = None
    prev_line = None
    for idx in order:
        r = runs[int(idx)]
        page, lk = int(pages[idx]), int(line_key[idx])
        if prev_page is None:
            sep = ""
        elif page != prev_page or lk != prev_line:
            sep = "\n"
        else:
            sep = " "
        off += len(sep)
        out_parts.append(sep)
        txt = " ".join(r["text"].split())
        out_parts.append(txt)
        spans.append(
            {
                "start": off,
                "end": off + len(txt),
                "page": page,
                "bbox": [float(v) for v in r["bbox"]],
            }
        )
        off += len(txt)
        prev_page, prev_line = page, lk
    return "".join(out_parts), spans


def extract_pdf(raw: bytes) -> tuple[str, list[dict]]:
    """Full PDF branch: parse runs → reading order. Raises on non-PDF input."""
    if not raw.startswith(PDF_MAGIC):
        raise ValueError("not a PDF payload")
    return reading_order_text(parse_glyph_runs(raw))
