"""PDF layout parse: positioned glyph runs → reading-order text.

A from-scratch parser for PDF content streams (uncompressed or FlateDecode,
as found in pre-inflated WARC payloads). It extracts positioned text runs
from `BT ... ET` text objects — `Tf` (font size), `Td`/`TD`/`Tm`
(positioning), `TL` (leading), `Tj`/`'` (show string), `TJ` (array show
with kerning adjustments), literal `(...)` and hex `<...>` strings — then
reconstructs reading order exactly like the reference does for PyMuPDF
span dicts: group runs into visual lines by (page, rounded y), sort lines
top-to-bottom, runs within a line left-to-right, join pages with '\n'
(reference: finetune_commands/excel2training.py:282-316 for the line
grouping/sorting; services/pdf_service.py:38 for the '\n' page join;
span dict shape at services/pdf_service.py:21-36).

Document structure: when the payload carries a real page tree
(`N 0 obj << /Type /Page /Contents ... >>`), pages come from walking
Catalog → /Pages → /Kids in order and each page's /Contents refs (one page
may concatenate several streams). Legacy payloads without an object
structure fall back to one-content-stream-per-page in byte order.

Font encodings: each page's /Resources /Font table is parsed into
code→unicode maps — simple-font `/Encoding /Differences` arrays resolve
glyph names through an Adobe-Glyph-List subset (plus uniXXXX names), and
`/ToUnicode` CMap streams (beginbfchar / beginbfrange, 1- or 2-byte codes,
UTF-16BE targets) overlay them, matching what the reference gets from
PyMuPDF's font handling (reference services/pdf_service.py:16). `Tf`
selects the active font; unmapped codes and fontless payloads fall back to
latin-1, exact for the WinAnsi range.

Numpy lexsort does the ordering so the whole page sorts in one vectorized
call — no per-span Python comparisons.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from pdf_extractor_spark.kernel import pdf_filters

PDF_MAGIC = b"%PDF-"

# y coordinates within this distance belong to the same visual line
# (the reference rounds y to integer: excel2training.py:289 `round(y0)`).
LINE_Y_QUANTUM = 1.0

# TJ kerning adjustments are in -1/1000 em units; a gap wider than this is
# a word break (space), anything smaller is intra-word kerning. 180/1000 em
# is the conventional word-gap threshold text extractors use.
TJ_SPACE_THRESHOLD = 180.0

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
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R\b")
_TEXTOBJ_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

# inline images (ISO 32000-1 §8.9.7): `BI <dict entries> ID<1 ws byte>
# <binary data> EI`. The binary payload is unframed — it can legally
# contain bytes that look like BT/Tj/ET text operators, which would leak
# garbage into the BT..ET scan (PyMuPDF tokenizes these away natively,
# reference services/pdf_service.py:16). Stripped before the text-object
# scan. Terminator heuristic: EI delimited by whitespace on both sides
# (or EOF) — the standard recovery used by pdfminer/mupdf-family parsers,
# since the image dict's /Length is optional and usually absent.
_BI_TOKEN_RE = re.compile(rb"(?:\A|(?<=[\s>\])]))BI(?=[\s/])")
_ID_TOKEN_RE = re.compile(rb"(?:\A|(?<=[\s>\])]))ID(?=\s)")
_EI_TOKEN_RE = re.compile(rb"(?<=\s)EI(?=\s|\Z)")

# indirect objects: page tree, content streams, stream-length objects
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]])*)\]", re.DOTALL)
_CONTENTS_RE = re.compile(
    rb"/Contents\s*(?:\[((?:[^\[\]])*)\]|(\d+)\s+\d+\s+R)", re.DOTALL
)

# operators inside a text object, in source order (named groups — the
# alternation is too wide for positional indices to stay readable).
# String literals use the unrolled-loop form [^...]*(?:\\.[^...]*)* rather
# than (?:[^...]|\\.)* — same language, no per-character alternation
# backtracking (measured ~2× on the TJ-heavy fixtures).
_PDF_NUM = rb"[\d.+-]+"
_LIT_STR = rb"\([^()\\]*(?:\\.[^()\\]*)*\)"
_HEX_STR = rb"<[0-9A-Fa-f\s]*>"
_OP_RE = re.compile(
    rb"/(?P<fname>\w+)\s+(?P<fsize>" + _PDF_NUM + rb")\s+Tf"
    rb"|(?P<tdx>" + _PDF_NUM + rb")\s+(?P<tdy>" + _PDF_NUM + rb")\s+T(?P<tdop>[dD])"
    rb"|(?P<tm>(?:" + _PDF_NUM + rb"\s+){5}" + _PDF_NUM + rb")\s+Tm"
    rb"|(?P<show>" + _LIT_STR + rb"|" + _HEX_STR + rb")\s*(?P<showop>Tj|')"
    # the TJ body's alternatives are first-byte disjoint ('(', '<',
    # [\d.+-], whitespace), so there is exactly ONE way to tile a given
    # body — possessive quantifiers (*+ / ++) therefore accept the same
    # language, but refuse to re-split it when the closing `]...TJ` is
    # missing. Without them, an UNTERMINATED array in a corrupt/adversarial
    # stream backtracks exponentially: a contiguous digit run of length n
    # can split across [\d.+-]+ iterations 2^(n-1) ways, and the fuzz
    # suite reproduced a single byte flip in a decrypted stream that
    # turned one page into a 500+-second regex hang (a task-wedging DoS
    # at crawl scale).
    rb"|\[(?P<tjarr>(?:" + _LIT_STR + rb"|" + _HEX_STR + rb"|[\d.+-]++|\s++)*+)\]\s*TJ"
    rb"|(?P<tl>" + _PDF_NUM + rb")\s+TL",
    re.DOTALL,
)

# elements of a TJ array: literal string, hex string, or kerning number
_TJ_ELEM_RE = re.compile(
    rb"\((?P<lit>[^()\\]*(?:\\.[^()\\]*)*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>|(?P<adj>"
    + _PDF_NUM + rb")"
)

# form XObjects (ISO 32000-1 §8.10): `/Name Do` splices another content
# stream into the page, positioned by the form's /Matrix composed with the
# CTM built by `cm` operators under the `q`/`Q` graphics-state stack.
# PyMuPDF extracts text inside forms transparently (reference
# services/pdf_service.py:16 — fitz renders the full display list);
# real-crawl generators (letterheads, stamps, pdftex overlays) routinely
# put body text there, so a /Contents-only walk silently drops it.
# The invocation scan skips string literals so show-string payload bytes
# can never fake a `Do`; /Subtype /Image XObjects are never spliced (their
# unframed binary bodies are exactly the fake-text hazard the inline-image
# stripper exists for).
_MATRIX_RE = re.compile(
    rb"/Matrix\s*\[\s*(" + _PDF_NUM + rb")\s+(" + _PDF_NUM + rb")\s+("
    + _PDF_NUM + rb")\s+(" + _PDF_NUM + rb")\s+(" + _PDF_NUM + rb")\s+("
    + _PDF_NUM + rb")"
)
_FORMSCAN_RE = re.compile(
    _LIT_STR + rb"|" + _HEX_STR
    + rb"|(?P<push>(?<![\w/])q(?!\w))"
    + rb"|(?P<pop>(?<![\w/])Q(?!\w))"
    + rb"|(?P<cm>(?:" + _PDF_NUM + rb"\s+){5}" + _PDF_NUM + rb")\s+cm(?!\w)"
    + rb"|/(?P<do>\w+)\s+Do(?!\w)",
    re.DOTALL,
)
_SUBTYPE_FORM_RE = re.compile(rb"/Subtype\s*/Form\b")
_ID_MATRIX = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
# crafted payloads must degrade to fewer forms, never a blown stack or a
# quadratic splice: depth caps form-in-form recursion, the per-page cap
# bounds a single form Do'd thousands of times
MAX_FORM_DEPTH = 4
MAX_FORMS_PER_PAGE = 64

# page geometry (inheritable page-tree attributes, ISO 32000-1 §7.7.3.4):
# /Rotate turns the page for DISPLAY; reading order must be judged in
# display space (PyMuPDF normalizes through the page ctm the same way,
# reference services/pdf_service.py:16)
_ROTATE_RE = re.compile(rb"/Rotate\s+(-?\d+)")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*(" + _PDF_NUM + rb")\s+(" + _PDF_NUM + rb")\s+("
    + _PDF_NUM + rb")\s+(" + _PDF_NUM + rb")"
)

_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b", b"\\f": b"\f",
    b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}
_ESC_RE = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")
_HEX_WS = b" \t\r\n\f\x0b"


def _esc_sub(m: "re.Match[bytes]") -> bytes:
    g = m.group(1)
    if g.isdigit():
        return bytes([int(g, 8) & 0xFF])
    return _ESCAPES[b"\\" + g]


# --- font encodings (/Differences + /ToUnicode CMaps) ----------------------

# Adobe Glyph List subset: the names simple-font /Differences arrays use in
# practice. Letters and digits resolve programmatically; this table carries
# punctuation and the Latin-1/Latin-Extended accents crawl PDFs hit.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "aacute": "á", "agrave": "à", "acircumflex": "â",
    "adieresis": "ä", "aring": "å", "atilde": "ã",
    "ae": "æ", "ccedilla": "ç",
    "eacute": "é", "egrave": "è", "ecircumflex": "ê",
    "edieresis": "ë",
    "iacute": "í", "igrave": "ì", "icircumflex": "î",
    "idieresis": "ï",
    "ntilde": "ñ",
    "oacute": "ó", "ograve": "ò", "ocircumflex": "ô",
    "odieresis": "ö", "oslash": "ø", "otilde": "õ",
    "oe": "œ",
    "uacute": "ú", "ugrave": "ù", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý", "ydieresis": "ÿ",
    "germandbls": "ß", "thorn": "þ", "eth": "ð",
    "Aacute": "Á", "Agrave": "À", "Adieresis": "Ä",
    "Aring": "Å", "AE": "Æ", "Ccedilla": "Ç",
    "Eacute": "É", "Egrave": "È", "Ntilde": "Ñ",
    "Oacute": "Ó", "Odieresis": "Ö", "Oslash": "Ø",
    "OE": "Œ", "Uacute": "Ú", "Udieresis": "Ü",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
    "Euro": "€", "degree": "°", "guillemotleft": "«",
    "guillemotright": "»", "exclamdown": "¡",
    "questiondown": "¿", "cent": "¢", "sterling": "£",
    "yen": "¥", "section": "§", "copyright": "©",
    "registered": "®", "trademark": "™", "plusminus": "±",
    "micro": "µ", "paragraph": "¶", "middot": "·",
    "fraction": "⁄", "florin": "ƒ",
}


def _safe_chr(cp: int) -> str | None:
    """chr() that refuses lone surrogates and out-of-range code points.

    A crafted /Differences '/uniD800' or a bfrange incrementing into
    D800-DFFF would otherwise put an unpaired surrogate into
    extracted_text — a string Python accepts but Arrow's UTF-8 encoder
    does NOT, so the mapInPandas task (not just the document) would die,
    violating the failures-are-data contract (round-3 review finding)."""
    if 0xD800 <= cp <= 0xDFFF or cp < 0 or cp > 0x10FFFF:
        return None
    return chr(cp)


def _glyph_to_char(name: str) -> str | None:
    """AGL-subset glyph name → unicode char (None when unknown)."""
    if len(name) == 1:  # letters name themselves in the AGL
        return name
    if name in _AGL:
        return _AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return _safe_chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return _safe_chr(int(name[1:], 16))
        except ValueError:
            return None
    return None


_DIFF_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.DOTALL)
_DIFF_TOK_RE = re.compile(rb"(\d+)|/([^\s/\[\]<>()]+)")
_CODESPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.DOTALL)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_BF_PAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BF_RANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\])"
)
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R\b")
_FONT_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R\b")
_IDENTITY_H_RE = re.compile(rb"/Encoding\s*/Identity-H\b")
# simple-font base encodings: the name form (/Encoding /MacRomanEncoding)
# and the /BaseEncoding entry inside an encoding dict
_ENC_NAME_RE = re.compile(rb"/Encoding\s*/(WinAnsiEncoding|MacRomanEncoding)\b")
_BASE_ENC_RE = re.compile(rb"/BaseEncoding\s*/(WinAnsiEncoding|MacRomanEncoding)\b")
# predefined CID CMaps whose 2-byte codes ARE the character's UCS-2/UTF-16BE
# value (ISO 32000-1 §9.7.5.2 Table 118: the Uni*-UCS2/UTF16 families map
# code == Unicode; the CID step only matters for glyph selection, not text)
_PREDEF_UNI_RE = re.compile(
    rb"/Encoding\s*/Uni(?:GB|CNS|JIS|JIS2004|JISX0213|KS)-(?:UCS2|UTF16)-[HV]\b"
)


def _base_encoding_table(codec: str) -> "dict[int, str]":
    """codes 0x80-0xFF where `codec` differs from latin-1, as a
    str.translate-ready {int: char} map (0x00-0x7F is ASCII in every PDF
    base encoding; latin-1 already maps byte b → chr(b), so only the
    differences need entries). Bytes the codec leaves undefined (cp1252
    0x81/0x8D/0x8F/0x90/0x9D) keep the latin-1 fallback."""
    t: dict[int, str] = {}
    for c in range(0x80, 0x100):
        try:
            ch = bytes([c]).decode(codec)
        except UnicodeDecodeError:
            continue
        if ch != chr(c):
            t[c] = ch
    return t


# WinAnsi == cp1252 (ISO 32000-1 Annex D.3 maps to the Windows 1252 code
# page); MacRoman == the classic Mac OS Roman code page (Annex D.2) —
# stdlib codecs, not hand tables, so the mapping is the authoritative one.
_BASE_ENCODINGS: "dict[bytes, dict[int, str]]" = {
    b"WinAnsiEncoding": _base_encoding_table("cp1252"),
    b"MacRomanEncoding": _base_encoding_table("mac_roman"),
}


def _utf16be(hx: bytes) -> str | None:
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be")
    except (ValueError, UnicodeDecodeError):
        return None


def _parse_tounicode(
    stream: bytes,
) -> "tuple[dict[int, str], int, tuple | None]":
    """ToUnicode CMap stream → (code→str map, bytes per code, codespaces).

    `codespaces` is a tuple of (width_bytes, lo, hi) from
    begincodespacerange, or None when the CMap declares none. A CMap may
    legally mix 1- and 2-byte codes via multiple codespace ranges
    (ISO 32000-1 §9.10.3 / Adobe CMap spec); the decoder then picks the
    code width per position instead of one global width (round-3 ADVICE).
    """
    cmap: dict[int, str] = {}
    nbytes = 1
    spaces: list[tuple[int, int, int]] = []
    for sec in _CODESPACE_RE.finditer(stream):
        for lo, hi in _BF_PAIR_RE.findall(sec.group(1)):
            w = len(lo) // 2
            if 1 <= w <= 2 and len(lo) == len(hi):
                spaces.append((w, int(lo, 16), int(hi, 16)))
    for sec in _BFCHAR_RE.finditer(stream):
        for sm, dm in _BF_PAIR_RE.findall(sec.group(1)):
            nbytes = max(nbytes, len(sm) // 2)
            dst = _utf16be(dm)
            if dst is not None:
                cmap[int(sm, 16)] = dst
    for sec in _BFRANGE_RE.finditer(stream):
        for lo, hi, dst1, dstarr in _BF_RANGE_RE.findall(sec.group(1)):
            nbytes = max(nbytes, len(lo) // 2)
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if hi_i - lo_i > 0xFFFF:  # malformed range: bound the loop
                continue
            if dstarr:
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dstarr)
                for off, d in enumerate(dsts[: hi_i - lo_i + 1]):
                    s = _utf16be(d)
                    if s is not None:
                        cmap[lo_i + off] = s
            else:
                base = _utf16be(dst1)
                if base is None or not base:
                    continue
                # incrementing range: last code unit increments (PDF 32000
                # §9.10.3 restricts the increment to the final byte). A
                # range crafted to step into the surrogate block or past
                # U+10FFFF skips those codes (see _safe_chr).
                head_s, last = base[:-1], ord(base[-1])
                for off in range(hi_i - lo_i + 1):
                    ch = _safe_chr(last + off)
                    if ch is not None:
                        cmap[lo_i + off] = head_s + ch
    if spaces:
        nbytes = max(nbytes, max(w for w, _, _ in spaces))
    return cmap, nbytes, tuple(spaces) or None


def _balanced_dict(data: bytes, start: int) -> bytes | None:
    """Inner bytes of the balanced '<< ... >>' opening at `start`."""
    if data[start : start + 2] != b"<<":
        return None
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            if depth == 0:
                return data[start + 2 : i]
            i += 2
        else:
            i += 1
    return None


def _dict_value(head: bytes, key: bytes, bodies: "dict[int, bytes]") -> bytes | None:
    """Value of /key in `head`: an inline balanced dict, or an indirect
    reference resolved through the object table (the dict body of the
    referenced object). None when absent/unresolvable."""
    m = re.search(rb"/" + key + rb"\s*(<<|(\d+)\s+\d+\s+R\b)", head)
    if m is None:
        return None
    if m.group(1).startswith(b"<<"):
        return _balanced_dict(head, m.start(1))
    body = bodies.get(int(m.group(2)))
    if body is None:
        return None
    dm = re.search(rb"<<", body)
    return _balanced_dict(body, dm.start()) if dm else body


def _parse_font(
    body: bytes,
    raw: bytes,
    objects: "dict[int, tuple[int, bytes]]",
    bodies: "dict[int, bytes]",
    crypt=None,
) -> "tuple[dict[int, str], int, tuple | None] | None":
    """One font object → (code→unicode map, bytes per code, codespaces),
    or None for a standard-encoded font (callers then decode
    latin-1/WinAnsi-style). Layering per ISO 32000-1 §9.6.6: the base
    encoding (/Encoding name or /BaseEncoding in the encoding dict —
    WinAnsi/MacRoman as explicit tables, round-4 verdict #4) seeds the
    map, /Differences overrides it, and /ToUnicode overlays everything
    (authoritative, as in PyMuPDF-family extractors)."""
    cmap: dict[int, str] = {}
    nbytes = 1
    spaces: tuple | None = None
    enc = _dict_value(body, b"Encoding", bodies)
    if enc is not None:
        bm = _BASE_ENC_RE.search(enc)
        if bm:
            cmap.update(_BASE_ENCODINGS[bm.group(1)])
        dm = _DIFF_RE.search(enc)
        if dm:
            code = 0
            for num, name in _DIFF_TOK_RE.findall(dm.group(1)):
                if num:
                    code = int(num)
                else:
                    ch = _glyph_to_char(name.decode("latin-1"))
                    if ch is not None:
                        cmap[code] = ch
                    code += 1
    head = body.split(b"stream", 1)[0]
    if enc is None:
        # /Encoding as a bare NAME (no dict): WinAnsi/MacRoman base table
        nm = _ENC_NAME_RE.search(head)
        if nm:
            cmap.update(_BASE_ENCODINGS[nm.group(1)])
    tum = _TOUNICODE_RE.search(head)
    if tum:
        ref = int(tum.group(1))
        if ref in objects:
            o_off, o_body = objects[ref]
            stream = _object_stream_bytes(raw, o_body, o_off, bodies, crypt, ref)
            if stream:
                tmap, tn, spaces = _parse_tounicode(stream)
                cmap.update(tmap)
                nbytes = max(nbytes, tn)
    if not cmap and _PREDEF_UNI_RE.search(head):
        # Composite /Type0 font on a predefined Uni*-UCS2/UTF16 CMap
        # WITHOUT a ToUnicode stream (round-4 verdict #4): the 2-byte codes
        # ARE UTF-16BE code units by the CMap's definition, so text decodes
        # directly — cmap=None is the _decode_codes sentinel for that.
        # (UCS-2 codes are the BMP subset of UTF-16BE, so one decoder
        # serves both families; invalid sequences degrade to U+FFFD and
        # the font_unmapped metric as usual.)
        return (None, 2, None)
    if not cmap and _IDENTITY_H_RE.search(head):
        # Composite /Type0 font on Identity-H WITHOUT a ToUnicode stream:
        # codes are 2-byte CIDs with no unicode source. Decoding them as
        # latin-1 would emit silent mojibake; instead mark the font 2-byte
        # with an empty map so every code surfaces as U+FFFD and is counted
        # in the kernel's font_unmapped lineage metric (round-3 verdict #4).
        return ({}, 2, None)
    return (cmap, nbytes, spaces) if cmap else None


def _page_font_table(
    page_head: bytes,
    raw: bytes,
    objects: "dict[int, tuple[int, bytes]]",
    bodies: "dict[int, bytes]",
    font_memo: "dict[int, tuple | None]",
    crypt=None,
) -> "dict[str, tuple] | None":
    """/Resources /Font of one page → {font_name: (cmap, nbytes)}; fonts
    without a custom encoding are omitted (latin-1 fallback). None when the
    page declares no custom-encoded fonts at all (the fast common path)."""
    res = _dict_value(page_head, b"Resources", bodies)
    if res is None:
        return None
    fdict = _dict_value(res, b"Font", bodies)
    if fdict is None:
        return None
    fonts: dict[str, tuple] = {}
    for fm in _FONT_REF_RE.finditer(fdict):
        ref = int(fm.group(2))
        if ref not in font_memo:
            body = bodies.get(ref)
            font_memo[ref] = (
                _parse_font(body, raw, objects, bodies, crypt)
                if body is not None
                else None
            )
        font = font_memo[ref]
        if font is not None:
            fonts[fm.group(1).decode("latin-1")] = font
    return fonts or None


def _decode_codes(bs: bytes, font: "tuple | None") -> str:
    """Show-string bytes → text through the active font's code map;
    unmapped codes and fontless text decode latin-1 (exact for WinAnsi).
    Unmapped codes in a 2-byte/CID font become U+FFFD (counted upstream as
    the font_unmapped lineage metric)."""
    if font is None:
        return bs.decode("latin-1")
    cmap, nbytes, spaces = font
    if cmap is None:
        # predefined Uni*-UCS2/UTF16 CMap: codes are UTF-16BE code units;
        # unpaired surrogates / ragged tails degrade to U+FFFD (counted
        # upstream as font_unmapped)
        return bs.decode("utf-16-be", errors="replace")
    if spaces is not None and len({w for w, _, _ in spaces}) > 1:
        # mixed-width codespaces (ISO 32000-1 §9.10.3): a byte inside a
        # declared 1-byte range is a complete code; anything else starts a
        # 2-byte code. Supports the 1+2-byte mixes real CMaps use
        # (round-3 ADVICE); wider codes are out of scope by construction
        # (_parse_tounicode keeps only 1- and 2-byte ranges).
        one_byte = [(lo, hi) for w, lo, hi in spaces if w == 1]
        out = []
        i = 0
        n = len(bs)
        while i < n:
            b0 = bs[i]
            if i + 1 >= n or any(lo <= b0 <= hi for lo, hi in one_byte):
                out.append(cmap.get(b0, chr(b0)))
                i += 1
            else:
                out.append(cmap.get((b0 << 8) | bs[i + 1], "�"))
                i += 2
        return "".join(out)
    if nbytes == 1:
        # latin-1 maps byte b → chr(b), so the code map doubles as a
        # str.translate table (int keys) — C-speed, no per-char Python loop
        return bs.decode("latin-1").translate(cmap)
    out = []
    for i in range(0, len(bs) - 1, 2):
        code = (bs[i] << 8) | bs[i + 1]
        out.append(cmap.get(code, "�"))
    if len(bs) % 2:  # ragged trailing byte: decode as 1-byte code
        out.append(cmap.get(bs[-1], chr(bs[-1])))
    return "".join(out)


def _safe_float(b: bytes, default: float = 0.0) -> float:
    """float() over a [\\d.+-]+ token that may be malformed ('+-', '5.5.3',
    '.'): a bad NUMBER must cost one operand, never the whole document —
    the op-level analog of the failures-are-data policy."""
    try:
        return float(b)
    except ValueError:
        return default


def _unescape_pdf_string(s: bytes, font: "tuple | None" = None) -> str:
    if b"\\" not in s:  # fast path: the vast majority of strings
        return _decode_codes(s, font)
    return _decode_codes(_ESC_RE.sub(_esc_sub, s), font)


def _decode_hex_body(hx: bytes, font: "tuple | None" = None) -> str:
    hx = hx.translate(None, _HEX_WS)  # C-speed whitespace strip
    if len(hx) % 2:
        hx += b"0"  # PDF spec: odd-length hex strings pad a trailing 0
    return _decode_codes(bytes.fromhex(hx.decode("ascii")), font)


def _decode_string_token(tok: bytes, font: "tuple | None" = None) -> str:
    """One string token — '(lit)' or '<hex>' — to text."""
    if tok.startswith(b"("):
        return _unescape_pdf_string(tok[1:-1], font)
    return _decode_hex_body(tok[1:-1], font)


def _nearest_dict(sdict: bytes) -> bytes:
    """Innermost balanced dict ending at the tail of the captured region.

    _STREAM_RE's optional dict group is leftmost-anchored, so when multiple
    dicts precede a stream the capture can span unrelated earlier dicts —
    an earlier object's /Length or /Filter would then win over the
    stream's own (round-1 ADVICE finding). The stream's dict is the one
    whose closing '>>' sits immediately before `stream`, i.e. the last
    balanced '<< ... >>' of the region; scan backwards with depth counting
    (nested dicts like /DecodeParms << ... >> stay inside).
    """
    s = sdict + b">>"
    depth = 0
    i = len(s)
    while i >= 2:
        pair = s[i - 2 : i]
        if pair == b">>":
            depth += 1
            i -= 2
        elif pair == b"<<":
            depth -= 1
            if depth == 0:
                return s[i : len(s) - 2]
            i -= 2
        else:
            i -= 1
    return sdict


def _resolve_length(sdict: bytes, objects: "dict[int, bytes] | None") -> int | None:
    """Declared stream length: direct int, or indirect via the object table."""
    matches = _LENGTH_RE.findall(sdict)
    if matches:
        return int(matches[-1])  # last match = the stream's own dict wins
    if objects is not None:
        ref = _LENGTH_REF_RE.search(sdict)
        if ref:
            body = objects.get(int(ref.group(1)))
            if body is not None:
                num = re.search(rb"\d+", body)
                if num:
                    return int(num.group(0))
    return None


def _decode_stream_at(
    raw: bytes,
    sdict: bytes | None,
    body_start: int,
    body_fallback: bytes,
    objects: "dict[int, bytes] | None" = None,
    decrypt=None,
) -> bytes | None:
    """Stream body → decoded bytes (None when a corrupt or non-text stream
    must be skipped — the document degrades to fewer pages, never a task
    failure). The full /Filter chain is honored: Flate (with PNG/TIFF
    predictors), LZW, ASCIIHex, ASCII85, RunLength; image/crypt filters
    (DCTDecode etc.) return None — no text lives in them. `decrypt` (a
    bytes→bytes callable carrying this object's RC4 key) applies BEFORE
    the filter chain — encryption is the outermost layer (ISO 32000-1
    §7.6.2); RC4 is length-preserving, so /Length still slices ciphertext
    exactly."""
    if not sdict:
        return decrypt(body_fallback) if decrypt else body_fallback
    nd = _nearest_dict(sdict)
    names = pdf_filters.filter_names(nd)
    if names is None:  # unparseable /Filter
        return None
    # Filtered (and encrypted) bodies are binary and can contain bytes the
    # `\r?\nendstream` terminator regex would swallow, so when the dict
    # declares /Length, slice the body exactly.
    stream = body_fallback
    length = _resolve_length(nd, objects)
    if length is not None and (names or decrypt):
        stream = raw[body_start : body_start + length]
    if decrypt:
        stream = decrypt(stream)
    if not names:  # unfiltered stream
        return stream
    try:
        return pdf_filters.apply_filters(stream, names, pdf_filters.decode_parms(nd))
    except ValueError:
        return None


def _parse_objects(raw: bytes) -> "dict[int, tuple[int, bytes]]":
    """obj_num → (body_offset_in_raw, body_bytes) for every indirect object."""
    return {
        int(m.group(1)): (m.start(2), m.group(2)) for m in _OBJ_RE.finditer(raw)
    }


# --- PDF 1.5 cross-reference streams + object streams (ObjStm) --------------
#
# Post-2005 PDFs store their dict-only objects (Catalog, Pages, Page, Font
# dicts) FlateDecode-compressed inside /Type /ObjStm containers, indexed by
# a cross-reference STREAM (always written with a PNG predictor in
# practice) instead of a classic xref table. The reference handles these
# invisibly through PyMuPDF (reference services/pdf_service.py:16); here
# the xref stream is parsed for object locations and every ObjStm container
# is inflated so its embedded objects join the ordinary object table — the
# page-tree walk downstream is unchanged.

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_INT_KEY_RE = {
    key: re.compile(rb"/" + key + rb"\s+(\d+)")
    for key in (b"N", b"First", b"Size", b"Prev")
}
_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
# possessive: \s* can match empty, so the non-possessive form lets a digit
# run split across iterations 2^(n-1) ways — an unclosed /Index [ 1111…
# in a corrupt xref dict would backtrack exponentially (same DoS shape the
# fuzz suite caught in the TJ-array scan); maximal-munch tiling is unique,
# so the accepted language is unchanged
_INDEX_RE = re.compile(rb"/Index\s*\[((?:\s*+\d++)++)\s*\]")
_OBJSTM_PAIR_RE = re.compile(rb"(\d+)\s+(\d+)")

_MAX_XREF_CHAIN = 64  # /Prev chains are incremental saves; bound the walk


def _int_key(head: bytes, key: bytes) -> int | None:
    m = _INT_KEY_RE[key].search(head)
    return int(m.group(1)) if m else None


def _parse_xref_streams(
    raw: bytes, objects: "dict[int, tuple[int, bytes]]"
) -> "set[int]":
    """Walk the startxref → /Prev chain of cross-reference streams.

    Returns the object numbers of every ObjStm container referenced by a
    type-2 entry, and — for type-1 entries whose offset points at an object
    the regex scan missed (its `N 0 obj` head hidden inside another
    object's binary stream bytes) — adds that object to the table in place.
    A malformed or absent xref stream degrades to the scan-only view.
    """
    sxs = _STARTXREF_RE.findall(raw[-2048:]) or _STARTXREF_RE.findall(raw)
    if not sxs:
        return set()
    containers: "set[int]" = set()
    seen_off: "set[int]" = set()
    bodies = {n: b for n, (_, b) in objects.items()}
    off = int(sxs[-1])
    for _hop in range(_MAX_XREF_CHAIN):
        if off in seen_off or not 0 <= off < len(raw):
            break
        seen_off.add(off)
        om = _OBJ_RE.match(raw, off)
        if om is None:
            break
        body = om.group(2)
        head = body.split(b"stream", 1)[0]
        if b"/XRef" not in head:
            break
        data = _object_stream_bytes(raw, body, om.start(2), bodies)
        wm = _W_RE.search(head)
        size = _int_key(head, b"Size")
        if data is None or wm is None or size is None:
            break
        w1, w2, w3 = (int(wm.group(i)) for i in (1, 2, 3))
        entry_len = w1 + w2 + w3
        if entry_len <= 0 or entry_len > 32:
            break
        im = _INDEX_RE.search(head)
        if im:
            nums = [int(t) for t in im.group(1).split()]
            index = list(zip(nums[0::2], nums[1::2]))
        else:
            index = [(0, size)]
        pos = 0
        for first_obj, count in index:
            for k in range(count):
                ent = data[pos : pos + entry_len]
                pos += entry_len
                if len(ent) < entry_len:
                    break
                etype = int.from_bytes(ent[:w1], "big") if w1 else 1
                f2 = int.from_bytes(ent[w1 : w1 + w2], "big")
                obj_num = first_obj + k
                if etype == 2:
                    containers.add(f2)
                elif etype == 1 and obj_num not in objects:
                    rm = _OBJ_RE.match(raw, f2)
                    if rm is not None and int(rm.group(1)) == obj_num:
                        objects[obj_num] = (rm.start(2), rm.group(2))
        prev = _int_key(head, b"Prev")
        if prev is None:
            break
        off = prev
    return containers


def _expand_object_streams(
    raw: bytes, objects: "dict[int, tuple[int, bytes]]", crypt=None
) -> None:
    """Inflate every /Type /ObjStm container and add its embedded objects.

    The container stream is `First` header bytes of (obj_num, offset) pairs
    followed by the N object bodies back-to-back (ISO 32000-1 §7.5.7);
    embedded objects are dict-only (streams may not nest), so a body slice
    is the complete object. Existing table entries win — an object present
    both top-level and embedded keeps the top-level (later-update) form.
    Offset -1 marks embedded entries; they have no raw-file position, which
    is fine because only stream /Length resolution uses the offset and
    embedded objects carry no streams.
    """
    bodies = {n: b for n, (_, b) in objects.items()}
    for num, (off, body) in list(objects.items()):
        head = body.split(b"stream", 1)[0]
        if not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        n_objs = _int_key(head, b"N")
        first = _int_key(head, b"First")
        if n_objs is None or first is None:
            continue
        data = _object_stream_bytes(raw, body, off, bodies, crypt, num)
        if not data or first > len(data):
            continue
        pairs = _OBJSTM_PAIR_RE.findall(data[:first])[:n_objs]
        offs = [(int(a), int(b)) for a, b in pairs]
        for i, (onum, ooff) in enumerate(offs):
            end = offs[i + 1][1] if i + 1 < len(offs) else len(data) - first
            if onum not in objects and 0 <= ooff <= end:
                objects[onum] = (-1, data[first + ooff : first + end])


def _object_stream_bytes(
    raw: bytes,
    obj_body: bytes,
    obj_off: int,
    objects_bodies: "dict[int, bytes]",
    crypt=None,
    objnum: int = 0,
) -> bytes | None:
    """Decoded stream content of one object (None if it has no stream).
    `crypt` is a verified StandardCrypt; the object's own number keys the
    RC4 decryption (§7.6.2 Algorithm 1)."""
    sm = _STREAM_RE.search(obj_body)
    if sm is None:
        return None
    decrypt = (lambda b: crypt.decrypt(objnum, b)) if crypt else None
    return _decode_stream_at(
        raw, sm.group(1), obj_off + sm.start(2), sm.group(2), objects_bodies,
        decrypt
    )


def _page_geometry(
    head: bytes, parent_heads: "list[bytes]"
) -> tuple[int, float, float]:
    """(rotation, mediabox width, mediabox height) for one page.

    Both attributes are inheritable: the page's own dict wins, else the
    first /Pages node that declares them (single-level inheritance — the
    overwhelmingly common tree shape; deeper chains fall back to the
    default Letter geometry). Rotation normalizes to {0, 90, 180, 270};
    anything malformed degrades to the unrotated default, never a throw.
    """
    rot, w, h = 0, 612.0, 792.0
    for src in (head, *parent_heads):
        m = _ROTATE_RE.search(src)
        if m:
            try:
                r = int(m.group(1)) % 360
            except ValueError:
                r = 0
            if r in (90, 180, 270):
                rot = r
            break
    for src in (head, *parent_heads):
        m = _MEDIABOX_RE.search(src)
        if m:
            x0, y0 = _safe_float(m.group(1)), _safe_float(m.group(2))
            x1, y1 = _safe_float(m.group(3)), _safe_float(m.group(4))
            if x1 > x0 and y1 > y0:
                w, h = x1 - x0, y1 - y0
            break
    return rot, w, h


def _rotate_runs_to_display(
    runs: "list[dict]", start: int, rot: int, w: float, h: float
) -> None:
    """Map run coordinates (text space) into DISPLAY space for a rotated
    page, in place, so reading-order reconstruction sorts what a viewer
    sees. /Rotate 90 turns the page clockwise: (x, y) → (y, w − x);
    180 → (w − x, h − y); 270 → (h − y, x). Bboxes transform as rectangles
    (corner map + min/max re-normalization); glyph advance direction is
    not re-estimated — a documented approximation, order is what matters.
    """
    if rot == 90:
        pt = lambda x, y: (y, w - x)  # noqa: E731
    elif rot == 180:
        pt = lambda x, y: (w - x, h - y)  # noqa: E731
    else:  # 270
        pt = lambda x, y: (h - y, x)  # noqa: E731
    for r in runs[start:]:
        x0, y0, x1, y1 = r["bbox"]
        (ax, ay), (bx, by) = pt(x0, y0), pt(x1, y1)
        r["bbox"] = (min(ax, bx), min(ay, by), max(ax, bx), max(ay, by))
        r["origin"] = pt(*r["origin"])


def _mat_compose(m1: tuple, m2: tuple) -> tuple:
    """Affine compose, row-vector convention: apply m1, THEN m2 — the PDF
    CTM rule (`cm` premultiplies, a form's /Matrix maps form space into the
    space the CTM then maps onward)."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _apply_matrix_to_runs(runs: "list[dict]", start: int, m: tuple) -> None:
    """Map runs[start:] from form space to page space through matrix `m`:
    bbox corners and origin transform; font size scales by the vertical
    unit vector's magnitude (what a renderer's glyph height does)."""
    if m == _ID_MATRIX:
        return
    a, b, c, d, e, f = m
    vscale = (c * c + d * d) ** 0.5
    pt = lambda x, y: (a * x + c * y + e, b * x + d * y + f)  # noqa: E731
    for r in runs[start:]:
        x0, y0, x1, y1 = r["bbox"]
        cs = (pt(x0, y0), pt(x1, y0), pt(x0, y1), pt(x1, y1))
        r["bbox"] = (
            min(p[0] for p in cs),
            min(p[1] for p in cs),
            max(p[0] for p in cs),
            max(p[1] for p in cs),
        )
        r["origin"] = pt(*r["origin"])
        r["font_size"] *= vscale


def _collect_forms(
    content: bytes,
    owner_head: bytes,
    owner_fonts: "dict[str, tuple] | None",
    raw: bytes,
    objects: "dict[int, tuple[int, bytes]]",
    bodies: "dict[int, bytes]",
    font_memo: "dict[int, tuple | None]",
    crypt,
    base: tuple,
    chain: frozenset,
    out: "list[tuple[bytes, dict | None, tuple]]",
) -> None:
    """Scan one decoded content stream for `/Name Do` form-XObject
    invocations and append (form_stream, font_table, matrix) per hit.

    The scan tracks the graphics-state stack (`q`/`Q`) and `cm` CTM
    composition so each form lands where a renderer would put it; string
    literals/hex strings are consumed by the regex alternation so payload
    bytes inside show strings can't fake operators. A form with its own
    /Resources /Font decodes through its own table, otherwise it inherits
    the invoking context's (§8.10.2 legacy inheritance). Recurses into
    form-in-form with a depth cap and a per-chain seen-set so reference
    cycles terminate."""
    if b"Do" not in content:
        return
    res = _dict_value(owner_head, b"Resources", bodies)
    if res is None:
        return
    xdict = _dict_value(res, b"XObject", bodies)
    if xdict is None:
        return
    xmap = {
        m.group(1).decode("latin-1"): int(m.group(2))
        for m in _FONT_REF_RE.finditer(xdict)
    }
    if not xmap:
        return
    ctm = base
    stack: list[tuple] = []
    for m in _FORMSCAN_RE.finditer(_strip_inline_images(content)):
        kind = m.lastgroup
        if kind is None:  # string literal / hex string — skipped
            continue
        if kind == "push":
            if len(stack) < 256:  # crafted q-floods stay bounded
                stack.append(ctm)
        elif kind == "pop":
            if stack:
                ctm = stack.pop()
        elif kind == "cm":
            nums = m.group("cm").split()
            ctm = _mat_compose(tuple(_safe_float(n) for n in nums[:6]), ctm)
        else:  # Do
            if len(out) >= MAX_FORMS_PER_PAGE:
                return
            ref = xmap.get(m.group("do").decode("latin-1"))
            if ref is None or ref in chain or ref not in objects:
                continue
            o_off, o_body = objects[ref]
            head = o_body.split(b"stream", 1)[0]
            if not _SUBTYPE_FORM_RE.search(head):
                continue  # /Image etc. — no text lives there
            decoded = _object_stream_bytes(raw, o_body, o_off, bodies, crypt, ref)
            if not decoded:
                continue
            fm = _MATRIX_RE.search(head)
            fmat = (
                tuple(_safe_float(g) for g in fm.groups()) if fm else _ID_MATRIX
            )
            total = _mat_compose(fmat, ctm)
            fres = _dict_value(head, b"Resources", bodies)
            own_fonts = fres is not None and _dict_value(fres, b"Font", bodies)
            ffonts = (
                _page_font_table(head, raw, objects, bodies, font_memo, crypt)
                if own_fonts
                else owner_fonts
            )
            out.append((decoded, ffonts, total))
            if len(chain) < MAX_FORM_DEPTH:
                _collect_forms(
                    decoded, head, ffonts, raw, objects, bodies, font_memo,
                    crypt, total, chain | {ref}, out,
                )


def _page_content_streams(
    raw: bytes, crypt=None
) -> "list[tuple[bytes, dict | None, int, float, float, list]] | None":
    """Walk the page tree → (decoded content-stream blob, font table,
    rotation, mediabox width, mediabox height) per page.

    Page order: Catalog → /Pages → /Kids, depth-first (the PDF's declared
    reading order); objects not reachable from a /Kids array but marked
    /Type /Page are appended in document order (tolerates truncated
    catalogs in crawl data). The font table maps each page's /Resources
    /Font names to custom decode maps (None when the page only uses
    standard-encoded fonts). Returns None when the payload has no page
    objects — the caller then falls back to stream-per-page.
    """
    objects = _parse_objects(raw)
    if not objects:
        return None
    # PDF 1.5+: recover objects only reachable through the xref stream,
    # then inflate ObjStm containers so compressed dict objects (Catalog /
    # Pages / Page / Font) are visible to the walk below
    if b"/ObjStm" in raw or b"/XRef" in raw:
        _parse_xref_streams(raw, objects)  # xref streams are NEVER encrypted
        _expand_object_streams(raw, objects, crypt)
    bodies = {n: b for n, (_, b) in objects.items()}

    page_ids: list[int] = []
    pages_nodes = []
    for num, (_, body) in objects.items():
        head = body.split(b"stream", 1)[0]
        if re.search(rb"/Type\s*/Page\b(?!s)", head):
            page_ids.append(num)
        elif re.search(rb"/Type\s*/Pages\b", head):
            pages_nodes.append(num)
    if not page_ids:
        return None
    page_set = set(page_ids)

    # depth-first Kids order when a tree exists — explicit stack, not
    # recursion: a crafted payload with a 10^5-deep Kids chain must degrade
    # to data, not blow the Python stack inside an executor
    ordered: list[int] = []
    seen: set[int] = set()
    stack: list[int] = list(reversed(pages_nodes))
    while stack:
        num = stack.pop()
        if num in seen or num not in objects:
            continue
        seen.add(num)
        _, body = objects[num]
        head = body.split(b"stream", 1)[0]
        if num in page_set:
            ordered.append(num)
            continue
        km = _KIDS_RE.search(head)
        if km:
            kids = [int(rm.group(1)) for rm in _REF_RE.finditer(km.group(1))]
            stack.extend(reversed(kids))
    for num in page_ids:  # orphans (truncated tree) in document order
        if num not in seen:
            ordered.append(num)

    # inheritable-attribute sources for _page_geometry (/Rotate, /MediaBox)
    parent_heads = [
        objects[n][1].split(b"stream", 1)[0]
        for n in pages_nodes
        if n in objects
    ]

    pages: list[tuple[bytes, dict | None, int, float, float]] = []
    font_memo: dict[int, tuple | None] = {}  # font obj num → parsed map
    for num in ordered:
        off, body = objects[num]
        head = body.split(b"stream", 1)[0]
        cm = _CONTENTS_RE.search(head)
        if not cm:
            continue
        refs = (
            [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
            if cm.group(1) is not None
            else [int(cm.group(2))]
        )
        parts: list[bytes] = []
        for ref in refs:
            if ref not in objects:
                continue
            o_off, o_body = objects[ref]
            decoded = _object_stream_bytes(raw, o_body, o_off, bodies, crypt, ref)
            if decoded:
                parts.append(decoded)
        if parts:
            fonts = _page_font_table(head, raw, objects, bodies, font_memo, crypt)
            rot, mb_w, mb_h = _page_geometry(head, parent_heads)
            # multiple /Contents streams form ONE logical stream (PDF spec:
            # concatenated with whitespace between)
            blob = b"\n".join(parts)
            forms: list = []
            _collect_forms(
                blob, head, fonts, raw, objects, bodies, font_memo, crypt,
                _ID_MATRIX, frozenset(), forms,
            )
            pages.append((blob, fonts, rot, mb_w, mb_h, forms))
    return pages if pages else None


def _strip_inline_images(stream: bytes) -> bytes:
    """Remove `BI … ID <binary> EI` inline-image segments from a content
    stream so their unframed binary payloads cannot masquerade as BT..ET
    text objects. A `BI` without a following `ID` token is treated as plain
    content (not an image); an image with no whitespace-delimited `EI`
    terminator is malformed and swallows the remainder of the stream
    (failures-are-data: no garbage is ever emitted as text)."""
    if b"BI" not in stream or b"ID" not in stream:
        return stream
    out: list[bytes] = []
    pos = 0
    while pos < len(stream):
        bm = _BI_TOKEN_RE.search(stream, pos)
        if not bm:
            out.append(stream[pos:])
            break
        # the image dict between BI and ID is a handful of short entries
        # (/W /H /CS /BPC /F /DP); bounding the ID search keeps a stray
        # standalone BI token from pairing with a distant unrelated ID and
        # swallowing real content between them
        idm = _ID_TOKEN_RE.search(stream, bm.end(), bm.end() + 512)
        if not idm:
            out.append(stream[pos : bm.end()])
            pos = bm.end()
            continue
        em = _EI_TOKEN_RE.search(stream, idm.end() + 1)
        out.append(stream[pos : bm.start()])
        out.append(b" ")
        if not em:
            break
        pos = em.end()
    return b"".join(out)


def _parse_text_ops(
    stream: bytes,
    page_no: int,
    runs: "list[dict]",
    fonts: "dict[str, tuple] | None" = None,
) -> None:
    """Extract positioned runs from one page's content stream into `runs`.
    `fonts` maps font names (Tf operands) to custom code→unicode maps; the
    active font decodes every show string until the next Tf."""
    stream = _strip_inline_images(stream)
    for tm in _TEXTOBJ_RE.finditer(stream):
        body = tm.group(1)
        x = y = 0.0
        font_size = 12.0
        leading = 14.0
        cur_font: tuple | None = None

        def emit(text: str) -> None:
            nonlocal x
            if not text:
                return
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

        # dispatch on lastgroup (the final capturing group of the matched
        # alternative) — one attribute read instead of up to six group()
        # probes per operator; measured ~25% off the op loop
        for om in _OP_RE.finditer(body):
            kind = om.lastgroup
            if kind == "showop":  # Tj or ' (literal or hex string)
                if om.group("showop") == b"'":
                    y -= leading
                emit(_decode_string_token(om.group("show"), cur_font))
            elif kind == "tjarr":  # TJ array show
                # Elements concatenate into ONE run: kerning numbers adjust
                # the estimated advance; a gap wider than TJ_SPACE_THRESHOLD
                # (in -1/1000 em) is a word break and becomes a space —
                # the same heuristic PyMuPDF-family extractors apply when
                # splitting TJ arrays into words.
                parts: list[str] = []
                for em in _TJ_ELEM_RE.finditer(om.group("tjarr")):
                    ekind = em.lastgroup
                    if ekind == "adj":
                        if _safe_float(em.group("adj")) < -TJ_SPACE_THRESHOLD:
                            parts.append(" ")
                    elif ekind == "lit":
                        parts.append(_unescape_pdf_string(em.group("lit"), cur_font))
                    else:  # hex
                        parts.append(_decode_hex_body(em.group("hex"), cur_font))
                emit("".join(parts))
            elif kind == "tm":  # Tm — absolute placement
                nums = om.group("tm").split()
                x = _safe_float(nums[4])
                y = _safe_float(nums[5])
            elif kind == "tdop":  # Td / TD
                x += _safe_float(om.group("tdx"))
                ty = _safe_float(om.group("tdy"))
                y += ty
                if om.group("tdop") == b"D":
                    # TD sets leading to -ty (PDF 32000 §9.4.2)
                    leading = -ty
            elif kind == "fsize":  # Tf
                font_size = _safe_float(om.group("fsize"))
                cur_font = (
                    fonts.get(om.group("fname").decode("latin-1"))
                    if fonts
                    else None
                )
            elif kind == "tl":  # TL
                leading = _safe_float(om.group("tl"))


def parse_glyph_runs(raw: bytes, crypt=None) -> list[dict]:
    """Parse positioned text runs from a PDF byte payload.

    Returns the reference's span-record shape (services/pdf_service.py:30-36):
    [{page, bbox: (x0, y0, x1, y1), text, origin: (x, y), font_size}, ...]
    Pages come from the page tree when present (/Type /Page objects with
    /Contents refs, Kids order); payloads without an object structure fall
    back to one content stream == one page, in byte order.
    """
    runs: list[dict] = []
    pages = _page_content_streams(raw, crypt)
    if pages is not None:
        for page_no, (stream, fonts, rot, mb_w, mb_h, forms) in enumerate(pages):
            start = len(runs)
            _parse_text_ops(stream, page_no, runs, fonts)
            # form-XObject text joins the page's runs in page space; the
            # geometric reading-order sort then interleaves it exactly
            # where a renderer displays it
            for fstream, ffonts, fmat in forms:
                fstart = len(runs)
                _parse_text_ops(fstream, page_no, runs, ffonts)
                _apply_matrix_to_runs(runs, fstart, fmat)
            if rot:
                _rotate_runs_to_display(runs, start, rot, mb_w, mb_h)
        return runs
    for page_no, sm in enumerate(_STREAM_RE.finditer(raw)):
        stream = _decode_stream_at(raw, sm.group(1), sm.start(2), sm.group(2))
        if stream is None:
            continue
        _parse_text_ops(stream, page_no, runs)
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

    # sort anchors come from the run ORIGIN (the pen position): identical
    # to the bbox min-corner for unrotated runs (emit() anchors the bbox at
    # the origin), and the only stable anchor for ROTATED pages, where the
    # display-space bbox min-corner shifts by the run's own advance
    # estimate and would smear one visual line across several line keys
    pages = np.fromiter((r["page"] for r in runs), dtype=np.int64, count=len(runs))
    ys = np.fromiter((r["origin"][1] for r in runs), dtype=np.float64, count=len(runs))
    xs = np.fromiter((r["origin"][0] for r in runs), dtype=np.float64, count=len(runs))
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


def pdf_is_encrypted(raw: bytes) -> bool:
    """True when the document carries an /Encrypt key where the spec puts
    it (ISO 32000-1 §7.6.1): the file trailer dictionary — the LAST
    `trailer` keyword governs under incremental saves — or, in the PDF 1.5+
    cross-reference-stream form, the XRef stream's own dictionary.

    Stream and string content of such a file is RC4/AES ciphertext; parsing
    it would emit garbage runs as 'ok' rows. The reference gets decryption
    free from PyMuPDF (reference services/pdf_service.py:16 — fitz.open
    handles standard-security files); here the honest boundary is explicit
    detection → parse_status='encrypted', counted as a parse failure in
    partition lineage and classed 'encrypted_pdf' by dead-letter triage,
    never silent ciphertext-as-text.
    """
    t = raw.rfind(b"trailer")
    if t != -1 and b"/Encrypt" in raw[t : t + 2048]:
        return True
    sxs = _STARTXREF_RE.findall(raw[-2048:]) or _STARTXREF_RE.findall(raw)
    if sxs:
        om = _OBJ_RE.match(raw, int(sxs[-1]))
        if om is not None:
            head = om.group(2).split(b"stream", 1)[0]
            if b"/XRef" in head and b"/Encrypt" in head:
                return True
    return False


def extract_pdf(raw: bytes, crypt=None) -> tuple[str, list[dict]]:
    """Full PDF branch: parse runs → reading order. Raises on non-PDF input.
    `crypt` is a verified StandardCrypt for RC4 standard-security docs
    whose empty-user-password /U check passed (kernel/pdf_crypt.py)."""
    if not raw.startswith(PDF_MAGIC):
        raise ValueError("not a PDF payload")
    return reading_order_text(parse_glyph_runs(raw, crypt))
