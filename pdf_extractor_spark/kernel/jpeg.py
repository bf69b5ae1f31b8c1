"""From-scratch baseline JPEG (ITU-T T.81) decoder.

Closes the last ok=false multimodal path hermetically (round-4 verdict #5):
the container has no Pillow, and the reference leans on installed codecs
(reference services/pdf_service.py:16 gets its raster work from PyMuPDF) —
here the decoder is in-repo, same discipline as the from-scratch PNG/AES
work. Scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
with arbitrary h/v sampling factors, restart markers, byte stuffing.
Progressive (SOF2) and the other rare SOFs raise NotImplementedError —
honesty beats a wrong decode; callers record ok=false rows.

Output is the LUMINANCE plane (h, w) uint8 — the feature kernels consume a
single gray plane (multimodal.py), and for YCbCr JPEGs the Y component IS
the luminance, so no chroma upsampling is ever needed for this pipeline
(chroma blocks are still entropy-decoded to keep the bit stream in sync).

Bomb defenses, validated BEFORE any dimension-proportional work (the PNG
decoder's fuzz-driven rule): declared dimensions capped, Huffman tables
structurally validated, every bit-reader overrun and coefficient-index
overflow is a ValueError (stream skipped, task survives).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (T.81 Figure 5): zigzag index -> linear (row*8+col)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_MAX_PIXELS = 1 << 26  # 64 MPix ≈ 8192×8192 — far above thumbnails, far below a wedged task


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis A: forward F = A f Aᵀ, inverse
    f = Aᵀ F A."""
    x = np.arange(8)
    u = x[:, None]
    a = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2 / 8)
    a[0] = np.sqrt(1 / 8)
    return a


_A = _dct_matrix()


class _Bits:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-unstuffing; overruns raise ValueError (never wedge)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # byte position
        self.bit = 0  # bits consumed of current byte

    def read_bit(self) -> int:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("JPEG entropy data overrun")
        byte = d[p]
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            p += 1
            # skip the stuffed 0x00 after a literal 0xFF data byte
            if byte == 0xFF:
                if p >= len(d) or d[p] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                p += 1
            self.pos = p
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huff(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman per T.81 Annex C: {(length, code): symbol}."""
    if len(counts) != 16 or sum(counts) != len(symbols) or len(symbols) > 256:
        raise ValueError("malformed DHT")
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if code >= (1 << length):  # over-full tree: structural bomb
                raise ValueError("over-full Huffman table")
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_baseline_jpeg(payload: bytes) -> tuple[np.ndarray, int, int]:
    """(luminance_plane[h, w] uint8, width, height) from a baseline JPEG.

    ValueError on malformed/bomb input, NotImplementedError on legal but
    unsupported variants (progressive, 12-bit, arithmetic coding).
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    n = len(payload)
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None  # (w, h, components)
    restart_interval = 0
    scan = None  # (components_in_scan, entropy_offset)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        (seglen,) = struct.unpack_from(">H", payload, i)
        if seglen < 2 or i + seglen > n:
            raise ValueError("truncated segment")
        seg = payload[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                elif pq == 1:
                    vals = np.frombuffer(seg, dtype=">u2", count=64, offset=p).astype(np.int32)
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                if (vals == 0).any():
                    raise ValueError("zero quantizer")
                qt[tq] = vals
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1 : p + 17]
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                huff[(tc, th)] = _build_huff(counts, symbols)
                p += 17 + total
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline/ext sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                ch, cv = hv >> 4, hv & 15
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError("bad sampling factors")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tt = struct.unpack_from(">BB", seg, 1 + 2 * c)
                sel.append((cs, tt >> 4, tt & 15))
            scan = (sel, i)
            break  # entropy-coded data follows
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    sel, data_off = scan
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in sel:
        c = by_id.get(cs)
        if c is None or (0, td) not in huff or (1, ta) not in huff or c["tq"] not in qt:
            raise ValueError("scan references undefined component/table")
        order.append((c, huff[(0, td)], huff[(1, ta)], qt[c["tq"]]))
    if len(order) != len(comps):
        raise NotImplementedError("multi-scan JPEG unsupported")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # luminance = first scan component; others are entropy-decoded to keep
    # the bit stream in sync but never assembled
    y_comp = order[0][0]
    ph = mcuy * y_comp["v"] * 8
    pw = mcux * y_comp["h"] * 8
    plane = np.zeros((ph, pw), np.float64)

    # entropy segment: runs to the next real marker (restart markers and
    # stuffed zero bytes are consumed by the bit reader / reset logic)
    bits = _Bits(payload[data_off:])
    dc_pred = {id(c): 0 for c, _, _, _ in order}
    dezig = np.empty(64, np.int64)
    dezig[ZIGZAG] = np.arange(64)

    def _decode_block(dch, ach, q, key):
        coef = np.zeros(64, np.float64)
        t = _huff_decode(bits, dch)
        if t > 11:
            raise ValueError("bad DC magnitude")
        dc_pred[key] += _extend(bits.receive(t), t)
        coef[0] = dc_pred[key] * q[0]
        k = 1
        while k < 64:
            rs = _huff_decode(bits, ach)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC index overflow")
            coef[ZIGZAG[k]] = _extend(bits.receive(s), s) * q[k]
            k += 1
        F = coef.reshape(8, 8)
        return _A.T @ F @ _A + 128.0

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and skip the RSTn marker; DC predictors reset
                if bits.bit:
                    last = bits.data[bits.pos]
                    bits.bit = 0
                    bits.pos += 1
                    # 0xFF padding bytes are stuffed like data bytes
                    if last == 0xFF and bits.pos < len(bits.data) and bits.data[bits.pos] == 0x00:
                        bits.pos += 1
                d = bits.data
                if bits.pos + 1 < len(d) and d[bits.pos] == 0xFF and 0xD0 <= d[bits.pos + 1] <= 0xD7:
                    bits.pos += 2
                else:
                    raise ValueError("missing restart marker")
                for key in dc_pred:
                    dc_pred[key] = 0
            for c, dch, ach, q in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(dch, ach, q, id(c))
                        if c is y_comp:
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    out = np.clip(plane[:h, :w] + 0.5, 0, 255).astype(np.uint8)
    return out, w, h
