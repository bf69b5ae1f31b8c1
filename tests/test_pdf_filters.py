"""PDF stream filters: unit vectors + round-trips + chain parsing.

Each decoder is checked against hand-computed spec vectors (not just its
own encoder twin — a mirrored bug would survive a round-trip-only suite).
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.kernel.pdf_filters import (
    apply_filters,
    ascii85_decode,
    ascii85_encode,
    ascii_hex_decode,
    decode_parms,
    filter_names,
    lzw_decode,
    lzw_encode,
    png_predict_up,
    png_unpredict,
    run_length_decode,
    run_length_encode,
    tiff_unpredict,
)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=1000))
def test_ascii85_roundtrip_property(data):
    assert ascii85_decode(ascii85_encode(data)) == data


def test_ascii85_encode_vectors():
    assert ascii85_encode(b"Man ") == b"9jqo^~>"
    assert ascii85_encode(b"\x00\x00\x00\x00") == b"z~>"
    assert ascii85_encode(b"Man") == b"9jqo~>"


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=1000))
def test_rle_roundtrip_property(data):
    assert run_length_decode(run_length_encode(data)) == data


def test_rle_encode_vectors():
    # aaaa → repeat code 253='257-4', then literal 'bc'
    assert run_length_encode(b"aaaabc") == bytes([253]) + b"a" + bytes([1]) + b"bc" + bytes([128])


def _pack_codes(codes: list[int]) -> bytes:
    """MSB-first variable-width bit packing that tracks the decoder's
    post-clear width schedule (early_change=1) — for hand vectors."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    table_len = 258
    for code in codes:
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        if code == 256:
            table_len, width = 258, 9
        elif code not in (256, 257) and table_len is not None:
            # decoder appends AFTER the second code onward
            pass
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_hand_vector():
    """ISO 32000-1 §7.4.4.2's worked example: '-----A---B' compresses to
    the code sequence 256 45 258 258 65 259 66 257 (clear, '-', KwKwK
    '--', '--', 'A', '---', 'B', EOD)."""
    codes = [256, 45, 258, 258, 65, 259, 66, 257]
    packed = _pack_codes(codes)
    assert lzw_decode(packed) == b"-----A---B"
    # the encoder twin produces exactly this sequence
    assert lzw_encode(b"-----A---B") == packed


def test_lzw_kwkwk_and_clear():
    # KwKwK stress: long runs force the self-referential case repeatedly
    data = b"a" * 500 + b"b" * 500 + b"ab" * 250
    assert lzw_decode(lzw_encode(data)) == data


def test_lzw_width_transitions():
    """Cross the 9→10→11-bit boundaries: >1024 distinct table entries."""
    data = bytes(range(256)) * 12  # no repeats at first → fast table growth
    assert lzw_decode(lzw_encode(data)) == data
    big = (b"the quick brown fox " * 400) + bytes(range(256)) * 8
    assert lzw_decode(lzw_encode(big)) == big


def test_lzw_table_full_clear():
    """>4096 table entries forces the encoder's mid-stream clear."""
    import random

    rnd = random.Random(7)
    data = bytes(rnd.randrange(256) for _ in range(40_000))
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2000))
def test_lzw_roundtrip_property(data):
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400))
def test_lzw_decode_total(data):
    """Arbitrary bytes never hang or crash with a non-ValueError."""
    try:
        lzw_decode(data)
    except ValueError:
        pass


def test_ascii_hex_vectors():
    assert ascii_hex_decode(b"48 65 6c 6C6f>") == b"Hello"
    assert ascii_hex_decode(b"486>") == b"H`"  # odd digit pads 0
    for bad in (b"48junk", b"4zzz>"):  # non-hex chars must raise
        with pytest.raises(ValueError):
            ascii_hex_decode(bad)


def test_ascii85_vectors():
    # canonical 'sure.' → '<+oue+DGm>' is for btoa; use a verified pair:
    # 'Man ' encodes to 9jqo^ (the classic Wikipedia leviathan example)
    assert ascii85_decode(b"9jqo^~>") == b"Man "
    assert ascii85_decode(b"<~9jqo^~>") == b"Man "
    assert ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    # partial final group: 'Man' (3 bytes) → 4-char group
    enc3 = ascii85_decode(b"9jqo~>")
    assert enc3 == b"Man"
    with pytest.raises(ValueError):
        ascii85_decode(b"9~>")  # 1-char final group illegal
    with pytest.raises(ValueError):
        ascii85_decode(b"vvvvv~>")  # > 2^32


def test_run_length_vectors():
    # 2 → copy 3 bytes; 254 → repeat next byte 3×; 128 → EOD
    assert run_length_decode(bytes([2]) + b"abc" + bytes([254]) + b"x" + bytes([128])) \
        == b"abcxxx"
    assert run_length_decode(bytes([128]) + b"ignored") == b""
    # truncated run degrades, never raises
    assert run_length_decode(bytes([5]) + b"ab") == b"ab"


def test_png_predictor_up_roundtrip_and_hand_vector():
    data = bytes(range(1, 26))  # 5 rows × 5 cols
    filt = png_predict_up(data, columns=5)
    assert len(filt) == 30  # +1 filter byte per row
    assert filt[0] == 2 and filt[1:6] == bytes([1, 2, 3, 4, 5])
    # second row stores deltas vs row 1: all 5s
    assert filt[6] == 2 and filt[7:12] == bytes([5] * 5)
    assert png_unpredict(filt, colors=1, bpc=8, columns=5) == data


def test_png_predictor_all_types():
    """Hand-build rows with Sub/Average/Paeth filter types."""
    # row of raw values 10 20 30: Sub stores 10 10 10
    rows = bytes([1, 10, 10, 10])
    assert png_unpredict(rows, 1, 8, 3) == bytes([10, 20, 30])
    # Average over prev=10,20,30: raw 12 24 36 stores 12-5=7, 24-(12+20)/2=8, 36-(24+30)/2=9
    rows2 = bytes([1, 10, 10, 10]) + bytes([3, 7, 8, 9])
    assert png_unpredict(rows2, 1, 8, 3) == bytes([10, 20, 30, 12, 24, 36])
    # Paeth with prev row known: predictor picks nearest of left/up/upleft
    rows3 = bytes([1, 10, 10, 10]) + bytes([4, 1, 1, 1])
    out = png_unpredict(rows3, 1, 8, 3)
    assert out[:3] == bytes([10, 20, 30])
    # first byte: a=0,b=10,c=0 → p=10 → pr=b=10 → 11; then a=11,b=20,c=10
    # → p=21 → closest is a? |21-11|=10,|21-20|=1,|21-10|=11 → pr=20 → 21;
    # then a=21,b=30,c=20 → p=31 → pr=30 → 31
    assert out[3:] == bytes([11, 21, 31])


def test_tiff_predictor():
    # horizontal differencing per row: 10,+5,+5 | 3,+1,+1
    data = bytes([10, 5, 5, 3, 1, 1])
    assert tiff_unpredict(data, colors=1, bpc=8, columns=3) == bytes(
        [10, 15, 20, 3, 4, 5]
    )


def test_filter_chain_parsing():
    assert filter_names(b"<< /Length 5 >>") == []
    assert filter_names(b"<< /Filter /FlateDecode >>") == [b"FlateDecode"]
    assert filter_names(b"<< /Filter [/ASCII85Decode /LZWDecode] >>") == [
        b"ASCII85Decode", b"LZWDecode",
    ]
    assert filter_names(b"<< /Filter [/AHx /Fl] >>") == [
        b"ASCIIHexDecode", b"FlateDecode",
    ]
    p = decode_parms(
        b"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 5 >> >>"
    )
    assert p == [{b"Predictor": 12, b"Columns": 5}]
    p2 = decode_parms(
        b"<< /Filter [/LZWDecode /FlateDecode] "
        b"/DecodeParms [null << /Predictor 2 /Colors 3 >>] >>"
    )
    assert p2 == [{}, {b"Predictor": 2, b"Colors": 3}]


def test_apply_filters_chain_and_unsupported():
    raw = b"chained filter payload " * 20
    z = zlib.compress(raw)
    hexed = z.hex().encode("ascii") + b">"
    got = apply_filters(hexed, [b"ASCIIHexDecode", b"FlateDecode"], [])
    assert got == raw
    # image filters: skip (None), not garbage
    assert apply_filters(b"\xff\xd8\xff", [b"DCTDecode"], []) is None
    # predictor applies after flate
    data = bytes(range(1, 26))
    filt = zlib.compress(png_predict_up(data, 5))
    got2 = apply_filters(
        filt, [b"FlateDecode"], [{b"Predictor": 12, b"Columns": 5}]
    )
    assert got2 == data


def test_apply_filters_malformed_raises_value_error():
    for bad, names in [
        (b"not-zlib", [b"FlateDecode"]),
        (b"q!q!q!", [b"ASCII85Decode"]),
        (b"zz>", [b"ASCIIHexDecode"]),
    ]:
        with pytest.raises(ValueError):
            apply_filters(bad, names, [])


def test_lzw_expansion_bomb_rejected_fast():
    """A crafted LZW stream that builds a maximal table and replays its
    longest entries must hit the output cap (ValueError → stream skipped)
    in bounded time — and a full table must never grow further (past the
    4096-entry spec cap the expansion turns quadratic)."""
    import time

    # grow the table with a KwKwK chain: after the first literal, code
    # len(table) repeatedly extends the previous entry by one byte
    codes = [65]  # literal 'A'
    next_code = 258
    while next_code < 4200:  # try to push PAST the spec cap
        codes.append(next_code)
        next_code += 1
    # then replay the longest entry many times
    codes += [4000] * 50000

    def pack(codes):
        out = bitbuf = nbits = 0
        buf = bytearray()
        width = 9
        table_len = 258
        for c in codes:
            bitbuf = (bitbuf << width) | c
            nbits += width
            while nbits >= 8:
                buf.append((bitbuf >> (nbits - 8)) & 0xFF)
                nbits -= 8
            table_len += 1
            if table_len + 1 >= (1 << width) and width < 12:
                width += 1
            if table_len >= 4096:
                table_len = 4096  # encoder stops growing; width stays 12
        if nbits:
            buf.append((bitbuf << (8 - nbits)) & 0xFF)
        return bytes(buf)

    from pdf_extractor_spark.kernel import pdf_filters

    payload = pack(codes)
    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        pdf_filters.lzw_decode(payload)
    assert time.perf_counter() - t0 < 5.0


def test_flate_bomb_rejected_fast():
    """A 1000:1 zlib bomb (zeros) must hit the expansion cap → ValueError
    (stream skipped), not gigabytes of memory inside one task; a
    legitimately compressed stream far under the cap still decodes."""
    import time

    from pdf_extractor_spark.kernel.pdf_filters import apply_filters

    # deflate caps expansion at ~1032:1, so the defense is the ABSOLUTE
    # 256 MiB output cap: 300 MiB of zeros compress to ~300 KiB but must
    # refuse to inflate past the cap
    bomb = zlib.compress(b"\x00" * (300 << 20), 6)
    assert len(bomb) < 2 << 20
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="expansion"):
        apply_filters(bomb, [b"FlateDecode"], [{}])
    assert time.perf_counter() - t0 < 5.0

    legit = zlib.compress(b"BT (hello) Tj ET " * 100, 6)
    assert apply_filters(legit, [b"FlateDecode"], [{}]) == b"BT (hello) Tj ET " * 100


def test_predictor_columns_bomb_rejected_fast():
    """/DecodeParms is attacker bytes: a huge /Columns on a tiny stream
    must fail fast (ValueError → stream skipped), never allocate
    row-width buffers; xref-stream parsing and apply_filters share the
    same guard."""
    import time

    from pdf_extractor_spark.kernel.pdf_filters import apply_filters, png_unpredict

    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        png_unpredict(b"\x02" * 64, 1, 8, 10**9)
    small = zlib.compress(b"\x00" * 64, 6)
    with pytest.raises(ValueError):
        apply_filters(
            small,
            [b"FlateDecode"],
            [{b"Predictor": 12, b"Columns": 999999999}],
        )
    assert time.perf_counter() - t0 < 2.0
