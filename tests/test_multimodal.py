"""Multimodal column plumbing: schema, determinism, batch shape, stub boundary."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_spark import multimodal as mm

N = 120
SEED = 7


def test_synth_deterministic():
    a = mm.synth_media_row(SEED, 5)
    b = mm.synth_media_row(SEED, 5)
    assert a["media"] == b["media"] and a["kind"] == b["kind"]
    assert mm.synth_media_row(SEED, 6)["media"] != a["media"]


def test_decode_roundtrip_all_kinds():
    seen = set()
    for i in range(40):
        row = mm.synth_media_row(SEED, i)
        kind, arr, meta = mm.decode_payload(row["media"])
        assert kind == row["kind"]
        seen.add(kind)
        if kind == "image":
            assert arr.shape == (meta["height"], meta["width"])
        elif kind == "audio":
            assert arr.dtype == np.int16 and len(arr) == meta["n_samples"]
        else:
            assert arr.shape[0] == meta["n_frames"]
    assert seen == {"image", "audio", "video"}


def test_real_codec_branch_is_stubbed():
    """The stub boundary is now MP4/unknown magic only (JPEG decodes from
    scratch since round 5); a malformed JPEG raises ValueError instead —
    both classes become ok=false rows."""
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)
    with pytest.raises(ValueError):
        mm.decode_payload(b"\xff\xd8\xff\xe0" + b"JFIF-like payload")


def test_media_df_schema_and_rows(spark):
    df = mm.media_df(spark, N, seed=SEED, num_partitions=3)
    assert [f.name for f in df.schema.fields] == ["media_id", "kind", "media", "meta"]
    assert df.schema["meta"].dataType.fieldNames() == [
        "width", "height", "sample_rate", "n_frames", "duration_ms"
    ]
    rows = df.collect()
    assert len(rows) == N
    assert {r.media_id for r in rows} == set(range(N))
    # meta struct is populated per kind
    for r in rows:
        if r.kind == "image":
            assert r.meta.width > 0 and r.meta.sample_rate is None
        elif r.kind == "audio":
            assert r.meta.sample_rate > 0 and r.meta.width is None


def test_features_pipeline(spark):
    df = mm.media_df(spark, N, seed=SEED, num_partitions=3)
    feats = {r.media_id: r for r in mm.media_features(df).collect()}
    assert len(feats) == N
    for i in (0, 17, N - 1):
        row = mm.synth_media_row(SEED, i)
        kind, arr, _ = mm.decode_payload(row["media"])
        got = feats[i]
        assert got.ok and got.kind == kind
        assert got.n_values == arr.size
        assert got.mean_value == pytest.approx(float(arr.astype(np.float64).mean()))
        assert len(got.features) == 16
        assert sum(got.features) == pytest.approx(1.0, abs=1e-3)


def test_features_failure_is_data_not_exception(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "media": [b"\x89PNG\r\n\x1a\n...."]})
    )
    rows = bad.mapInPandas(mm.extract_features, schema=mm.FEATURES_SCHEMA).collect()
    assert len(rows) == 1 and rows[0].ok is False


def test_resize_images(spark):
    df = mm.media_df(spark, N, seed=SEED, num_partitions=3)
    out = mm.resize_images(df, out_w=4, out_h=4).collect()
    n_img = sum(1 for i in range(N) if mm.synth_media_row(SEED, i)["kind"] == "image")
    assert len(out) == n_img
    for r in out[:5]:
        assert len(r.pixels) == 16
        assert all(0.0 <= p <= 255.0 for p in r.pixels)


def test_sample_frames(spark):
    df = mm.media_df(spark, N, seed=SEED, num_partitions=3)
    got = mm.sample_frames(df, every_n=4).collect()
    expected = 0
    for i in range(N):
        row = mm.synth_media_row(SEED, i)
        if row["kind"] == "video":
            _, arr, _ = mm.decode_payload(row["media"])
            expected += len(range(0, arr.shape[0], 4))
    assert len(got) == expected
    assert all(r.frame_idx % 4 == 0 for r in got)


def test_mislabeled_kind_skips_not_crashes(spark):
    """A row whose kind column lies about the bytes (video payload labeled
    'image') must be skipped by the shape kernels, never crash the task."""
    from pdf_extractor_spark.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
        sample_frames,
        synth_media_row,
    )

    rows = [synth_media_row(7, i) for i in range(40)]
    vid = next(r for r in rows if r["kind"] == "video")
    img = next(r for r in rows if r["kind"] == "image")
    lied = [
        {**vid, "media_id": 1000, "kind": "image"},   # video bytes, image label
        {**img, "media_id": 1001, "kind": "video"},   # image bytes, video label
        img, vid,
    ]
    df = spark.createDataFrame(
        [(r["media_id"], r["kind"], bytearray(r["media"]), r["meta"]) for r in lied],
        schema=MEDIA_SCHEMA,
    )
    resized = resize_images(df, out_w=4, out_h=4).collect()
    frames = sample_frames(df, every_n=4).collect()
    assert {r.media_id for r in resized} == {img["media_id"]}
    assert {r.media_id for r in frames} == {vid["media_id"]}


def _encode_png(arr) -> bytes:
    """Minimal real PNG encoder (test twin): 8-bit grayscale, filter 0."""
    import struct
    import zlib

    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_roundtrip():
    """The real-codec branch genuinely decodes a real PNG (no Pillow):
    chunk walk + zlib + PNG un-filter recover the exact pixel plane."""
    import numpy as np

    from pdf_extractor_spark.multimodal import decode_payload

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (12, 9), dtype=np.uint8)
    kind, arr, meta = decode_payload(_encode_png(px))
    assert kind == "image"
    assert meta == {"width": 9, "height": 12}
    assert np.array_equal(arr, px)


def test_real_png_rgb_luminance():
    import struct
    import zlib

    import numpy as np

    from pdf_extractor_spark.multimodal import decode_payload

    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (30, 60, 90)  # mean 60
    rgb[1, 1] = (255, 255, 255)
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))
    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    kind, arr, _ = decode_payload(png)
    assert kind == "image" and arr[0, 0] == 60 and arr[1, 1] == 255


def test_real_wav_decode():
    """Stdlib-wave branch: PCM16 stereo mean-mixes to mono, sample rate
    and counts preserved."""
    import io
    import wave

    import numpy as np

    from pdf_extractor_spark.multimodal import decode_payload

    rng = np.random.default_rng(9)
    stereo = rng.integers(-30000, 30000, (50, 2)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(stereo.tobytes())
    kind, smp, meta = decode_payload(buf.getvalue())
    assert kind == "audio"
    assert meta["sample_rate"] == 16000 and meta["n_samples"] == 50
    assert np.array_equal(smp, stereo.mean(axis=1).astype(np.int16))


# --- baseline JPEG encoder (test twin of kernel/jpeg.py) --------------------
# Standard T.81 Annex K Huffman tables (published spec constants), shared by
# luma and chroma so the twin stays small; the DECODER never assumes them.

_JDC_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_JDC_VALS = bytes(range(12))
_JAC_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_JAC_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _jhuff_codes(bits, vals):
    """Canonical Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JBits:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per T.81


def _encode_jpeg(y, q=None, restart=0, color=False, sub=(2, 2)):
    """Baseline JPEG encoder (test twin): grayscale, or YCbCr with
    subsampled CONSTANT chroma (Cb=Cr=128 → luminance == Y plane)."""
    import struct

    import numpy as np

    from pdf_extractor_spark.kernel.jpeg import ZIGZAG, _dct_matrix

    A = _dct_matrix()
    y = np.asarray(y, np.uint8)
    h, w = y.shape
    q = np.ones(64, np.int32) if q is None else np.asarray(q, np.int32)
    dctab = _jhuff_codes(_JDC_BITS, _JDC_VALS)
    actab = _jhuff_codes(_JAC_BITS, _JAC_VALS)
    sh, sv = sub if color else (1, 1)
    mcux = -(-w // (8 * sh))
    mcuy = -(-h // (8 * sv))
    pad = np.pad(y, ((0, mcuy * sv * 8 - h), (0, mcux * sh * 8 - w)), mode="edge")

    bw = _JBits()
    dc_pred = [0, 0, 0]

    def put_block(block, ci):
        F = A @ (block.astype(np.float64) - 128.0) @ A.T
        zz = np.round(F.ravel()[ZIGZAG] / q).astype(np.int64)
        diff = int(zz[0]) - dc_pred[ci]
        dc_pred[ci] = int(zz[0])
        t = int(abs(diff)).bit_length()
        c, ln = dctab[t]
        bw.put(c, ln)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max(np.nonzero(zz[1:])[0], default=-1) + 1 if zz[1:].any() else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = actab[0xF0]
                bw.put(c, ln)
                run -= 16
            s = abs(v).bit_length()
            c, ln = actab[(run << 4) | s]
            bw.put(c, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            c, ln = actab[0x00]
            bw.put(c, ln)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.align()
                bw.buf += bytes([0xFF, 0xD0 + ((mcu_count // restart - 1) % 8)])
                dc_pred[:] = [0, 0, 0]
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    put_block(pad[y0 : y0 + 8, x0 : x0 + 8], 0)
            if color:
                flat = np.full((8, 8), 128, np.uint8)
                put_block(flat, 1)
                put_block(flat, 2)
            mcu_count += 1
    bw.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(int(x) & 0xFF for x in q))
    comps = b"\x01" + bytes([(sh << 4) | sv]) + b"\x00"
    scomps = b"\x01\x00"
    nc = 1
    if color:
        comps += b"\x02\x11\x00\x03\x11\x00"
        scomps += b"\x02\x00\x03\x00"
        nc = 3
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, nc) + comps)
    dht = seg(0xC4, b"\x00" + _JDC_BITS + _JDC_VALS) + seg(
        0xC4, b"\x10" + _JAC_BITS + _JAC_VALS
    )
    dri = seg(0xDD, struct.pack(">H", restart)) if restart else b""
    sos = seg(0xDA, bytes([nc]) + scomps + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(bw.buf) + b"\xff\xd9"
    )


def test_real_jpeg_decode_roundtrip():
    """The from-scratch baseline JPEG decoder recovers pixels from the
    encoder twin: with unit quantizers the only loss is DCT float rounding
    (≤2 gray levels); a uniform image comes back EXACT."""
    import numpy as np

    from pdf_extractor_spark.multimodal import decode_payload

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    kind, arr, meta = decode_payload(_encode_jpeg(px))
    assert kind == "image"
    assert meta == {"width": 17, "height": 24}
    assert arr.shape == (24, 17)
    assert int(np.abs(arr.astype(int) - px.astype(int)).max()) <= 2

    flat = np.full((11, 13), 77, np.uint8)
    _, arr2, _ = decode_payload(_encode_jpeg(flat))
    assert np.array_equal(arr2, flat)


def test_real_jpeg_color_subsampled_and_restart():
    """YCbCr 4:2:0-style MCUs (2x2 luma sampling, constant chroma) and
    restart markers both decode; luminance equals the Y plane within DCT
    rounding."""
    import numpy as np

    from pdf_extractor_spark.multimodal import decode_payload

    yy, xx = np.mgrid[0:21, 0:30]
    grad = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    _, arr, meta = decode_payload(_encode_jpeg(grad, color=True, sub=(2, 2)))
    assert meta == {"width": 30, "height": 21}
    assert int(np.abs(arr.astype(int) - grad.astype(int)).max()) <= 2

    _, arr3, _ = decode_payload(_encode_jpeg(grad, restart=2))
    assert int(np.abs(arr3.astype(int) - grad.astype(int)).max()) <= 2


def test_real_jpeg_coarse_quant_still_plausible():
    """A coarse quantizer loses detail but the decode must stay in range
    and near the source on a smooth image (the lossy-codec sanity bound)."""
    import numpy as np

    from pdf_extractor_spark.multimodal import decode_payload

    q = np.full(64, 16, np.int32)
    q[0] = 8
    yy, xx = np.mgrid[0:16, 0:16]
    smooth = (64 + yy * 4 + xx * 2).astype(np.uint8)
    _, arr, _ = decode_payload(_encode_jpeg(smooth, q=q))
    assert int(np.abs(arr.astype(int) - smooth.astype(int)).mean()) <= 6


def test_jpeg_unsupported_and_bombs_fail_fast():
    """Progressive JPEG raises NotImplementedError (→ ok=false rows);
    crafted dimension bombs are rejected BEFORE any dimension-proportional
    work; both classes return in bounded time."""
    import struct
    import time

    import numpy as np
    import pytest

    from pdf_extractor_spark.kernel.jpeg import decode_baseline_jpeg

    # SOF2 (progressive): honest refusal
    prog = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
    )
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(prog)

    # 60000x60000 declared dims: ValueError before allocation
    bomb = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 60000, 60000, 1) + b"\x01\x11\x00"
    )
    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        decode_baseline_jpeg(bomb)
    assert time.perf_counter() - t0 < 1.0

    # truncated entropy data: ValueError, not a hang
    px = np.full((8, 8), 100, np.uint8)
    enc = _encode_jpeg(px)
    with pytest.raises(Exception):
        decode_baseline_jpeg(enc[: len(enc) // 2])


def test_real_decoders_total_on_mutated_media():
    """Byte-flip fuzz over valid PNG, WAV and JPEG payloads: _decode_real either
    returns a decoded plane/wave or raises (callers catch and mark the row
    ok=false) — but it must fail FAST, never hang or kill the process.
    Corrupt media is routine in a crawl."""
    import io
    import time
    import wave as _wave

    import numpy as np

    from pdf_extractor_spark.multimodal import _decode_real

    arr = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    png = _encode_png(arr)
    bio = io.BytesIO()
    with _wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.arange(400, dtype="<i2").tobytes())
    wav = bio.getvalue()
    jpg = _encode_jpeg((np.arange(256, dtype=np.uint8).reshape(16, 16) * 5) % 256)
    for payload in (png, wav, jpg):
        stride = max(1, len(payload) // 40)
        for off in range(0, len(payload), stride):
            mutated = (
                bytes(payload[:off])
                + bytes([payload[off] ^ 0x81])
                + bytes(payload[off + 1 :])
            )
            t0 = time.perf_counter()
            try:
                _decode_real(mutated)
            except Exception:
                pass  # callers degrade the row; the contract here is speed
            assert time.perf_counter() - t0 < 5.0, off


def _mp4_box(typ: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(body) + 8) + typ + body


def _encode_mp4_meta(w, h, duration_ms, timescale=1000, ver=0) -> bytes:
    """Minimal ISO-BMFF metadata skeleton (test twin): ftyp + moov(mvhd +
    trak(tkhd)) — no media data, which is exactly what the probe reads."""
    import struct

    if ver == 1:
        mvhd = _mp4_box(
            b"mvhd",
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">IQ", timescale, duration_ms * timescale // 1000)
            + b"\x00" * 80,
        )
        tkhd = _mp4_box(
            b"tkhd",
            b"\x01\x00\x00\x07" + b"\x00" * 84
            + struct.pack(">II", w << 16, h << 16),
        )
    else:
        mvhd = _mp4_box(
            b"mvhd",
            b"\x00\x00\x00\x00" + b"\x00" * 8
            + struct.pack(">II", timescale, duration_ms * timescale // 1000)
            + b"\x00" * 80,
        )
        tkhd = _mp4_box(
            b"tkhd",
            b"\x00\x00\x00\x07" + b"\x00" * 72
            + struct.pack(">II", w << 16, h << 16),
        )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def test_probe_media_mp4_metadata():
    """MP4 metadata WITHOUT codec decode: mvhd duration + tkhd dims, both
    tkhd/mvhd versions; sample decode stays an honest refusal."""
    import pytest

    from pdf_extractor_spark.multimodal import decode_payload, probe_media

    for ver in (0, 1):
        payload = _encode_mp4_meta(640, 360, 2500, ver=ver)
        kind, meta = probe_media(payload)
        assert kind == "video"
        assert meta["width"] == 640 and meta["height"] == 360
        assert meta["duration_ms"] == 2500
        with pytest.raises(NotImplementedError):
            decode_payload(payload)  # sample decode needs a codec


def test_probe_media_headers_only_formats():
    """PNG IHDR, JPEG SOF (incl. PROGRESSIVE files the decoder refuses),
    WAV header, and the FAKE formats all probe without decoding."""
    import io
    import struct
    import wave

    import numpy as np
    import pytest

    from pdf_extractor_spark import multimodal as mm

    k, meta = mm.probe_media(_encode_png(np.zeros((5, 9), np.uint8)))
    assert (k, meta["width"], meta["height"]) == ("image", 9, 5)

    k, meta = mm.probe_media(_encode_jpeg(np.zeros((16, 24), np.uint8)))
    assert (k, meta["width"], meta["height"]) == ("image", 24, 16)

    # progressive JPEG: decode refuses, probe still reads dims from SOF2
    prog = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 33, 47, 1) + b"\x01\x11\x00"
    )
    with pytest.raises(NotImplementedError):
        mm.decode_payload(prog + b"\xff\xd9")
    k, meta = mm.probe_media(prog)
    assert (k, meta["width"], meta["height"]) == ("image", 47, 33)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(np.zeros(4000, "<i2").tobytes())
    k, meta = mm.probe_media(buf.getvalue())
    assert (k, meta["sample_rate"], meta["duration_ms"]) == ("audio", 8000, 500)

    row = mm.synth_media_row(7, 3)
    k, meta = mm.probe_media(row["media"])
    assert k == row["kind"]


def test_probe_media_bombs_fail_fast():
    """Box-walk safety: self-referential sizes, zero sizes, truncated
    largesize — the walk only advances and returns in bounded time."""
    import struct
    import time

    import pytest

    from pdf_extractor_spark.multimodal import probe_media

    good = _encode_mp4_meta(64, 64, 1000)
    bombs = [
        good[:4] + b"ftyp" + b"\x00" * 4,                     # truncated
        struct.pack(">I", 8) + b"ftyp" + struct.pack(">I", 7) + b"moov",  # size<hdr
        # largesize marker (size==1) with a truncated 64-bit length
        struct.pack(">I", 16) + b"ftyp" + b"\x00" * 8
        + struct.pack(">I", 1) + b"moov" + b"\x00\x00",
    ]
    stride = max(1, len(good) // 30)
    for off in range(0, len(good), stride):
        bombs.append(good[:off] + bytes([good[off] ^ 0xFF]) + good[off + 1 :])
    for payload in bombs:
        t0 = time.perf_counter()
        try:
            probe_media(payload)
        except Exception:
            pass
        assert time.perf_counter() - t0 < 2.0


def test_media_probe_spark(spark):
    """The Spark probe pass: every FAKE row probes ok with kind-true
    metadata; a garbage row is ok=false data, never a task failure."""
    import pandas as pd

    from pdf_extractor_spark import multimodal as mm

    df = mm.media_df(spark, 60, seed=7, num_partitions=3)
    rows = {r.media_id: r for r in mm.media_probe(df).collect()}
    assert len(rows) == 60
    for i in (0, 7, 59):
        truth = mm.synth_media_row(7, i)
        assert rows[i].kind == truth["kind"] and rows[i].ok
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [999], "media": [b"\x00garbage~~"]})
    )
    got = mm.media_probe(bad).collect()
    assert len(got) == 1 and got[0].ok is False


def test_mp4_demux_roundtrip_byte_identity():
    """write_mp4 → mp4_sample_table must byte-address every frame exactly
    (raw-gray samples recovered byte-identical, dts sequence follows the
    two-run stts), the alternating 2/3-sample chunking must survive the
    stsc run expansion, and the existing header prober must agree with
    the writer on dims/duration — writer and parser validate each other
    against ISO 14496-12, not against a shared helper."""
    import numpy as np

    from pdf_extractor_spark.multimodal import (
        mp4_sample_table,
        probe_media,
        write_mp4,
    )

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (9, 6, 5), dtype=np.uint8)
    payload = write_mp4(frames, fps=24, timescale=1000)
    table = mp4_sample_table(payload)
    assert table is not None and len(table) == 9
    for i, (pos, size, dts) in enumerate(table):
        assert payload[pos : pos + size] == frames[i].tobytes()
        assert dts == i * (1000 // 24)
    kind, meta = probe_media(payload)
    assert kind == "video"
    assert (meta["width"], meta["height"]) == (5, 6)
    # duration: 8 samples at delta + final sample at 2*delta
    assert meta["duration_ms"] == 10 * (1000 // 24)
    # single-frame container (one chunk, one stts run)
    one = write_mp4(frames[:1])
    t1 = mp4_sample_table(one)
    assert len(t1) == 1 and one[t1[0][0] : t1[0][0] + t1[0][1]] == frames[0].tobytes()


def test_mp4_sample_table_total_on_mutated_and_bombs():
    """Byte-flip fuzz + declared-size bombs: mp4_sample_table returns a
    (possibly partial) table or None — never raises, never allocates
    proportional to DECLARED sizes, and every returned range lies inside
    the payload. Malformed containers are routine in a crawl."""
    import struct
    import time

    import numpy as np

    from pdf_extractor_spark.multimodal import _MP4_MAX_SAMPLES, mp4_sample_table, write_mp4

    frames = np.random.default_rng(3).integers(0, 256, (5, 4, 4), dtype=np.uint8)
    payload = write_mp4(frames)
    t0 = time.monotonic()
    for off in range(0, len(payload)):
        mutated = payload[:off] + bytes([payload[off] ^ 0x81]) + payload[off + 1 :]
        table = mp4_sample_table(mutated)
        if table is not None:
            n = len(mutated)
            assert all(0 <= p and p + s <= n for p, s, _ in table)
    assert time.monotonic() - t0 < 30.0  # full per-byte sweep stays cheap
    # stsz bomb: huge declared sample count → rejected before any work
    bomb = bytearray(payload)
    i = bomb.find(b"stsz")
    bomb[i + 12 : i + 16] = struct.pack(">I", _MP4_MAX_SAMPLES + 1)
    t0 = time.monotonic()
    assert mp4_sample_table(bytes(bomb)) is None
    assert time.monotonic() - t0 < 0.1
    # stco offsets past EOF → those samples clipped, never read
    clip = bytearray(payload)
    j = clip.find(b"stco")
    clip[j + 12 : j + 16] = struct.pack(">I", 2**30)
    table = mp4_sample_table(bytes(clip))
    if table is not None:
        assert all(p + s <= len(clip) for p, s, _ in table)


def test_mp4_demux_kernel_spark(spark):
    """demux_mp4_frames over a distributed mp4 table: every_n sampling,
    per-sample values match a driver-side replay of the same writer, and
    junk rows are skipped (failure-as-data), not task failures."""
    import numpy as np
    import pandas as pd

    from pdf_extractor_spark import multimodal as mm

    media = mm.mp4_media_df(spark, 20, seed=7, num_partitions=4)
    got = mm.demux_mp4_frames(media, every_n=2).toPandas()
    assert (got["sample_idx"] % 2 == 0).all()
    # replay media_id 3 driver-side with the same seeded generator
    rng = np.random.default_rng([7, 3])
    nf = int(rng.integers(2, 13))
    w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
    frames = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
    mine = got[got.media_id == 3].sort_values("sample_idx")
    assert list(mine.sample_idx) == list(range(0, nf, 2))
    for _, r in mine.iterrows():
        assert r.n_bytes == w * h
        assert abs(r.frame_mean - float(frames[int(r.sample_idx)].mean())) < 1e-9
    # junk payload → zero rows, no failure
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [99], "media": [b"\x00not an mp4 at all"]})
    )
    assert mm.demux_mp4_frames(bad).count() == 0
