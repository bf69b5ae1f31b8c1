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
    with pytest.raises(NotImplementedError):
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


def test_jpeg_skipped_unless_pillow():
    """JPEG needs the optional Pillow import; without it the payload must
    raise NotImplementedError (→ ok=false rows), never garbage."""
    import pytest

    from pdf_extractor_spark import multimodal

    fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    if multimodal._PIL_Image is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_payload(fake_jpeg)
    else:  # pragma: no cover - Pillow present
        pytest.skip("Pillow installed; JPEG path covered by real decode")


def test_real_decoders_total_on_mutated_media():
    """Byte-flip fuzz over valid PNG and WAV payloads: _decode_real either
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
    for payload in (png, wav):
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
