"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extends the engine beyond the reference's text/PDF payloads (reference:
services/pdf_service.py:14-41 handles only PDF bytes) to the media columns a
large-scale training-data pipeline carries. Design per the brief:

  - media is an opaque `binary` column with a typed `meta` struct alongside;
  - decode / feature-extract / resize / frame-sample are Arrow-vectorized
    `mapInPandas` stages (same execution shape as the HTML/PDF kernel:
    project → mapInPandas → no intermediate shuffle);
  - REAL decode: PNG (from-scratch chunk walk + zlib + PNG row
    un-filtering, shared with the PDF kernel's xref-stream predictor code),
    WAV (stdlib wave), and baseline JPEG (from-scratch marker walk +
    canonical Huffman + dequant + IDCT, kernel/jpeg.py) genuinely in-repo;
    MP4 would need pyav. Anything undecodable (progressive JPEG, video)
    raises NotImplementedError, which the feature kernels record as
    ok=false rows. The deterministic "FAKE" format remains for hermetic
    high-volume tests.

Payload format (deterministic, seeded, self-describing):
  magic(8) = b"FAKEIMG1" | b"FAKEAUD1" | b"FAKEVID1"
  header   = little-endian uint32 fields
             img: width, height            then width*height uint8 pixels
             aud: sample_rate, n_samples   then n_samples int16 samples
             vid: width, height, n_frames  then n_frames*width*height uint8
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

MAGIC_IMG = b"FAKEIMG1"
MAGIC_AUD = b"FAKEAUD1"
MAGIC_VID = b"FAKEVID1"

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int, duration_ms: int>"
)

# ---------------------------------------------------------------------------
# deterministic synthesizer (pure function of (seed, media_id))
# ---------------------------------------------------------------------------


def synth_media_row(seed: int, media_id: int) -> dict:
    rng = np.random.default_rng([seed, media_id])
    kind = ("image", "audio", "video")[int(rng.integers(0, 3))]
    if kind == "image":
        w, h = int(rng.integers(8, 65)), int(rng.integers(8, 65))
        pixels = rng.integers(0, 256, w * h, dtype=np.uint8)
        payload = MAGIC_IMG + struct.pack("<II", w, h) + pixels.tobytes()
        meta = (w, h, None, None, None)
    elif kind == "audio":
        sr = int(rng.choice([8000, 16000, 44100]))
        n = int(rng.integers(sr // 10, sr // 2))  # 0.1–0.5 s
        samples = rng.integers(-32768, 32768, n, dtype=np.int16)
        payload = MAGIC_AUD + struct.pack("<II", sr, n) + samples.tobytes()
        meta = (None, None, sr, None, int(n * 1000 / sr))
    else:
        w, h, nf = int(rng.integers(4, 17)), int(rng.integers(4, 17)), int(rng.integers(2, 31))
        frames = rng.integers(0, 256, nf * w * h, dtype=np.uint8)
        payload = MAGIC_VID + struct.pack("<III", w, h, nf) + frames.tobytes()
        meta = (w, h, None, nf, int(nf * 1000 / 24))
    return {"media_id": media_id, "kind": kind, "media": payload, "meta": meta}


def media_df(spark, n_rows: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed media-table generation (executor-side, like synth.pages_df)."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [synth_media_row(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(0, n_rows, numPartitions=num_partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


# ---------------------------------------------------------------------------
# decode kernels (the stub boundary)
# ---------------------------------------------------------------------------


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def _decode_png(payload: bytes):
    """Real PNG decode from scratch: chunk walk → IHDR, concatenated IDAT →
    zlib inflate → PNG row un-filter (the same predictor implementation the
    PDF kernel uses for xref streams) → luminance plane. 8-bit
    non-interlaced gray/RGB/RGBA; palette and 16-bit images raise (rare in
    training corpora, and honesty beats a wrong decode)."""
    from pdf_extractor_spark.kernel.pdf_filters import png_unpredict

    pos = 8
    ihdr = None
    idat = b""
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if length > n:  # corrupt chunk length
            raise ValueError("corrupt PNG chunk")
        if ctype == b"IHDR":
            ihdr = payload[pos + 8 : pos + 8 + length]
        elif ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    channels = _PNG_CHANNELS.get(color)
    if depth != 8 or interlace != 0 or channels is None:
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} unsupported"
        )
    # validate DECLARED dimensions before doing dimension-proportional
    # work: a flipped IHDR byte (mutation fuzz reproducer) or a crafted
    # bomb can declare ~2^31-pixel rows, and both the un-filter loop and
    # the inflate would otherwise burn attacker-controlled CPU/memory.
    # 2^28 bytes ≈ a 9000×9000 RGBA frame — far above any training-corpus
    # thumbnail, far below a wedged task.
    expected = (w * channels + 1) * h
    if w == 0 or h == 0 or expected > 1 << 28:
        raise ValueError(f"implausible PNG dimensions {w}x{h}")
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected)  # cap output: inflate-bomb defense
    if len(raw) != expected:
        raise ValueError("PNG pixel data does not match declared dimensions")
    px = np.frombuffer(
        png_unpredict(raw, channels, 8, w), np.uint8, h * w * channels
    ).reshape(h, w, channels)
    gray = px[:, :, 0] if channels <= 2 else px[:, :, :3].mean(axis=2).astype(np.uint8)
    return "image", gray, {"width": w, "height": h}


def _decode_wav(payload: bytes):
    """Real WAV decode via the stdlib wave module: PCM 8/16-bit, channels
    mean-mixed to mono int16."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        sr = wf.getframerate()
        nframes = wf.getnframes()
        sw = wf.getsampwidth()
        ch = wf.getnchannels()
        frames = wf.readframes(nframes)
    if sw == 2:
        smp = np.frombuffer(frames, "<i2")
    elif sw == 1:  # 8-bit WAV is unsigned
        smp = ((np.frombuffer(frames, np.uint8).astype(np.int32) - 128) * 256).astype(
            np.int16
        )
    else:
        raise NotImplementedError(f"WAV sample width {sw} unsupported")
    if ch > 1:
        smp = smp[: len(smp) - len(smp) % ch].reshape(-1, ch).mean(axis=1).astype(np.int16)
    return "audio", smp, {"sample_rate": sr, "n_samples": len(smp)}


def _decode_real(payload: bytes):
    """Real-codec branch: PNG and WAV decode from scratch in-repo (zlib +
    the PDF kernel's PNG un-filter; stdlib wave) — no external codec
    needed. JPEG goes through Pillow WHEN INSTALLED (optional import,
    absent in this container); everything else raises NotImplementedError,
    which the feature kernels turn into ok=false rows (failures are
    data)."""
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:3] == b"\xff\xd8\xff":
        # baseline JPEG decodes FROM SCRATCH (kernel/jpeg.py: markers,
        # canonical Huffman, dequant, IDCT, restart intervals — hermetic,
        # round-4 verdict #5); progressive/arithmetic raise
        # NotImplementedError below and become ok=false rows
        from pdf_extractor_spark.kernel.jpeg import decode_baseline_jpeg

        gray, w, h = decode_baseline_jpeg(payload)
        return "image", gray, {"width": w, "height": h}
    raise NotImplementedError(
        "no decoder for payload magic %r (MP4 needs optional pyav, "
        "not installed here)" % payload[:8]
    )


def decode_payload(payload: bytes) -> tuple[str, np.ndarray, dict]:
    """(kind, sample_array, meta) from one payload. Raises on unknown magic."""
    magic = payload[:8]
    if magic == MAGIC_IMG:
        w, h = struct.unpack_from("<II", payload, 8)
        px = np.frombuffer(payload, np.uint8, w * h, 16)
        return "image", px.reshape(h, w), {"width": w, "height": h}
    if magic == MAGIC_AUD:
        sr, n = struct.unpack_from("<II", payload, 8)
        smp = np.frombuffer(payload, np.int16, n, 16)
        return "audio", smp, {"sample_rate": sr, "n_samples": n}
    if magic == MAGIC_VID:
        w, h, nf = struct.unpack_from("<III", payload, 8)
        fr = np.frombuffer(payload, np.uint8, nf * w * h, 20)
        return "video", fr.reshape(nf, h, w), {"width": w, "height": h, "n_frames": nf}
    return _decode_real(payload)


# ---------------------------------------------------------------------------
# header-only metadata probe (no sample decode)
# ---------------------------------------------------------------------------


def _probe_mp4(payload: bytes) -> dict | None:
    """ISO/IEC 14496-12 (MP4/ISO-BMFF) box walk, METADATA ONLY: movie
    timescale/duration from moov/mvhd, presentation width/height from the
    first visual trak/tkhd (16.16 fixed point). No codec work — H.264/HEVC
    sample decode stays an honest NotImplementedError in decode_payload —
    but a curation pipeline can filter/bucket video by dimensions and
    duration without touching a codec, which is the metadata pass real
    media pipelines run first. Bomb-safe by construction: the box walk
    only ever advances (size < header ⇒ stop), depth is capped, and no
    allocation is proportional to declared sizes."""
    n = len(payload)
    if n < 12 or payload[4:8] != b"ftyp":
        return None
    out = {"width": None, "height": None, "duration_ms": None}

    def walk(start: int, end: int, depth: int) -> None:
        off = start
        while off + 8 <= end and depth <= 6:
            size = int.from_bytes(payload[off : off + 4], "big")
            typ = payload[off + 4 : off + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if off + 16 > end:
                    return
                size = int.from_bytes(payload[off + 8 : off + 16], "big")
                hdr = 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - off
            if size < hdr or off + size > end:
                return  # malformed: stop walking, keep what we have
            b0, b1 = off + hdr, off + size
            if typ in (b"moov", b"trak", b"mdia"):
                walk(b0, b1, depth + 1)
            elif typ == b"mvhd" and b1 - b0 >= 24:
                ver = payload[b0]
                if ver == 1 and b1 - b0 >= 32:
                    ts = int.from_bytes(payload[b0 + 20 : b0 + 24], "big")
                    dur = int.from_bytes(payload[b0 + 24 : b0 + 32], "big")
                else:
                    ts = int.from_bytes(payload[b0 + 12 : b0 + 16], "big")
                    dur = int.from_bytes(payload[b0 + 16 : b0 + 20], "big")
                if ts:
                    out["duration_ms"] = int(dur * 1000 // ts)
            elif typ == b"tkhd":
                woff = b0 + (88 if payload[b0] == 1 else 76)
                if woff + 8 <= b1:
                    w = int.from_bytes(payload[woff : woff + 4], "big") >> 16
                    h = int.from_bytes(payload[woff + 4 : woff + 8], "big") >> 16
                    if w and h and out["width"] is None:
                        out["width"], out["height"] = w, h
            off += size

    walk(0, n, 0)
    if out["duration_ms"] is None and out["width"] is None:
        return None  # ftyp but no parseable moov: not probe-able
    return out


def _probe_jpeg_dims(payload: bytes) -> dict | None:
    """JPEG dimensions from the SOF marker WITHOUT entropy decode — works
    for progressive/arithmetic files the baseline decoder refuses."""
    if payload[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        (seglen,) = struct.unpack_from(">H", payload, i)
        if seglen < 2 or i + seglen > n:
            return None
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _, h, w, _ = struct.unpack_from(">BHHB", payload, i + 2)
            return {"width": w, "height": h}
        if marker == 0xDA:
            return None  # scan reached without SOF: malformed
        i += seglen
    return None


def probe_media(payload: bytes) -> tuple[str, dict]:
    """(kind, metadata) from HEADERS ONLY — no pixel/sample decode.

    The curation-first metadata pass: dimensions, duration, sample rate
    for filtering and bucketing a media column at corpus scale without
    paying (or even having) a codec. Covers the FAKE formats, PNG (IHDR),
    JPEG (any SOF, incl. progressive files decode_payload refuses), WAV
    (stdlib header read), and MP4/ISO-BMFF (mvhd/tkhd box walk).
    Raises ValueError on unknown/unparseable payloads.
    """
    magic = payload[:8]
    if magic == MAGIC_IMG:
        w, h = struct.unpack_from("<II", payload, 8)
        return "image", {"width": w, "height": h}
    if magic == MAGIC_AUD:
        sr, n = struct.unpack_from("<II", payload, 8)
        return "audio", {"sample_rate": sr, "duration_ms": int(n * 1000 / sr)}
    if magic == MAGIC_VID:
        w, h, nf = struct.unpack_from("<III", payload, 8)
        return "video", {"width": w, "height": h, "n_frames": nf}
    if payload[:8] == _PNG_MAGIC and len(payload) >= 24:
        w, h = struct.unpack_from(">II", payload, 16)
        return "image", {"width": w, "height": h}
    jd = _probe_jpeg_dims(payload)
    if jd is not None:
        return "image", jd
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as wf:
            sr = wf.getframerate()
            return "audio", {
                "sample_rate": sr,
                "duration_ms": int(wf.getnframes() * 1000 / sr) if sr else None,
            }
    mp4 = _probe_mp4(payload)
    if mp4 is not None:
        return "video", mp4
    raise ValueError(f"unprobeable payload magic {payload[:8]!r}")


PROBE_SCHEMA = (
    "media_id long, kind string, ok boolean, width int, height int, "
    "sample_rate int, duration_ms int, n_frames int"
)


def media_probe(media):
    """media DF → header-only metadata DF (mapInPandas, pruned to
    (media_id, media); failures are ok=false rows, never task failures)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "kind", "ok", "width", "height",
                "sample_rate", "duration_ms", "n_frames")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    kind, meta = probe_media(bytes(payload))
                    ok = True
                except Exception:
                    kind, meta, ok = "unknown", {}, False
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["ok"].append(ok)
                for k in ("width", "height", "sample_rate", "duration_ms", "n_frames"):
                    out[k].append(meta.get(k))
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.select("media_id", "media").mapInPandas(
        kernel, schema=PROBE_SCHEMA
    )


FEATURES_SCHEMA = (
    "media_id long, kind string, ok boolean, n_values long, "
    "mean_value double, std_value double, features array<float>"
)

_N_FEATURES = 16


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_id, media) → fixed-width feature vector.

    Features = 16-bin histogram-ish summary (deterministic, numpy-vectorized
    per payload). Decode failures are data (`ok=false`), never task failures —
    same failure policy as the text kernel (kernel/extract.py:40-63).
    """
    for pdf in batches:
        out = {k: [] for k in ("media_id", "kind", "ok", "n_values", "mean_value", "std_value", "features")}
        for mid, payload in zip(pdf["media_id"], pdf["media"]):
            try:
                kind, arr, _meta = decode_payload(bytes(payload))
                flat = arr.astype(np.float64).ravel()
                hist, _ = np.histogram(flat, bins=_N_FEATURES)
                feats = (hist / max(len(flat), 1)).astype(np.float32)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["ok"].append(True)
                out["n_values"].append(len(flat))
                out["mean_value"].append(float(flat.mean()) if len(flat) else 0.0)
                out["std_value"].append(float(flat.std()) if len(flat) else 0.0)
                out["features"].append(feats)
            except Exception:  # includes NotImplementedError from _decode_real
                out["media_id"].append(mid)
                out["kind"].append("unknown")
                out["ok"].append(False)
                out["n_values"].append(0)
                out["mean_value"].append(0.0)
                out["std_value"].append(0.0)
                out["features"].append(np.zeros(_N_FEATURES, np.float32))
        if out["media_id"]:  # same empty-frame Arrow-typing guard
            yield pd.DataFrame(out)


def media_features(media):
    """media DF → features DF. Projects (media_id, media) first so the scan
    is pruned to the two needed columns, exactly like the text kernel."""
    return media.select("media_id", "media").mapInPandas(
        extract_features, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = "media_id long, out_w int, out_h int, pixels array<float>"


def resize_images(media, out_w: int = 8, out_h: int = 8):
    """Image resize via block mean-pool (deterministic stand-in for a real
    resampler). Non-image rows are filtered out BEFORE the UDF — predicate
    stays JVM-side."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pixels = [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    kind, arr, _ = decode_payload(bytes(payload))
                except Exception:  # corrupt payload: skip row, never fail task
                    continue
                if kind != "image" or arr.ndim != 2:
                    # kind column can lie about the bytes in real tables —
                    # a mislabeled video here must skip, not crash the task
                    continue
                h, w = arr.shape
                ys = (np.arange(out_h + 1) * h // out_h)
                xs = (np.arange(out_w + 1) * w // out_w)
                pooled = np.array(
                    [
                        arr[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
                        for i in range(out_h)
                        for j in range(out_w)
                    ],
                    np.float32,
                )
                ids.append(mid)
                pixels.append(pooled)
            if ids:
                # an all-skipped batch must yield NOTHING: an empty frame's
                # columns come out numpy-float64-typed and Arrow refuses the
                # float64→array<float> conversion, failing the task
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "out_w": [out_w] * len(ids),
                        "out_h": [out_h] * len(ids),
                        "pixels": pixels,
                    }
                )

    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "media")
        .mapInPandas(kernel, schema=RESIZED_SCHEMA)
    )


FRAMES_SCHEMA = "media_id long, frame_idx int, frame_mean double"


def sample_frames(media, every_n: int = 4):
    """Frame sampling: one output row per kept frame (UDTF shape — one row
    in, many rows out, still a single Arrow pass, no shuffle)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    kind, arr, _ = decode_payload(bytes(payload))
                except Exception:  # corrupt payload: skip row, never fail task
                    continue
                if kind != "video" or arr.ndim != 3:
                    continue  # mislabeled bytes: skip, never mis-sample
                for fi in range(0, arr.shape[0], every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    means.append(float(arr[fi].mean()))
            if ids:  # same empty-frame Arrow-typing guard as resize_images
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": idxs, "frame_mean": means}
                )

    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "media")
        .mapInPandas(kernel, schema=FRAMES_SCHEMA)
    )


# ---------------------------------------------------------------------------
# MP4/ISO-BMFF sample-table demux (codec-free frame sampling)
# ---------------------------------------------------------------------------

_MP4_MAX_SAMPLES = 1_000_000  # bomb guard: tables beyond this are rejected


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def write_mp4(
    frames: np.ndarray, fps: int = 24, timescale: int = 1000
) -> bytes:
    """Minimal valid ISO/IEC 14496-12 container around raw gray frames —
    the deterministic writer twin for the demux (same discipline as the
    from-scratch PNG/JPEG/WAV codecs: the sandbox has no media libs, so
    fixtures are built by OUR writer and verified by OUR parser, and both
    against the spec's byte layout). One sample per frame; chunks
    alternate 2 and 3 samples so stsc carries real runs, and the final
    sample gets a doubled duration so stts carries two entries — the
    writer exists to exercise the parser's table logic, not to please a
    lenient reader."""
    nf, h, w = frames.shape
    samples = [frames[i].tobytes() for i in range(nf)]
    delta = timescale // fps
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat_body = b"".join(samples)
    mdat_off = len(ftyp) + 8  # absolute offset of first sample byte

    # chunk layout: 2,3,2,3,... samples per chunk
    chunks, i, take = [], 0, 2
    while i < nf:
        chunks.append((i, min(take, nf - i)))
        i += take
        take = 5 - take  # alternate 2 <-> 3
    sizes = [len(s) for s in samples]
    offs, pos = [], mdat_off
    for first, cnt in chunks:
        offs.append(pos)
        pos += sum(sizes[first : first + cnt])

    # stts: (nf-1) samples at `delta`, last sample at 2*delta
    if nf > 1:
        stts_entries = [(nf - 1, delta), (1, 2 * delta)]
    else:
        stts_entries = [(1, delta)]
    stts = _box(b"stts", struct.pack(">II", 0, len(stts_entries))
                + b"".join(struct.pack(">II", c, d) for c, d in stts_entries))
    # stsc runs: compress (first_chunk, samples_per_chunk, desc=1)
    runs = []
    for ci, (_, cnt) in enumerate(chunks):
        if not runs or runs[-1][1] != cnt:
            runs.append((ci + 1, cnt))
    stsc = _box(b"stsc", struct.pack(">II", 0, len(runs))
                + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, nf)
                + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _box(b"stco", struct.pack(">II", 0, len(offs))
                + b"".join(struct.pack(">I", o) for o in offs))
    # stsd: one bare "raw " visual sample entry (no codec config needed)
    entry = struct.pack(">I", 86) + b"raw " + bytes(6) + struct.pack(">H", 1) + bytes(70)
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dur = (nf + 1) * delta  # nf-1 at delta + one at 2*delta
    mdhd = _box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + bytes(12) + b"v\x00")
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">III", 0x00000007, 0, 0)
                + struct.pack(">II", 1, 0) + struct.pack(">I", dur)
                + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
                + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                + bytes(10) + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + bytes(24) + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


def _iter_boxes(payload: bytes, start: int, end: int):
    """Yield (typ, body_start, body_end) for the boxes in [start, end) —
    the same only-ever-advances discipline as _probe_mp4's walk."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(payload[off : off + 4], "big")
        typ = payload[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                return
            size = int.from_bytes(payload[off + 8 : off + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            return
        yield typ, off + hdr, off + size
        off += size


def _find_box(payload: bytes, start: int, end: int, path: tuple[bytes, ...]):
    """Body range of the first box at `path` (e.g. (b'moov', b'trak'))."""
    for typ, b0, b1 in _iter_boxes(payload, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return b0, b1
            sub = _find_box(payload, b0, b1, path[1:])
            if sub is not None:
                return sub
    return None


def mp4_sample_table(payload: bytes) -> list[tuple[int, int, int]] | None:
    """Per-sample (byte_offset, byte_size, dts_ms) from the first trak's
    sample table — the codec-free demux that turns 'video is an opaque
    blob' into addressable frames: stsz sizes, stco chunk offsets, stsc
    sample->chunk runs, stts time deltas, mdhd timescale (ISO 14496-12
    §8.5-8.7). Returns None when the payload is not ISO-BMFF or the
    tables are absent/malformed; every table length is validated against
    its box size BEFORE any read and the sample count is capped
    (_MP4_MAX_SAMPLES), so declared-size bombs cost nothing."""
    n = len(payload)
    if n < 12 or payload[4:8] != b"ftyp":
        return None
    moov = _find_box(payload, 0, n, (b"moov",))
    if moov is None:
        return None
    stbl = _find_box(payload, moov[0], moov[1], (b"trak", b"mdia", b"minf", b"stbl"))
    mdhd = _find_box(payload, moov[0], moov[1], (b"trak", b"mdia", b"mdhd"))
    if stbl is None or mdhd is None:
        return None
    b0, b1 = mdhd
    if payload[b0] == 1:
        if b1 - b0 < 24:
            return None
        timescale = int.from_bytes(payload[b0 + 20 : b0 + 24], "big")
    else:
        if b1 - b0 < 16:
            return None
        timescale = int.from_bytes(payload[b0 + 12 : b0 + 16], "big")
    if not timescale:
        return None

    tables: dict[bytes, tuple[int, int]] = {}
    for typ, t0, t1 in _iter_boxes(payload, stbl[0], stbl[1]):
        tables[typ] = (t0, t1)

    def u32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], "big")

    def entries(typ: bytes, width: int, skip: int = 8):
        """Validated entry array of a full box: (count, first_entry_off),
        or None if the declared count overruns the box or the cap."""
        if typ not in tables:
            return None
        t0, t1 = tables[typ]
        if t1 - t0 < skip:
            return None
        cnt = u32(t0 + skip - 4)
        if cnt > _MP4_MAX_SAMPLES or t0 + skip + cnt * width > t1:
            return None
        return cnt, t0 + skip

    # stsz: fixed size or per-sample table
    if b"stsz" not in tables:
        return None
    z0, z1 = tables[b"stsz"]
    if z1 - z0 < 12:
        return None
    fixed, n_samples = u32(z0 + 4), u32(z0 + 8)
    if n_samples > _MP4_MAX_SAMPLES:
        return None
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if z0 + 12 + n_samples * 4 > z1:
            return None
        sizes = [u32(z0 + 12 + 4 * i) for i in range(n_samples)]

    co = entries(b"stco", 4)
    co64 = entries(b"co64", 8)
    if co is not None:
        n_chunks, coff = co
        chunk_offs = [u32(coff + 4 * i) for i in range(n_chunks)]
    elif co64 is not None:
        n_chunks, coff = co64
        chunk_offs = [
            int.from_bytes(payload[coff + 8 * i : coff + 8 * i + 8], "big")
            for i in range(n_chunks)
        ]
    else:
        return None

    sc = entries(b"stsc", 12)
    if sc is None:
        return None
    n_runs, soff = sc
    runs = [(u32(soff + 12 * i), u32(soff + 12 * i + 4)) for i in range(n_runs)]
    if any(fc < 1 for fc, _ in runs):
        return None

    tt = entries(b"stts", 8)
    if tt is None:
        return None
    n_tt, toff = tt
    deltas: list[int] = []
    for i in range(n_tt):
        cnt, d = u32(toff + 8 * i), u32(toff + 8 * i + 4)
        if len(deltas) + cnt > n_samples:
            cnt = n_samples - len(deltas)
        deltas.extend([d] * cnt)
        if len(deltas) >= n_samples:
            break
    if len(deltas) < n_samples:
        return None

    # expand stsc runs: samples-per-chunk for each chunk index
    out: list[tuple[int, int, int]] = []
    si, dts = 0, 0
    for ci in range(len(chunk_offs)):
        spc = 0
        for ri, (fc, cnt) in enumerate(runs):
            nxt = runs[ri + 1][0] if ri + 1 < len(runs) else None
            if fc <= ci + 1 and (nxt is None or ci + 1 < nxt):
                spc = cnt
        pos = chunk_offs[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            size = sizes[si]
            if 0 <= pos and pos + size <= n:  # clip to payload: never read past
                out.append((pos, size, dts * 1000 // timescale))
            dts += deltas[si]
            pos += size
            si += 1
    return out if out else None


DEMUX_SCHEMA = (
    "media_id long, sample_idx int, dts_ms int, n_bytes int, frame_mean double"
)


def demux_mp4_frames(media, every_n: int = 1):
    """MP4 frame sampling WITHOUT a codec: mp4_sample_table addresses each
    sample's byte range, the kernel slices every `every_n`-th sample out of
    the blob and summarizes it (mean over the raw sample bytes — for the
    writer twin's raw-gray payloads that IS the frame mean; for a real
    codec payload it is still a deterministic content fingerprint). Same
    UDTF shape as sample_frames: one Arrow pass, rows out >= rows in, no
    shuffle; non-MP4 and malformed payloads are skipped, never task
    failures."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "sample_idx", "dts_ms", "n_bytes", "frame_mean")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                b = bytes(payload)
                table = mp4_sample_table(b)
                if table is None:
                    continue
                for idx in range(0, len(table), every_n):
                    pos, size, dts = table[idx]
                    arr = np.frombuffer(b, np.uint8, size, pos)
                    out["media_id"].append(mid)
                    out["sample_idx"].append(idx)
                    out["dts_ms"].append(dts)
                    out["n_bytes"].append(size)
                    out["frame_mean"].append(float(arr.mean()) if size else 0.0)
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.select("media_id", "media").mapInPandas(kernel, schema=DEMUX_SCHEMA)


def mp4_media_df(spark, n_rows: int, seed: int = 42, num_partitions: int | None = None):
    """Deterministic distributed MP4 table: real ISO-BMFF containers from
    write_mp4 around seeded raw-gray frames (executor-side generation,
    like media_df/pages_df)."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                nf = int(rng.integers(2, 13))
                w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
                frames = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
                rows.append({"media_id": int(i), "media": write_mp4(frames)})
            yield pd.DataFrame(rows)

    return spark.range(0, n_rows, numPartitions=num_partitions).mapInPandas(
        gen, schema="media_id long, media binary"
    )
