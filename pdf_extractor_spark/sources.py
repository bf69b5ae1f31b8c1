"""Page-table sources beyond parquet: raw files and WARC archives.

The reference discovers input as files on disk (reference: cli.py:105 —
`rglob("*.pdf")`); Common-Crawl ships as WARC. Both map onto the same
`(url, warc_ts, html, text, lang)` pages schema (BASELINE.json input_hint)
so the whole engine — kernel, resume, sinks, operators — runs unchanged on
top of either source.

Raw files:   `spark.read.format("binaryFile")` — Spark's built-in whole-file
             source; one row per file, content as binary, no Python I/O.
WARC:        binaryFile over `*.warc` / `*.warc.gz` + an Arrow-vectorized
             record parser (mapInPandas — same execution shape as the
             extraction kernel). Handles WARC/1.0 response records, the
             embedded HTTP response header block, and the Common-Crawl
             member-gzip layout (each record its own gzip member,
             concatenated).

Scale note: binaryFile assigns WHOLE files to tasks — parallelism equals
file count, so WARC inputs should be the archive-standard ~100 MB-1 GB
members (Common Crawl ships ~1 GB .warc.gz; a crawl segment has thousands
of them → plenty of tasks). A single giant WARC would serialize; that is a
property of the container, not this reader — re-shard upstream.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.synth import PAGES_SCHEMA_DDL

_PAGES_COLS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages_binary(
    spark: SparkSession, input_dir: str, glob: str = "*.{html,htm,pdf}"
) -> DataFrame:
    """Raw files on disk → pages table (S1 raw-file mode).

    One row per file via Spark's binaryFile source: url = file path,
    warc_ts = file modification time, html = raw bytes. The kernel's
    magic-byte dispatch decides HTML vs PDF — the extension glob only
    prefilters the listing (reference: suffix matching at
    finetune_commands/excel2training.py:231-239; our dispatch stays
    content-based, extract.py).
    """
    from pyspark.sql import functions as F

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(input_dir)
        .select(
            F.col("path").alias("url"),
            F.col("modificationTime").alias("warc_ts"),
            F.col("content").alias("html"),
            F.lit("").alias("text"),
            F.lit("").alias("lang"),
        )
    )


# --- WARC ------------------------------------------------------------------

_GZIP_MAGIC = b"\x1f\x8b"
_HDR_SPLIT = re.compile(rb"\r?\n\r?\n", re.DOTALL)
_HDR_LINE = re.compile(rb"^([A-Za-z0-9\-]+):[ \t]*(.*?)\r?$", re.MULTILINE)


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress concatenated gzip members (the Common-Crawl WARC layout:
    one member per record). A truncated trailing member yields what it has —
    crawl data is ragged; failures must degrade to fewer records."""
    out = []
    pos = 0
    while pos < len(raw) and raw[pos : pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(raw[pos:]))
        except zlib.error:
            break
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc_records(raw: bytes) -> "list[dict]":
    """WARC/1.0 bytes → [{url, warc_ts, html}] for response records.

    Pure function (the oracle twin of the Spark reader — same relationship
    as kernel/extract.py to spark_kernel.py). Tolerates: gzip member
    concatenation, missing/short Content-Length (falls back to the next
    `WARC/` boundary), an embedded HTTP response header block (stripped),
    and non-response records (skipped).
    """
    if raw[:2] == _GZIP_MAGIC:
        raw = _gunzip_members(raw)
    records: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        start = raw.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = _HDR_SPLIT.search(raw, start)
        if hdr_end is None:
            break
        headers = {
            k.lower(): v
            for k, v in _HDR_LINE.findall(raw[start : hdr_end.start()])
        }
        body_start = hdr_end.end()
        try:
            length = int(headers.get(b"content-length", b""))
            body_end = min(body_start + length, n)
        except ValueError:
            nxt = raw.find(b"\r\n\r\nWARC/", body_start)
            body_end = nxt if nxt >= 0 else n
        body = raw[body_start:body_end]
        pos = body_end
        if headers.get(b"warc-type", b"").lower() != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        # response records embed the HTTP response; payload follows the
        # HTTP header block
        if body[:5] in (b"HTTP/",):
            m = _HDR_SPLIT.search(body)
            if m is not None:
                body = body[m.end() :]
        if url:
            records.append({"url": url, "warc_ts": ts, "html": body})
    return records


def read_pages_warc(spark: SparkSession, input_dir: str) -> DataFrame:
    """WARC archives → pages table.

    binaryFile lists the archives (one task per file — see module scale
    note), then an Arrow mapInPandas parses records; only (url, ts, payload)
    leave the parser, and the pages schema matches the parquet source so
    every downstream stage is identical.
    """
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
        .load(input_dir)
        .select("content")
    )

    def _ts(s: str):
        # a malformed WARC-Date must cost the timestamp, not the task;
        # offset-bearing dates normalize to UTC before dropping tzinfo
        try:
            if not s:
                return None
            t = pd.Timestamp(s)
            if t.tzinfo is not None:
                t = t.tz_convert("UTC").tz_localize(None)
            return t
        except (ValueError, TypeError):
            return None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                for r in parse_warc_records(bytes(blob)):
                    rows.append(
                        {
                            "url": r["url"],
                            "warc_ts": _ts(r["warc_ts"]),
                            "html": r["html"],
                            "text": "",
                            "lang": "",
                        }
                    )
            if rows:
                yield pd.DataFrame(rows, columns=_PAGES_COLS)

    return files.mapInPandas(parse, schema=PAGES_SCHEMA_DDL)


def export_pages_warc(
    pages: DataFrame, out_dir: str, gzip_members: bool = True
) -> DataFrame:
    """Distributed WARC export sink: one archive per Spark partition.

    The write happens INSIDE the tasks (each partition serializes its own
    `part-<pid>-<n>.warc[.gz]` — the classic one-file-per-task Hadoop sink
    shape, no driver materialization); the returned DataFrame is the
    manifest (file, n_records, n_bytes), one row per written archive.
    Round-trips through read_pages_warc byte-exactly. Repartition the input
    to control archive sizes (Common-Crawl convention ~1 GB per member
    file).
    """
    import os
    import uuid


    cols = pages.select("url", "warc_ts", "html")

    def write_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rows = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rows.append(
                    {"url": r.url, "warc_ts": r.warc_ts, "html": bytes(r.html or b"")}
                )
        if not rows:
            return
        suffix = ".warc.gz" if gzip_members else ".warc"
        path = os.path.join(out_dir, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}{suffix}")
        os.makedirs(out_dir, exist_ok=True)
        write_warc(rows, path, gzip_members=gzip_members)
        yield pd.DataFrame(
            {
                "file": [path],
                "n_records": [len(rows)],
                "n_bytes": [os.path.getsize(path)],
            }
        )

    return cols.mapInPandas(
        write_partition, schema="file string, n_records long, n_bytes long"
    )


def write_warc(rows: "list[dict]", path: str, gzip_members: bool = False) -> None:
    """Deterministic WARC writer (test fixture + export sink).

    `rows` carry url / warc_ts / html (the pages columns). Emits WARC/1.0
    response records with an HTTP/1.1 200 header block, optionally one gzip
    member per record (the Common-Crawl layout).
    """
    import gzip as _gzip

    out = []
    for r in rows:
        ts = r["warc_ts"]
        ts_s = (
            ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            if hasattr(ts, "strftime")
            else str(ts or "2024-01-01T00:00:00Z")
        )
        payload = bytes(r["html"] or b"")
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + r["url"].encode("utf-8") + b"\r\n"
            + b"WARC-Date: " + ts_s.encode("ascii") + b"\r\n"
            + b"Content-Length: " + str(len(http)).encode("ascii") + b"\r\n"
            b"\r\n" + http + b"\r\n\r\n"
        )
        out.append(_gzip.compress(rec, 6, mtime=0) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(b"".join(out))
