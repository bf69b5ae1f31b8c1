"""Raw-file and WARC sources: same pages schema, byte-identical extraction."""

from __future__ import annotations

import os

from pdf_extractor_spark.kernel import extract_document
from pdf_extractor_spark.kernel.spark_kernel import run_kernel
from pdf_extractor_spark.sources import (
    parse_warc_records,
    read_pages_binary,
    read_pages_warc,
    write_warc,
)
from pdf_extractor_spark.synth import synth_row

SEED = 42


def _synth_rows(n):
    return [synth_row(SEED, i) for i in range(n)]


def test_binary_file_source(spark, tmp_path):
    """Files on disk → pages table → kernel, byte-identical to the oracle."""
    d = tmp_path / "files"
    d.mkdir()
    rows = [r for r in _synth_rows(120) if r["_kind"] in ("html", "pdf")][:40]
    for i, r in enumerate(rows):
        ext = "pdf" if r["_kind"] == "pdf" else "html"
        (d / f"doc_{i:03d}.{ext}").write_bytes(r["html"])

    pages = read_pages_binary(spark, str(d))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {
        os.path.basename(r.url): r.extracted_text for r in run_kernel(pages).collect()
    }
    assert len(got) == len(rows)
    for i, r in enumerate(rows):
        ext = "pdf" if r["_kind"] == "pdf" else "html"
        assert got[f"doc_{i:03d}.{ext}"] == extract_document(r["html"]).extracted_text


def test_warc_roundtrip_plain_and_gzip(spark, tmp_path):
    """pages → WARC (plain + member-gzip) → reader → byte-identical kernel
    output per url, timestamps preserved to the second."""
    d = tmp_path / "warc"
    d.mkdir()
    rows = _synth_rows(80)
    write_warc(rows[:40], str(d / "seg-00000.warc"))
    write_warc(rows[40:], str(d / "seg-00001.warc.gz"), gzip_members=True)

    pages = read_pages_warc(spark, str(d))
    collected = {r.url: r for r in pages.collect()}
    assert len(collected) == 80
    for r in rows:
        got = collected[r["url"]]
        assert bytes(got.html) == r["html"]
        assert got.warc_ts == r["warc_ts"].replace(tzinfo=None, microsecond=0)

    extracted = {r.url: r.extracted_text for r in run_kernel(pages).collect()}
    for r in rows:
        assert extracted[r["url"]] == extract_document(r["html"]).extracted_text


def test_warc_parser_edge_cases():
    html = b"<html><body><p>body text long enough to keep for the test.</p></body></html>"
    http_hdr = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    # record without HTTP block, bad Content-Length (falls back to boundary),
    # plus a non-response record that must be skipped
    raw = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a/1\r\nWARC-Date: 2024-03-04T05:06:07Z\r\n"
        b"Content-Length: oops\r\n\r\n" + html + b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a/2\r\nWARC-Date: 2024-03-04T05:06:08Z\r\n"
        + (b"Content-Length: %d\r\n\r\n" % (len(http_hdr) + len(html)))
        + http_hdr + html + b"\r\n\r\n"
    )
    recs = parse_warc_records(raw)
    assert [r["url"] for r in recs] == ["https://a/1", "https://a/2"]
    assert recs[0]["html"] == html  # boundary fallback
    assert recs[1]["html"] == html  # HTTP header block stripped
    # truncated gzip member: earlier records survive
    import gzip

    member = gzip.compress(raw, mtime=0)
    recs2 = parse_warc_records(member + b"\x1f\x8b\x08TRUNCATED")
    assert [r["url"] for r in recs2] == ["https://a/1", "https://a/2"]


def test_warc_negative_content_length():
    """A negative Content-Length is malformed, not short: the scanner must
    resync at the next `WARC/` boundary instead of busy-looping (a length
    that exactly cancels the header offset lands pos back on the same
    record head) or slicing tail-relative bytes as the body (round-3
    ADVICE, high)."""
    html = b"<html><body><p>good record body, long enough to matter.</p></body></html>"
    bad_hdr = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://t/bad\r\nWARC-Date: 2024-03-04T05:06:07Z\r\n"
    )
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://t/good\r\nWARC-Date: 2024-03-04T05:06:08Z\r\n"
        + (b"Content-Length: %d\r\n\r\n" % len(html)) + html + b"\r\n\r\n"
    )
    for length in (-1, -10**9, -(len(bad_hdr) + len(b"Content-Length: -0\r\n\r\n"))):
        raw = (
            bad_hdr + (b"Content-Length: %d\r\n\r\n" % length)
            + b"bad body\r\n\r\n" + good
        )
        recs = parse_warc_records(raw)
        # malformed record degrades to boundary fallback; good record intact
        assert [r["url"] for r in recs] == ["https://t/bad", "https://t/good"]
        assert recs[0]["html"] == b"bad body"
        assert recs[1]["html"] == html
    # the exact self-cancelling offset from the advice repro: header length
    # negated → body_end == start of this same record. Must terminate.
    hdr = bad_hdr + b"Content-Length: -999\r\n\r\n"
    cancel = len(hdr)
    raw = bad_hdr + (b"Content-Length: -%d\r\n\r\n" % cancel) + good
    recs = parse_warc_records(raw)
    assert recs[-1]["url"] == "https://t/good"


def test_warc_split_reader_skips_hidden_files(spark, tmp_path):
    """The os.walk listing must follow Spark's hidden-file convention
    (skip `_`/`.` basenames) so an orphaned `_tmp-*-attempt*.warc.gz` from
    a hard-killed export task is never double-counted (round-3 ADVICE)."""
    from pdf_extractor_spark.sources import read_pages_warc_split

    d = tmp_path / "warc"
    d.mkdir()
    rows = _synth_rows(30)
    write_warc(rows[:20], str(d / "a.warc.gz"), gzip_members=True)
    # orphaned temp + hidden file carrying the OTHER rows: must be invisible
    write_warc(rows[20:], str(d / "_tmp-part-0-attempt0.warc.gz"), gzip_members=True)
    write_warc(rows[20:], str(d / ".hidden.warc"))

    got = {r.url for r in read_pages_warc_split(spark, str(d), split_bytes=1500).collect()}
    assert got == {r["url"] for r in rows[:20]}


def test_warc_http_charset_hint_beats_meta(spark, tmp_path):
    """When the WARC record's HTTP Content-Type charset disagrees with the
    page's meta tag, the transport header wins (WHATWG precedence below
    the BOM): the latin-1 bytes must decode as cp1252, not the meta's
    claimed utf-8 — and the Spark kernel must agree with the oracle twin
    byte-for-byte (round-3 verdict #8)."""
    body_txt = (
        "<html><head><meta charset=\"utf-8\"></head><body>"
        "<p>Caf\xe9 r\xe9sum\xe9 \xfcber stra\xdfe — body long enough to keep "
        "for extraction in this fixture page.</p></body></html>"
    )
    payload = body_txt.encode("latin-1", "replace")
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\n" + payload
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://t/hinted\r\nWARC-Date: 2024-03-04T05:06:07Z\r\n"
        + (b"Content-Length: %d\r\n\r\n" % len(http)) + http + b"\r\n\r\n"
    )
    # oracle twin: parser surfaces the hint; kernel honors it
    recs = parse_warc_records(rec)
    assert recs[0]["charset"] == "iso-8859-1"
    want = extract_document(recs[0]["html"], recs[0]["charset"]).extracted_text
    assert "Café résumé über straße" in want
    # WITHOUT the hint, the meta tag would (wrongly, per the transport
    # header) force utf-8 and mangle the accents
    unhinted = extract_document(recs[0]["html"]).extracted_text
    assert "Café" not in unhinted

    d = tmp_path / "warc"
    d.mkdir()
    (d / "x.warc").write_bytes(rec)
    pages = read_pages_warc(spark, str(d))
    assert pages.select("charset").collect()[0][0] == "iso-8859-1"
    got = run_kernel(pages).collect()[0].extracted_text
    assert got == want

    from pdf_extractor_spark.sources import read_pages_warc_split

    got_split = run_kernel(read_pages_warc_split(spark, str(d))).collect()[0]
    assert got_split.extracted_text == want


def test_warc_bad_date_and_offset_date(spark, tmp_path):
    """Malformed WARC-Date → null timestamp (not a task failure); an
    offset-bearing date normalizes to UTC."""
    html = b"<html><body><p>enough body text to be a valid record body.</p></body></html>"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://t/bad\r\nWARC-Date: not-a-date\r\n"
        + (b"Content-Length: %d\r\n\r\n" % len(html)) + html + b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://t/offset\r\nWARC-Date: 2024-03-04T10:00:00+05:00\r\n"
        + (b"Content-Length: %d\r\n\r\n" % len(html)) + html + b"\r\n\r\n"
    )
    d = tmp_path / "warc"
    d.mkdir()
    (d / "x.warc").write_bytes(rec)
    rows = {r.url: r for r in read_pages_warc(spark, str(d)).collect()}
    assert rows["https://t/bad"].warc_ts is None
    assert str(rows["https://t/offset"].warc_ts) == "2024-03-04 05:00:00"


def test_warc_export_roundtrip(spark, tmp_path):
    """Distributed export: pages → per-partition WARC archives → reader →
    identical rows; the manifest accounts for every record."""
    from pdf_extractor_spark.sources import export_pages_warc
    from pdf_extractor_spark.synth import pages_df

    out = str(tmp_path / "export")
    pages = pages_df(spark, 150, seed=SEED, num_partitions=3)
    manifest = export_pages_warc(pages, out, gzip_members=True).collect()
    assert sum(m.n_records for m in manifest) == 150
    assert len(manifest) == 3 and all(m.file.endswith(".warc.gz") for m in manifest)

    back = {r.url: bytes(r.html) for r in read_pages_warc(spark, out).collect()}
    orig = {r.url: bytes(r.html) for r in pages.collect()}
    assert back == orig


def test_warc_export_null_timestamp(spark, tmp_path):
    """A null warc_ts (what read_pages_warc yields for malformed WARC-Date)
    must export cleanly — pandas NaT has a strftime attr that raises, so the
    sink needs an isna check, not hasattr (round-2 ADVICE)."""
    from pdf_extractor_spark.sources import export_pages_warc

    payload = b"<html><body><p>null timestamp payload body text here.</p></body></html>"
    df = spark.createDataFrame(
        [("https://t/nat", None, bytearray(payload), "", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).coalesce(1)
    out = str(tmp_path / "natexp")
    manifest = export_pages_warc(df, out).collect()
    assert sum(m.n_records for m in manifest) == 1
    back = read_pages_warc(spark, out).collect()
    assert bytes(back[0].html) == payload
    assert back[0].warc_ts is not None  # NaT fell back to the default date


def test_warc_export_task_retry_no_orphans(spark, tmp_path):
    """Task-commit protocol: an attempt that fails MID-WRITE (after records
    already hit its temp file) must leave no orphan archive — the directory
    holds exactly the manifest's files and the roundtrip is byte-exact.
    Requires the session's maxFailures≥2 (conftest local[4,2])."""
    import glob

    from pdf_extractor_spark.sources import export_pages_warc
    from pdf_extractor_spark.synth import PAGES_SCHEMA_DDL, pages_df

    pages = pages_df(spark, 120, seed=SEED, num_partitions=3)

    def flaky(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
            it = iter(batches)
            first = next(it, None)
            if first is not None:
                yield first  # some rows reach the sink's temp file first
            raise RuntimeError("injected attempt-0 failure")
        yield from batches

    out = str(tmp_path / "retry_export")
    manifest = export_pages_warc(
        pages.mapInPandas(flaky, schema=PAGES_SCHEMA_DDL), out, gzip_members=True
    ).collect()
    assert sum(m.n_records for m in manifest) == 120

    on_disk = sorted(glob.glob(os.path.join(out, "*")))
    assert on_disk == sorted(m.file for m in manifest)  # no orphans, no temps

    back = {r.url: bytes(r.html) for r in read_pages_warc(spark, out).collect()}
    orig = {r.url: bytes(r.html) for r in pages.collect()}
    assert back == orig  # a double-counted orphan would add duplicate urls


def test_warc_streaming_member_parse_bounded_buffer(monkeypatch):
    """Multi-member archives far larger than the decompression chunk parse
    byte-identically, including a record whose gzip member is split into
    many chunks and records spanning member boundaries."""
    import gzip

    from pdf_extractor_spark import sources as src

    monkeypatch.setattr(src, "WARC_CHUNK_BYTES", 256)  # force many refills

    rows = [
        {
            "url": f"https://big/{i}",
            "warc_ts": "2024-05-06T07:08:09Z",
            # payloads 10-40 KB >> the 256-byte chunk
            "html": bytes([65 + (i + j) % 26 for j in range(10_000 + i * 3_000)]),
        }
        for i in range(10)
    ]
    # member-per-record archive (Common-Crawl layout)
    member_gz = b"".join(
        gzip.compress(
            src.encode_warc_record(r["url"], r["warc_ts"], r["html"]), 6, mtime=0
        )
        for r in rows
    )
    got = src.parse_warc_records(member_gz)
    assert [r["url"] for r in got] == [r["url"] for r in rows]
    assert all(g["html"] == r["html"] for g, r in zip(got, rows))

    # records spanning member boundaries: one gzip stream chopped into
    # arbitrary members mid-record
    plain = b"".join(src.encode_warc_record(r["url"], r["warc_ts"], r["html"]) for r in rows)
    cuts = [0, 5_000, 12_345, 50_000, 123_456, len(plain)]
    chopped = b"".join(
        gzip.compress(plain[a:b], 6, mtime=0) for a, b in zip(cuts, cuts[1:]) if b > a
    )
    got2 = src.parse_warc_records(chopped)
    assert [r["url"] for r in got2] == [r["url"] for r in rows]
    assert all(g["html"] == r["html"] for g, r in zip(got2, rows))

    # corrupt trailing member: earlier records survive (ragged-data policy)
    got3 = src.parse_warc_records(member_gz + b"\x1f\x8b\x08GARBAGE")
    assert [r["url"] for r in got3] == [r["url"] for r in rows]


def test_warc_split_reader_matches_unsplit(spark, tmp_path):
    """Splittable reader: tiny byte ranges (boundaries landing mid-member
    everywhere) must produce exactly the unsplit rows — every member owned
    by exactly one range, none dropped, none duplicated."""
    from pdf_extractor_spark.sources import read_pages_warc_split

    d = tmp_path / "warc"
    d.mkdir()
    rows = _synth_rows(150)
    write_warc(rows[:70], str(d / "a.warc.gz"), gzip_members=True)
    write_warc(rows[70:120], str(d / "b.warc.gz"), gzip_members=True)
    # plain (non-gzip) archive: not byte-splittable → one whole-file range
    write_warc(rows[120:], str(d / "c.warc"))

    got = {
        r.url: (bytes(r.html), r.warc_ts)
        for r in read_pages_warc_split(spark, str(d), split_bytes=1500).collect()
    }
    assert len(got) == 150
    for r in rows:
        html, ts = got[r["url"]]
        assert html == r["html"]
        assert ts == r["warc_ts"].replace(tzinfo=None, microsecond=0)


def test_warc_range_ownership_exact(tmp_path):
    """Pure-Python grid check: for ANY split size, concatenating per-range
    records over a partition of [0, size) equals the whole-archive parse —
    the exactly-once ownership invariant of the splittable reader."""
    import os

    from pdf_extractor_spark.sources import _iter_range_records

    rows = _synth_rows(60)
    p = str(tmp_path / "grid.warc.gz")
    write_warc(rows, p, gzip_members=True)
    size = os.path.getsize(p)
    want = [r["url"] for r in parse_warc_records(open(p, "rb").read())]
    assert len(want) == 60
    for sb in (512, 1000, 7777, size):
        urls = []
        for off in range(0, size, sb):
            urls.extend(
                r["url"] for r in _iter_range_records(p, off, min(off + sb, size))
            )
        assert urls == want, f"split_bytes={sb}"


def test_incremental_scan_equals_oneshot_property():
    """Property: feeding plain WARC bytes to the incremental scanner in
    ARBITRARY chunk sizes (flushing complete records each step, final scan
    at the end) yields exactly the one-shot parse — the invariant every
    reader (member chains, plain files, streaming) rests on."""
    from hypothesis import given, settings, strategies as st

    from pdf_extractor_spark.sources import _scan_records, encode_warc_record

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.binary(max_size=600), min_size=1, max_size=8),
        st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=40),
    )
    def check(payloads, cuts):
        raw = b"".join(
            encode_warc_record(f"https://inc/{i}", "2024-01-02T03:04:05Z", p)
            for i, p in enumerate(payloads)
        )
        want, _ = _scan_records(raw, 0, final=True)

        got = []
        buf = b""
        pos = 0
        ci = 0
        while pos < len(raw):
            step = cuts[ci % len(cuts)]
            ci += 1
            buf += raw[pos : pos + step]
            pos += step
            records, consumed = _scan_records(buf, 0, final=False)
            got.extend(records)
            if consumed:
                buf = buf[consumed:]
        records, _ = _scan_records(buf, 0, final=True)
        got.extend(records)

        assert [(r["url"], r["html"]) for r in got] == [
            (r["url"], r["html"]) for r in want
        ]

    check()


def test_warc_split_ownership_property(tmp_path):
    """Property: for random payload sizes and random split grids, per-range
    parsing over a partition of the archive equals the whole-archive parse
    exactly (ownership exactly-once, order preserved)."""
    import os

    from hypothesis import given, settings, strategies as st

    from pdf_extractor_spark.sources import _iter_range_records

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=4000), min_size=2, max_size=12),
        st.integers(min_value=300, max_value=50_000),
    )
    def check(sizes, split_bytes):
        rows = [
            {
                "url": f"https://p/{i}",
                "warc_ts": "2024-02-03T04:05:06Z",
                "html": bytes([(i * 7 + j) % 251 for j in range(n)]),
            }
            for i, n in enumerate(sizes)
        ]
        p = str(tmp_path / "prop.warc.gz")
        write_warc(rows, p, gzip_members=True)
        size = os.path.getsize(p)
        want = [(r["url"], r["html"]) for r in parse_warc_records(open(p, "rb").read())]
        got = []
        for off in range(0, size, split_bytes):
            got.extend(
                (r["url"], r["html"])
                for r in _iter_range_records(p, off, min(off + split_bytes, size))
            )
        assert got == want

    check()


def test_warc_roundtrip_property(tmp_path):
    """Arbitrary payload bytes — including ones embedding 'WARC/' markers
    and \\r\\n\\r\\n separators — round-trip exactly: Content-Length framing
    must win over any content-based heuristic."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.binary(max_size=512).map(
                lambda b: b + b"\r\n\r\nWARC/1.0\r\n" if len(b) % 7 == 0 else b
            ),
            min_size=1,
            max_size=5,
        ),
        st.booleans(),
    )
    def roundtrip(payloads, gz):
        import datetime

        rows = [
            {
                "url": f"https://h/{i}",
                "warc_ts": datetime.datetime(2024, 1, 1 + i % 27),
                "html": p,
            }
            for i, p in enumerate(payloads)
        ]
        path = str(tmp_path / ("p.warc.gz" if gz else "p.warc"))
        write_warc(rows, path, gzip_members=gz)
        recs = parse_warc_records(open(path, "rb").read())
        assert [r["url"] for r in recs] == [r["url"] for r in rows]
        for got, want in zip(recs, rows):
            assert got["html"] == want["html"]

    roundtrip()


def test_warc_job_end_to_end(spark, tmp_path):
    """The full extraction job runs off --input-warc semantics: WARC →
    kernel → partitioned output + control commit."""
    from pdf_extractor_spark.pipeline import run_extraction

    d = tmp_path / "warc"
    d.mkdir()
    rows = _synth_rows(60)
    write_warc(rows, str(d / "seg.warc.gz"), gzip_members=True)
    pages = read_pages_warc(spark, str(d))
    stats = run_extraction(
        spark, pages, str(tmp_path / "out"), str(tmp_path / "ctl"), n_buckets=8
    )
    assert stats.docs_processed == 60
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.select("url").distinct().count() == 60


def test_warc_scanner_mutation_fuzz_bounded():
    """Byte-flip mutation fuzz over a realistic multi-record archive
    (plain + member-gzip): every mutation must scan to completion in
    bounded time without raising — the scanner's contract is fewer/
    degraded records, never a wedged task (the round-3 negative-length
    busy-loop is this class)."""
    import datetime as dt
    import time

    from pdf_extractor_spark.sources import parse_warc_records

    rows = [
        {
            "url": "https://m/%d" % i,
            "warc_ts": dt.datetime(2024, 3, 4, 5, 6, i),
            "html": (b"<html><p>record %d body text</p></html>" % i) * 3,
        }
        for i in range(6)
    ]
    from pdf_extractor_spark.sources import encode_warc_record

    for gz in (False, True):
        raw = b"".join(
            encode_warc_record(r["url"], r["warc_ts"], r["html"], gz) for r in rows
        )
        stride = max(1, len(raw) // 60)  # ~60 flips across the archive
        for off in range(3, len(raw), stride):
            mutated = (
                bytes(raw[:off]) + bytes([raw[off] ^ 0xA5]) + bytes(raw[off + 1 :])
            )
            t0 = time.perf_counter()
            recs = parse_warc_records(mutated)
            dt_s = time.perf_counter() - t0
            assert dt_s < 5.0, (gz, off, dt_s)
            assert len(recs) <= len(rows) + 1  # never invents extra records
            for r in recs:
                assert isinstance(r["url"], str)
