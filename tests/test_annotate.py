"""S7 annotation-sink tests: highlight records vs the oracle extractor,
seen-set dedup, X15 sub-bbox interpolation, partitioned sink layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.annotate import (
    span_annotations,
    term_highlights,
    write_span_annotations,
)
from pdf_extractor_spark.kernel import extract_document
from pdf_extractor_spark.kernel.spark_kernel import run_kernel
from pdf_extractor_spark.synth import pages_df, synth_row

SEED = 42
N_DOCS = 200


def _oracle_annotations(raw: bytes):
    """Expected highlight records for one doc: spans in order, duplicate
    snippets kept only at first occurrence (reference pdf_service.py:101-110
    seen-set)."""
    res = extract_document(raw)
    seen = set()
    out = []
    for seq, s in enumerate(res.span_offsets):
        snippet = res.extracted_text[s["start"] : s["end"]]
        if snippet in seen:
            continue
        seen.add(snippet)
        out.append((seq, s["page"], s["bbox"], snippet))
    return out


def test_annotations_match_oracle(spark):
    pages = pages_df(spark, N_DOCS, seed=SEED, num_partitions=2)
    ann = span_annotations(run_kernel(pages))
    got: dict[str, list] = {}
    for r in ann.collect():
        bbox = None if r.x0 is None else [r.x0, r.y0, r.x1, r.y1]
        got.setdefault(r.url, []).append((r.seq, r.page, bbox, r.snippet))
    n_checked = n_spans = 0
    for i in range(N_DOCS):
        sr = synth_row(SEED, i)
        want = _oracle_annotations(sr["html"])
        rows = sorted(got.get(sr["url"], []))
        assert len(rows) == len(want), sr["url"]
        for (gseq, gpage, gbbox, gsnip), (wseq, wpage, wbbox, wsnip) in zip(rows, want):
            assert (gseq, gpage, gsnip) == (wseq, wpage, wsnip), sr["url"]
            if wbbox is None:
                assert gbbox is None
            else:
                assert gbbox == pytest.approx(list(wbbox), abs=1e-4)
        n_checked += 1
        n_spans += len(want)
    assert n_checked == N_DOCS and n_spans > 100


def test_dedup_keeps_first_occurrence(spark):
    """A document with a repeated block must yield ONE highlight for the
    repeated text, at its first span position."""
    html = (
        b"<html><body>"
        b"<p>unique paragraph with plenty of characters to keep zzz</p>"
        b"<p>repeated block of content with plenty of characters here</p>"
        b"<p>repeated block of content with plenty of characters here</p>"
        b"</body></html>"
    )
    df = spark.createDataFrame([("u://1", bytearray(html))], "url string, html binary")
    ann = span_annotations(run_kernel(df)).collect()
    snippets = [r.snippet for r in ann]
    assert len(snippets) == len(set(snippets)) == 2
    rep = [r for r in ann if r.snippet.startswith("repeated")][0]
    assert rep.seq == 1  # first occurrence, not the later duplicate


def test_term_highlight_interpolation(spark):
    """X15: hand-computed sub-bbox for a term inside a PDF span.

    Kernel geometry: runs start at x=72 with 0.5em advance at font size 12
    → width 6.0/char. 'World' starts at char 6 of 'Hello World line' →
    tx0 = 72 + 6*6 = 108, tx1 = 108 + 5*6 = 138.
    """
    pdf = (
        b"%PDF-1.4\n"
        b"stream\n"
        b"BT /F1 12 Tf 72 700 Td (Hello World line) Tj ET\n"
        b"endstream\n"
    )
    df = spark.createDataFrame([("u://p", bytearray(pdf))], "url string, html binary")
    ann = span_annotations(run_kernel(df))
    hits = term_highlights(ann, ["World"]).collect()
    assert len(hits) == 1
    h = hits[0]
    assert (h.char_start, h.char_end) == (6, 11)
    # span bbox: x0=72, x1=72+16*6=168, width=96 over 16 chars = 6/char
    assert h.tx0 == pytest.approx(72 + 6 * 6.0, abs=1e-4)
    assert h.tx1 == pytest.approx(72 + 11 * 6.0, abs=1e-4)
    assert h.ty0 == pytest.approx(700.0, abs=1e-4)
    assert h.ty1 == pytest.approx(712.0, abs=1e-4)


def test_html_term_highlight_has_offsets_no_bbox(spark):
    html = b"<html><body><p>findable token inside a long enough paragraph</p></body></html>"
    df = spark.createDataFrame([("u://h", bytearray(html))], "url string, html binary")
    hits = term_highlights(span_annotations(run_kernel(df)), ["token"]).collect()
    assert len(hits) == 1
    assert hits[0].char_start == 9
    assert hits[0].tx0 is None and hits[0].ty0 is None


def test_partitioned_sink_layout(spark, tmp_path):
    """Sink mirrors the extraction output's partition_id directory layout."""
    import os

    from pdf_extractor_spark.pipeline import run_extraction

    out_dir = str(tmp_path / "out")
    ann_dir = str(tmp_path / "ann")
    run_extraction(
        spark,
        pages_df(spark, 300, seed=SEED, num_partitions=2),
        out_dir,
        str(tmp_path / "ctl"),
        n_buckets=8,
    )
    write_span_annotations(spark, out_dir, ann_dir)
    out_parts = {d for d in os.listdir(out_dir) if d.startswith("partition_id=")}
    ann_parts = {d for d in os.listdir(ann_dir) if d.startswith("partition_id=")}
    assert ann_parts and ann_parts <= out_parts
    ann = spark.read.parquet(ann_dir)
    # co-location key intact and every annotated url exists in the output
    assert ann.filter(F.col("url").isNull()).count() == 0
    joined = ann.select("url").distinct().join(
        spark.read.parquet(out_dir).select("url").distinct(), "url", "left_anti"
    )
    assert joined.count() == 0
