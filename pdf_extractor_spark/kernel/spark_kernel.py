"""Arrow mapInPandas wrapper around the extraction kernel.

One `mapInPandas` pass runs the whole per-partition pipeline —
decode → tokenize → classify → serialize — with no intermediate shuffle
(SURVEY.md §4.2 "pipelining"). Batches arrive Arrow-sized
(spark.sql.execution.arrow.maxRecordsPerBatch, kept small because `html`
blobs are large); within a batch the kernel is called per document but all
scoring/sorting inside it is numpy-vectorized, and no row-at-a-time Spark
Python UDF is involved (input_hint: "no per-row Python" = no per-row serde;
Arrow moves whole columns).

Output schema (FIXTURES.md §2):
  url string, extracted_text string,
  span_offsets array<struct<start int, end int, page int, bbox array<float>>>,
  parse_status string, n_bytes long
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pdf_extractor_spark.kernel.extract import extract_document

EXTRACTED_SCHEMA = (
    "url string, extracted_text string, "
    "span_offsets array<struct<start: int, end: int, page: int, bbox: array<float>>>, "
    "parse_status string, truncated boolean, n_bytes long, font_unmapped int"
)

# Columns the kernel needs — select these before mapInPandas so Catalyst
# prunes `text`/`lang`/`warc_ts` out of the parquet scan.
KERNEL_INPUT_COLS = ["url", "html"]


def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (url, html[, charset]) batches → extracted rows.

    The optional `charset` column (WARC sources) is a transport-layer
    decode hint per document; absent or empty means sniff-only."""
    for pdf in batches:
        urls = pdf["url"].tolist()
        payloads = pdf["html"].tolist()
        hints = (
            pdf["charset"].tolist()
            if "charset" in pdf.columns
            else [None] * len(urls)
        )
        texts: list[str] = []
        spans: list[list[tuple]] = []
        statuses: list[str] = []
        truncs: list[bool] = []
        n_bytes: list[int] = []
        unmapped: list[int] = []
        for raw, hint in zip(payloads, hints):
            b = bytes(raw) if raw is not None else None
            res = extract_document(b, hint or None)
            texts.append(res.extracted_text)
            # tuples serialize to Arrow struct fields positionally
            spans.append(
                [(s["start"], s["end"], s["page"], s["bbox"]) for s in res.span_offsets]
            )
            statuses.append(res.parse_status)
            truncs.append(res.truncated)
            n_bytes.append(len(b) if b is not None else 0)
            unmapped.append(res.font_unmapped)
        yield pd.DataFrame(
            {
                "url": urls,
                "extracted_text": texts,
                "span_offsets": spans,
                "parse_status": statuses,
                "truncated": truncs,
                "n_bytes": n_bytes,
                "font_unmapped": unmapped,
            }
        )


def kernel_input(pages_df):
    """Project a pages DataFrame to the kernel's input columns: (url, html)
    plus the optional charset decode-hint column when the source carries
    one (WARC readers). Keeps the parquet scan pruned to exactly these."""
    cols = list(KERNEL_INPUT_COLS)
    if "charset" in pages_df.columns:
        cols.append("charset")
    return pages_df.select(*cols)


def run_kernel(pages_df):
    """Apply the extraction kernel to a pages DataFrame.

    Projects to (url, html[, charset]) first so the parquet scan reads only
    those columns (check: .explain shows ReadSchema with 2 fields).
    """
    return kernel_input(pages_df).mapInPandas(
        extract_batches, schema=EXTRACTED_SCHEMA
    )
