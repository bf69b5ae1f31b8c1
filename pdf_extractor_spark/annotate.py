"""S7 debug/annotation sink: per-span highlight records + term sub-bbox.

The reference renders highlight+label overlays straight into an output PDF
(reference: services/pdf_service.py:76-192 — for each extracted field, find
its span, dedup repeated (key,value) pairs via a seen-set at :101-110, draw
a rect at the span bbox). A 10^12-doc engine can't ship a renderer to every
executor, so the Spark-first restatement is a DETERMINISTIC HIGHLIGHT TABLE:
one row per kept span — (url, seq, page, bbox, snippet) — that any offline
renderer can draw from, written as a partitioned parquet sink next to the
extraction output. Everything is JVM-side column work (posexplode + window
dedup + substring); the kernel is never re-run.

X15 (reference: pdf_service.py:56-69) lives here too: when a search term
matches INSIDE a span, its sub-bbox is interpolated proportionally —
x0 + idx*(width/len) — as pure column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def span_annotations(extracted: DataFrame) -> DataFrame:
    """Explode an extracted table into per-span highlight records.

    Output: (url, seq, page, x0, y0, x1, y1, snippet) — page/bbox are null
    for HTML spans (offsets-only highlights), set for PDF spans. Repeated
    identical snippets within a document are annotated ONCE, keeping the
    first occurrence in span order — the reference's seen-set dedup
    (pdf_service.py:101-110), W2-shaped as row_number()==1 over
    (url, snippet) ordered by seq. One explode + one window shuffle on url;
    at scale the input is already partitioned by url-hash so the window
    shuffle is AQE-coalesced and skew-free.
    """
    carry = ["partition_id"] if "partition_id" in extracted.columns else []
    spans = extracted.select(
        *carry,
        "url",
        "extracted_text",
        F.posexplode("span_offsets").alias("seq", "span"),
    ).select(
        *carry,
        "url",
        "seq",
        F.col("span.page").alias("page"),
        F.col("span.bbox").getItem(0).alias("x0"),
        F.col("span.bbox").getItem(1).alias("y0"),
        F.col("span.bbox").getItem(2).alias("x1"),
        F.col("span.bbox").getItem(3).alias("y1"),
        F.substring(
            "extracted_text",
            F.col("span.start") + 1,
            F.col("span.end") - F.col("span.start"),
        ).alias("snippet"),
    )
    first = W.partitionBy("url", "snippet").orderBy("seq")
    return (
        spans.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def term_highlights(annotations: DataFrame, terms: list[str]) -> DataFrame:
    """X15: sub-span highlight boxes for search terms found inside spans.

    For each (span, term) where the term occurs in the snippet, emit the
    term's interpolated bbox: the reference estimates a partial match's box
    by proportional char width — x0 + idx*(width/len) (pdf_service.py:
    56-69). The term side is a tiny broadcast dim; the containment probe is
    a broadcast nested-loop theta join (J5 shape), and the interpolation is
    pure column arithmetic — no UDF, no kernel re-run. Spans without
    geometry (HTML) interpolate over character offsets instead: tx0/tx1
    are then fractions of the span width left null.
    """
    spark = annotations.sparkSession
    terms_df = spark.createDataFrame([(t,) for t in terms], ["term"])
    idx = F.instr("snippet", F.col("term")) - 1  # 0-based; -1+1=0 when absent
    span_len = F.length("snippet")
    width = F.col("x1") - F.col("x0")
    frac0 = idx / span_len
    frac1 = (idx + F.length("term")) / span_len
    return (
        annotations.join(F.broadcast(terms_df), F.instr("snippet", F.col("term")) > 0)
        .select(
            "url",
            "seq",
            "page",
            "term",
            idx.alias("char_start"),
            (idx + F.length("term")).alias("char_end"),
            (F.col("x0") + frac0 * width).alias("tx0"),
            (F.col("x0") + frac1 * width).alias("tx1"),
            F.col("y0").alias("ty0"),
            F.col("y1").alias("ty1"),
        )
    )


from pdf_extractor_spark.operators.registry import register  # noqa: E402


@register(
    "s7_span_annotations",
    doc="S7 annotation sink as a query (rows-only: the Arrow kernel feeding "
    "it is not SQL-expressible; the value gate is tests/test_annotate.py, "
    "which checks every highlight record against the pure-Python oracle "
    "extractor's spans, including the seen-set dedup and the X15 sub-bbox "
    "interpolation). Per-span highlight records (url, seq, page, bbox, "
    "snippet) from 150 synthesized pages — the offline-renderer feed "
    "mirroring reference pdf_service.py:76-192.",
)
def s7_span_annotations_query(spark, sf_dir):
    from pdf_extractor_spark.kernel.spark_kernel import run_kernel
    from pdf_extractor_spark.synth import pages_df

    return span_annotations(run_kernel(pages_df(spark, 150, seed=42)))


def write_span_annotations(
    spark: SparkSession, extracted_dir: str, out_dir: str
) -> None:
    """Partitioned highlight-table sink mirroring the extraction layout.

    Reads the extraction output (already partitioned by partition_id),
    derives the highlight records, and writes them partitioned the same way
    so a renderer fetching one url-hash bucket touches one directory on
    both tables — co-located, no shuffle beyond the dedup window.
    """
    extracted = spark.read.parquet(extracted_dir)
    ann = span_annotations(extracted)
    if "partition_id" in ann.columns:
        ann.write.mode("overwrite").partitionBy("partition_id").parquet(out_dir)
    else:
        ann.write.mode("overwrite").parquet(out_dir)
