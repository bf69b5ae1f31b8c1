"""End-to-end extraction job: scan → resume anti-join → salted repartition →
Arrow kernel → partitioned write → control-table commit.

The Spark-first restatement of the reference's main loop (reference:
cli.py:105-119 — sequential per-document processing with a per-doc resume
check) as one declarative plan:

    pages
      |> withColumn(partition_id = pmod(xxhash64(url), n_buckets))
      |> LEFT ANTI JOIN broadcast(committed partitions)          # resume, J3
      |> repartition(shuffle_n, partition_id, salt)              # skew: salt
      |> mapInPandas(extract_kernel)                             # D1/D2
      |> write partitionBy(partition_id), dynamic overwrite      # S6
      ;  control <- per-partition metrics appended after success # T1/T2

Scale notes (100 TB / 1000 executors):
  - the anti-join build side is ≤ n_buckets rows → broadcast, no shuffle of
    the big side beyond the one explicit repartition;
  - salt spreads heavy hosts (zipf head) across `salt_factor` tasks so no
    single task owns a hot partition; AQE skew handling stays on as backstop;
  - the kernel stage reads only (url, html) — column pruning keeps the scan
    narrow (the `text` column, 50% of table bytes, is never read);
  - dynamic partition overwrite makes reruns idempotent per partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark import control as ctl
from pdf_extractor_spark.kernel.spark_kernel import extract_batches, EXTRACTED_SCHEMA

DEFAULT_N_BUCKETS = 64
DEFAULT_SALT_FACTOR = 8


def with_partition_id(df: DataFrame, n_buckets: int) -> DataFrame:
    """Stable url-hash bucketing: partition_id = pmod(xxhash64(url), n)."""
    return df.withColumn(
        "partition_id", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


@dataclass
class RunStats:
    partitions_committed: int
    docs_processed: int
    bytes_parsed: int
    parse_failures: int


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    control_dir: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt_factor: int = DEFAULT_SALT_FACTOR,
    shuffle_partitions: int | None = None,
) -> RunStats:
    """Run (or resume) the extraction job. Returns lineage totals for this run."""
    shuffle_n = shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    pages_b = with_partition_id(pages, n_buckets)

    committed = ctl.committed_partitions(spark, control_dir)
    todo = pages_b.join(F.broadcast(committed), "partition_id", "left_anti")

    # Salted spread: partition_id alone would map each bucket to one task;
    # a hot host (zipf head) would serialize. salt = url-hash mod k fans each
    # bucket across k tasks; the partitioned WRITE regroups by directory, so
    # co-location is preserved on disk, not in the shuffle.
    salted = todo.repartition(
        shuffle_n,
        "partition_id",
        F.pmod(F.xxhash64("url"), F.lit(salt_factor)).alias("salt"),
    )

    extracted = (
        salted.select("partition_id", "url", "html")
        .mapInPandas(_kernel_with_pid, schema="partition_id int, " + EXTRACTED_SCHEMA)
    )

    (
        extracted.write.mode("overwrite")
        .partitionBy("partition_id")
        .parquet(out_dir)
    )

    # Lineage from the files just written (read-back = what actually
    # committed). Newly-written partitions = on-disk partitions minus the
    # already-committed set; the read-back projects only the partition
    # column + two small metric columns, never the text payload.
    try:
        written = (
            spark.read.parquet(out_dir)
            .join(F.broadcast(committed), "partition_id", "left_anti")
        )
    except Exception:  # nothing ever written (empty input) → nothing to commit
        return RunStats(0, 0, 0, 0)
    metrics = written.groupBy("partition_id").agg(
        F.count("*").alias("docs_processed"),
        F.sum("n_bytes").alias("bytes_parsed"),
        F.sum(F.when(F.col("parse_status") == "failed", 1).otherwise(0)).alias(
            "parse_failures"
        ),
    )
    if metrics.isEmpty():
        return RunStats(0, 0, 0, 0)
    ctl.append_commits(metrics, control_dir)

    tot = (
        metrics.agg(
            F.count("*").alias("p"),
            F.sum("docs_processed").alias("d"),
            F.sum("bytes_parsed").alias("b"),
            F.sum("parse_failures").alias("f"),
        ).collect()[0]
    )
    return RunStats(int(tot.p), int(tot.d or 0), int(tot.b or 0), int(tot.f or 0))


def _kernel_with_pid(batches):
    """Kernel wrapper that carries partition_id through the Arrow boundary."""
    for pdf in batches:
        pids = pdf["partition_id"]
        out = next(extract_batches(iter([pdf[["url", "html"]]])))
        out.insert(0, "partition_id", pids.to_numpy())
        yield out
