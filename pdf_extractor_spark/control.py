"""Control table: per-partition checkpoint / lineage (FIXTURES.md §3).

Generalizes the reference's resume check — "skip this document if its
outputs already exist and are non-empty" (reference: cli.py:45-51,
finetune_commands/excel2training.py:261-264) — to PARTITION granularity,
which is the unit that matters at 10^12 docs: a killed job resumes by
anti-joining the input against committed partition ids instead of stat-ing
a trillion files.

Schema: partition_id int, status string, docs_processed long,
bytes_parsed long, parse_failures long, font_unmapped long,
committed_at timestamp.

Commit protocol (exactly-once per partition):
  1. output written first (dynamic partition overwrite → idempotent);
  2. control rows appended only after the write action succeeds;
  3. a crash between 1 and 2 leaves the partition uncommitted → the rerun
     overwrites it in place. No partial state is ever visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("docs_processed", T.LongType(), True),
        T.StructField("bytes_parsed", T.LongType(), True),
        T.StructField("parse_failures", T.LongType(), True),
        # unmapped PDF font codes (degraded to U+FFFD) — fidelity lineage,
        # distinct from parse_failures: the doc still extracts
        T.StructField("font_unmapped", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
        # bucketing under which the partition ids were computed: a control
        # dir reused with a DIFFERENT n_buckets silently mismaps committed
        # work (round-1 ADVICE) — recorded so resume can fail fast instead
        T.StructField("n_buckets", T.IntegerType(), True),
    ]
)

STATUS_COMMITTED = "committed"


class BucketingMismatchError(RuntimeError):
    """Control dir was written under a different n_buckets than the run's."""


def read_control(spark: SparkSession, control_dir: str) -> DataFrame:
    """Control table, or an empty frame if no run has committed yet."""
    try:
        return spark.read.schema(CONTROL_SCHEMA).parquet(control_dir)
    except Exception:  # AnalysisException: path does not exist
        return spark.createDataFrame([], CONTROL_SCHEMA)


def committed_partitions(
    spark: SparkSession, control_dir: str, n_buckets: int | None = None
) -> DataFrame:
    """Distinct committed partition ids — the anti-join build side (J3).

    Small by construction (≤ n_buckets rows) → always broadcast. When the
    caller's `n_buckets` is given, rows committed under a DIFFERENT
    bucketing raise BucketingMismatchError: their partition ids were
    computed with another modulus, so honoring them would skip uncommitted
    work (or re-run committed work) undetectably. Rows with a null
    n_buckets (pre-upgrade control dirs) are accepted as-is.
    """
    ctl = read_control(spark, control_dir).filter(F.col("status") == STATUS_COMMITTED)
    if n_buckets is not None:
        # ≤ a handful of distinct values — driver-side check is O(1)
        stamped = [
            r.n_buckets
            for r in ctl.select("n_buckets").distinct().collect()
            if r.n_buckets is not None
        ]
        bad = [b for b in stamped if b != n_buckets]
        if bad:
            raise BucketingMismatchError(
                f"control dir {control_dir} was committed with n_buckets="
                f"{sorted(set(bad))}, current run uses {n_buckets}; refusing "
                "to resume with a mismatched bucketing"
            )
    return ctl.select("partition_id").distinct()


def append_commits_rows(rows, control_dir: str, n_buckets: int | None = None) -> None:
    """Append committed rows (one per partition) with lineage metrics.

    `rows` is a driver-side list (≤ n_buckets entries, already collected) of
    objects with partition_id / docs_processed / bytes_parsed /
    parse_failures. Written directly with pyarrow — a Spark job for a ≤64-row
    append costs ~2 s of scheduler latency per run, which at bench scale is
    pure fixed overhead. The file layout stays spark.read.parquet-compatible;
    on a real cluster this append targets an Iceberg control table instead.
    """
    import datetime as _dt
    import os
    import re as _re
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    # pyarrow writes through the LOCAL filesystem; a remote control_dir
    # (hdfs://, s3a://, …) must go through Spark's Hadoop FS layer or the
    # commit lands on the driver's disk and resume silently re-runs
    # everything. file:// and bare paths stay on the fast local path.
    scheme_m = _re.match(r"^[a-z0-9+.-]+://", control_dir, _re.IGNORECASE)
    if scheme_m and not control_dir.lower().startswith("file://"):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        (
            spark.createDataFrame(
                [
                    (
                        int(r.partition_id),
                        STATUS_COMMITTED,
                        int(r.docs_processed),
                        int(r.bytes_parsed or 0),
                        int(r.parse_failures or 0),
                        int(getattr(r, "font_unmapped", 0) or 0),
                        _dt.datetime.now(_dt.timezone.utc),
                        n_buckets,
                    )
                    for r in rows
                ],
                CONTROL_SCHEMA,
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(control_dir)
        )
        return

    now = _dt.datetime.now(_dt.timezone.utc)
    table = pa.table(
        {
            "partition_id": pa.array([int(r.partition_id) for r in rows], pa.int32()),
            "status": pa.array([STATUS_COMMITTED] * len(rows), pa.string()),
            "docs_processed": pa.array([int(r.docs_processed) for r in rows], pa.int64()),
            "bytes_parsed": pa.array([int(r.bytes_parsed or 0) for r in rows], pa.int64()),
            "parse_failures": pa.array([int(r.parse_failures or 0) for r in rows], pa.int64()),
            "font_unmapped": pa.array(
                [int(getattr(r, "font_unmapped", 0) or 0) for r in rows], pa.int64()
            ),
            "committed_at": pa.array([now] * len(rows), pa.timestamp("us", tz="UTC")),
            "n_buckets": pa.array([n_buckets] * len(rows), pa.int32()),
        }
    )
    os.makedirs(control_dir, exist_ok=True)
    pq.write_table(table, os.path.join(control_dir, f"commit-{uuid.uuid4().hex}.parquet"))
