"""Bucketed-table co-location: the shuffle-free join the 100 TB design rests on.

SURVEY §2.3 / §4.2: at scale, joins between the pages table and the
extracted table (or the control/lineage tables) should NOT reshuffle
petabytes — writing both sides bucketed by the join key lets Spark plan a
SortMergeJoin with ZERO Exchange. This test proves the engine's layout
choice delivers that plan, not just claims it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.kernel.spark_kernel import run_kernel
from pdf_extractor_spark.synth import pages_df

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    pages = pages_df(spark, 400, seed=42, num_partitions=2)
    (
        pages.write.bucketBy(N_BUCKETS, "url").sortBy("url")
        .option("path", str(wh / "pages_b"))  # external table: path overrides
        .mode("overwrite").format("parquet").saveAsTable("pages_b")
    )
    (
        run_kernel(pages).write.bucketBy(N_BUCKETS, "url").sortBy("url")
        .option("path", str(wh / "extracted_b"))
        .mode("overwrite").format("parquet").saveAsTable("extracted_b")
    )
    yield "pages_b", "extracted_b"
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS extracted_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    pages_t, ex_t = bucketed
    # tiny test tables would broadcast; disable that to expose the plan the
    # 100 TB case gets, where NEITHER side fits in memory
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(pages_t)
            .join(spark.table(ex_t), "url")
            .select("url", "lang", "parse_status")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: NO shuffle on either side
        assert joined.count() == 400
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_avoids_shuffle(spark, bucketed):
    _, ex_t = bucketed
    agg = spark.table(ex_t).groupBy("url").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket layout satisfies the distribution
    assert agg.filter(F.col("n") > 1).count() == 0
