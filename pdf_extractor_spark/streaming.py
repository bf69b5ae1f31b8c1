"""Structured Streaming surface: incremental extraction + event-time windows.

The reference is batch-only but contractually incremental — "skip documents
whose outputs already exist" (reference: cli.py:45-51) and in-run dedup
before an at-least-once sink (reference: sync_to_onedrive.py:269-291,
369-371). SURVEY.md §2.9 maps those onto two Spark-native forms:

  T1  resume-without-recompute:  `readStream` over the pages table +
      `Trigger.AvailableNow` + `checkpointLocation`. Spark's file-source
      log replaces the control table at per-FILE granularity: a restarted
      query processes only files not yet committed to the checkpoint. The
      batch pipeline (pipeline.py) remains the per-PARTITION variant; both
      are exercised by tests/test_streaming.py.

  T5  event-time windows + watermark: tumbling/sliding aggregation with
      late-data handling — a Spark-native extension (absent in the
      reference), same `F.window` expression as the batch op
      t5_tumbling_window so batch and stream stay semantically identical.

At 100 TB both run unchanged: AvailableNow drains the backlog in bounded
increments (maxFilesPerTrigger) without a monolithic job, and the
checkpoint makes every increment exactly-once into the parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.kernel.spark_kernel import (
    EXTRACTED_SCHEMA,
    extract_batches,
    kernel_input,
)

from pdf_extractor_spark.synth import PAGES_SCHEMA_DDL as PAGES_DDL


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental extraction: new pages files → kernel → parquet, exactly once.

    Returns the started StreamingQuery (AvailableNow: drains what exists,
    then stops). Re-running after new files land processes ONLY the new
    files — the streaming analog of the control-table anti-join (J3/T1).
    """
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)

    extracted = kernel_input(pages).mapInPandas(
        extract_batches, schema=EXTRACTED_SCHEMA
    )

    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _sink_has_data_files(sess: SparkSession, path: str) -> bool:
    """True iff `path` contains visible (non-underscore, non-hidden) files —
    checked through the Hadoop FS API so it works on any scheme the sink
    writes to, not just the local FS."""
    jvm = sess._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sess._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            return True
    return False


_BINARYFILE_DDL = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_extract_warc(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """T1 for WARC ingestion: archives landing in `input_dir` are parsed
    (bounded-memory member reader) and extracted EXACTLY ONCE — the
    file-source checkpoint log tracks processed archives, so a crawl
    segment can be drained incrementally as files arrive, the streaming
    analog of read_pages_warc → run_extraction's resume. AvailableNow:
    drains what exists, then stops; rerunning with the same checkpoint
    processes only new archives.
    """
    from pdf_extractor_spark.sources import (
        WARC_PAGES_SCHEMA_DDL,
        _pages_frames,
        iter_warc_records,
    )

    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_DDL)
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(input_dir).select("content")

    def parse(batches):
        # same bounded-frame record parsing as the batch WARC readers
        for pdf in batches:
            for blob in pdf["content"]:
                yield from _pages_frames(iter_warc_records(bytes(blob)))

    pages = files.mapInPandas(parse, schema=WARC_PAGES_SCHEMA_DDL)
    extracted = kernel_input(pages).mapInPandas(
        extract_batches, schema=EXTRACTED_SCHEMA
    )
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_extract_merge(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """T2: at-least-once upstream → exactly-once-per-url sink via
    foreachBatch dedup-merge.

    The reference guards its at-least-once Excel append with in-run seen
    sets (reference: sync_to_onedrive.py:269-291,369-371). The Spark form
    is MERGE INTO on url; without Iceberg in-sandbox, foreachBatch performs
    the same merge against a parquet dir: dropDuplicates within the batch,
    anti-join against the existing output's urls, append the remainder.
    Re-delivered documents (duplicate files, restarted checkpoints) can
    never produce duplicate urls in the sink. On a real deployment the body
    of merge_batch is one `MERGE INTO out USING batch ON url WHEN NOT
    MATCHED THEN INSERT` — same semantics, and the anti-join's full scan of
    existing urls becomes an index-backed merge.
    """
    reader = spark.readStream.schema(PAGES_DDL)
    pages = reader.parquet(input_dir)
    extracted = kernel_input(pages).mapInPandas(
        extract_batches, schema=EXTRACTED_SCHEMA
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        batch = batch_df.dropDuplicates(["url"])
        # Explicit sink-state check instead of sniffing read exceptions
        # (round-2 ADVICE + round-3 review): an ABSENT or EMPTY sink has no
        # urls to dedup against — skip the anti-join (exception-based
        # handling wedged here: an empty-but-existing dir raises
        # UNABLE_TO_INFER_SCHEMA forever, so the first batch could never
        # commit). A sink that HAS data files but fails to read raises and
        # fails the batch, so the checkpoint retries instead of silently
        # appending duplicate urls.
        if _sink_has_data_files(sess, out_dir):
            existing = sess.read.parquet(out_dir).select("url")
            batch = batch.join(existing, "url", "left_anti")
        batch.write.mode("append").parquet(out_dir)

    return (
        extracted.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling window with watermark (T5).

    Works identically on a batch DataFrame (watermark is a no-op) and a
    streaming one (late rows beyond `watermark` are dropped, state is
    bounded — the property that matters at stream scale).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
):
    """Streaming T5: file stream → watermarked window agg → parquet (append).

    Append output mode: a window emits once its watermark passes — the
    standard bounded-state shape for 10^12-event streams.
    """
    events = spark.readStream.schema(schema_ddl).parquet(input_dir)
    agg = windowed_event_counts(events, window=window, watermark=watermark)
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stateful_user_totals(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
):
    """Custom stateful operator: per-user running totals via
    applyInPandasWithState (the arbitrary-state API — the shape any custom
    stateful operator takes when windows/aggs can't express it).

    State = (n_events, total_value) per user_id, persisted in the state
    store: a restarted query (same checkpoint) CONTINUES accumulating
    across runs, which the test asserts. Each micro-batch emits one row per
    updated user with the cumulative snapshot (append sink).

    At stream scale the state store is partitioned by the group key, so
    this shuffles once on user_id and state lives with its partition —
    same key-locality story as the batch url-hash design.
    """
    import pandas as pd

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    events = spark.readStream.schema(schema_ddl).parquet(input_dir)
    totals = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return (
        totals.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_corpus(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
):
    """Streaming incremental near-dup dedup: each micro-batch is stripped
    of documents whose MinHash bands collide with the PERSISTED band
    state (all prior batches/snapshots — old text never re-read) AND of
    within-batch near-dups (min-url survives), then survivors are
    appended to the corpus and THEIR bands appended to the state — the
    streaming twin of the batch `--dedup-state-in/out` job flags, built
    on the same minhash_band_table so batch and stream dedup decisions
    are bit-identical for identical inputs.

    Ordering note: the state append happens after the corpus append in
    the same foreachBatch invocation; a crash between the two re-runs the
    batch from the checkpoint, and the url anti-join against the corpus
    output keeps the re-run idempotent (the T2 merge discipline).
    """
    from pdf_extractor_spark.operators.dedup import minhash_band_table

    reader = spark.readStream.schema(PAGES_DDL)
    pages = reader.parquet(input_dir)

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # pin the micro-batch: foreachBatch frames reuse attribute ids, so
        # the self-referencing joins below (batch -> bands -> drop -> batch)
        # hit AMBIGUOUS_REFERENCE without a checkpoint's fresh attributes;
        # the batch is already materialized, so this costs one block write
        batch = batch_df.localCheckpoint(eager=True).dropDuplicates(["url"])
        if _sink_has_data_files(sess, out_dir):
            existing = sess.read.parquet(out_dir).select("url")
            batch = batch.join(existing, "url", "left_anti")
        bands = minhash_band_table(
            batch.select("url", "text"), id_col="url", text_col="text"
        ).localCheckpoint(eager=True)
        drop = None
        if _sink_has_data_files(sess, state_dir):
            # membership probe only — project away the state's own url so
            # the join output has a single unambiguous url column
            state = sess.read.parquet(state_dir).select("band", "band_key")
            drop = (
                bands.join(state, ["band", "band_key"])
                .select("url")
                .distinct()
            )
        a = bands.selectExpr("url AS ua", "band", "band_key")
        b = bands.selectExpr("url AS ub", "band", "band_key")
        within = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("ua") < F.col("ub"))
            .select(F.col("ub").alias("url"))
            .distinct()
        )
        drop = within if drop is None else drop.unionByName(within).distinct()
        # drop's lineage traces back into batch (via bands), so a plain
        # "url" join key is self-ambiguous — break it with explicit renames
        dropped = drop.select(F.col("url").alias("_drop_url"))
        survivors = batch.join(
            dropped, batch["url"] == dropped["_drop_url"], "left_anti"
        )
        survivors.write.mode("append").parquet(out_dir)
        surl = survivors.select(F.col("url").alias("_keep_url"))
        bands.join(
            surl, bands["url"] == surl["_keep_url"], "left_semi"
        ).write.mode("append").parquet(state_dir)
        bands.unpersist()

    return (
        pages.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
