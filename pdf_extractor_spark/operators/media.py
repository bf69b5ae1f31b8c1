"""Multimodal operators exposed through the driver contract.

These wrap pdf_extractor_spark.multimodal (binary media columns + Arrow
decode kernels). No `oracle` SQL: the kernels are mapInPandas UDFs that
DuckDB cannot express — the driver records rows-only checks here, and the
real correctness gate is tests/test_multimodal.py (deterministic synth →
decode round-trip, feature values, batch shapes, stub boundary).

The media table is synthesized deterministically inside each query (seeded;
no external data), mirroring how the pages table works for the extraction
kernel.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.registry import register

_N_MEDIA = 400
_SEED = 7


def _media(spark):
    from pdf_extractor_spark.multimodal import media_df

    return media_df(spark, _N_MEDIA, seed=_SEED)


@register(
    "mm_pipeline",
    doc="Multimodal suite in one labeled union (consolidated round 2 for the "
    "driver's ~50-query verified window; all three stages still run, each "
    "as its own Arrow pass, and tests/test_multimodal.py remains the value "
    "gate). 'features:<kind>' rows: binary media column → fixed-width "
    "feature vectors via the Arrow decode kernel (multimodal."
    "extract_features) with per-kind counts + feature checksum. 'resize' "
    "row: image resize (block mean-pool stand-in for a real resampler) "
    "with JVM-side kind filter before the UDF. 'frames' row: video frame "
    "sampling (UDTF shape — one row per kept frame, single Arrow pass, no "
    "shuffle). 'probe:<kind>' rows (round 5): header-only metadata pass "
    "(multimodal.probe_media — dims/duration/sample-rate without sample "
    "decode, the curation-first filter over a media column).",
)
def mm_pipeline(spark, sf_dir):
    from pdf_extractor_spark.multimodal import (
        media_features,
        media_probe,
        resize_images,
        sample_frames,
    )

    media = _media(spark)
    feats = (
        media_features(media)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("mean_value"), 4).alias("avg1"),
            F.round(F.sum(F.aggregate("features", F.lit(0.0), lambda a, x: a + x)), 2).alias(
                "avg2"
            ),
        )
        .select(
            F.concat(F.lit("features:"), "kind").alias("stage"),
            "n",
            F.lit(None).cast("long").alias("n2"),
            "avg1",
            "avg2",
        )
    )
    resized = (
        resize_images(media, out_w=4, out_h=4)
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.avg(F.aggregate("pixels", F.lit(0.0), lambda a, x: a + x) / 16.0), 3
            ).alias("avg1"),
        )
        .select(
            F.lit("resize").alias("stage"),
            "n",
            F.lit(None).cast("long").alias("n2"),
            "avg1",
            F.lit(None).cast("double").alias("avg2"),
        )
    )
    frames = (
        sample_frames(media, every_n=4)
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("media_id").alias("n2"),
            F.round(F.avg("frame_mean"), 3).alias("avg1"),
        )
        .select(
            F.lit("frames").alias("stage"),
            "n",
            "n2",
            "avg1",
            F.lit(None).cast("double").alias("avg2"),
        )
    )
    probed = (
        media_probe(media)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ok").cast("long")).alias("n2"),
            F.round(F.avg("width"), 3).alias("avg1"),
            F.round(F.avg("duration_ms"), 3).alias("avg2"),
        )
        .select(
            F.concat(F.lit("probe:"), "kind").alias("stage"),
            "n",
            "n2",
            "avg1",
            "avg2",
        )
    )
    return (
        feats.unionByName(resized).unionByName(frames).unionByName(probed)
        .orderBy("stage")
    )


@register(
    "mm_mp4_demux",
    doc="Codec-free MP4 frame sampling over real ISO-BMFF containers "
    "(round 5): multimodal.mp4_sample_table parses the sample tables "
    "(stsz/stco/stsc/stts + mdhd timescale, ISO 14496-12 §8.5-8.7) to "
    "byte-address every frame, and the Arrow kernel slices + summarizes "
    "them — the demux pass a media pipeline runs to sample frames without "
    "paying (or shipping) a codec. Containers are written by the "
    "from-scratch write_mp4 twin (seeded raw-gray frames), so sample "
    "bytes are verifiable end-to-end; tests/test_multimodal.py holds the "
    "byte-identity and fuzz gates. Rows-only for the driver (mapInPandas "
    "is not SQL-expressible). Aggregated per media: sample count, total "
    "sample bytes, span of decoded timestamps.",
)
def mm_mp4_demux(spark, sf_dir):
    from pdf_extractor_spark.multimodal import demux_mp4_frames, mp4_media_df

    media = mp4_media_df(spark, 200, seed=_SEED)
    return (
        demux_mp4_frames(media, every_n=2)
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_bytes").cast("long").alias("sampled_bytes"),
            F.max("dts_ms").cast("long").alias("last_dts_ms"),
            F.round(F.avg("frame_mean"), 4).alias("avg_frame_mean"),
        )
        .orderBy("media_id")
    )
