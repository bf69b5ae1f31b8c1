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
    "mm_media_features",
    doc="Binary media column → fixed-width feature vectors via the Arrow "
    "decode kernel (multimodal.extract_features); per-kind counts + feature "
    "checksum so the rows-only check still pins values deterministically.",
)
def mm_media_features(spark, sf_dir):
    from pdf_extractor_spark.multimodal import media_features

    feats = media_features(_media(spark))
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("mean_value"), 4).alias("avg_mean"),
            F.round(F.sum(F.aggregate("features", F.lit(0.0), lambda a, x: a + x)), 2).alias(
                "feat_mass"
            ),
        )
        .orderBy("kind")
    )


@register(
    "mm_image_resize",
    doc="Image resize (block mean-pool stand-in for a real resampler) over "
    "the binary image payloads; JVM-side kind filter before the UDF.",
)
def mm_image_resize(spark, sf_dir):
    from pdf_extractor_spark.multimodal import resize_images

    out = resize_images(_media(spark), out_w=4, out_h=4)
    return out.agg(
        F.count("*").alias("n_images"),
        F.round(F.avg(F.aggregate("pixels", F.lit(0.0), lambda a, x: a + x) / 16.0), 3).alias(
            "avg_pixel"
        ),
    )


@register(
    "mm_frame_sample",
    doc="Video frame sampling: one row per kept frame (UDTF shape, single "
    "Arrow pass, no shuffle).",
)
def mm_frame_sample(spark, sf_dir):
    from pdf_extractor_spark.multimodal import sample_frames

    frames = sample_frames(_media(spark), every_n=4)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("media_id").alias("n_videos"),
        F.round(F.avg("frame_mean"), 3).alias("avg_frame_mean"),
    )
