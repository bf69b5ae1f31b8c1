"""pdf_extractor_spark — a PySpark-native main-content extraction engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of nestoru/pdf-extractor (reference at /root/reference, snapshot
2025-09-12): batched HTML boilerplate-strip + PDF reading-order parse over a
table of Common-Crawl-style pages (url, warc_ts, html, text, lang), written
back as (url, extracted_text, span_offsets, parse_status) with per-partition
checkpoint/lineage and explicit partitioning for 10^12-document scale.

Layout:
    kernel/     pure-Python extraction oracle + Arrow/mapInPandas wrapper
    operators/  relational operator library (SURVEY.md §2) + training-data ops
    synth.py    deterministic pages-table synthesizer (seeded, no external data)
    pipeline.py end-to-end extraction job with control-table resume
    session.py  tuned SparkSession builder
"""

__version__ = "0.1.0"
