"""Extraction kernels.

`html_extract` / `pdf_extract` are pure-Python (numpy-assisted) and fully
deterministic — they double as the byte-identity ORACLE for the pytest
fidelity suite, mirroring how the reference validates extraction against
golden per-document JSON (reference: validation/model_validator.py:87-211).
`spark_kernel` wraps the same code path in an Arrow `mapInPandas` operator so
oracle-vs-pipeline byte identity reduces to a serialization round-trip.
"""

from pdf_extractor_spark.kernel.extract import ExtractResult, extract_document

__all__ = ["ExtractResult", "extract_document"]
