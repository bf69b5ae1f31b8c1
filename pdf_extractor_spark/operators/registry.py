"""Registry plumbing shared by all operator modules.

Each operator is an `Op`: a name, a Spark DataFrame builder
`(spark, sf_dir) -> DataFrame`, and (when SQL-expressible) the equivalent
ANSI SQL that DuckDB runs over the same parquet tables. The driver compares
the two per-query (row count + schema + order-insensitive value hash), so
every computed column is aliased identically on both sides and floating
aggregates are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@dataclass(frozen=True)
class Op:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    doc: str = ""


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _pin_utc(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap an op builder so the session runs it under UTC.

    Timestamp-sensitive ops (string→timestamp casts, date_format, window)
    must agree with DuckDB's naive-timestamp semantics; the external
    harness builds its OWN SparkSession with an arbitrary timezone. The
    pin lives here at the operator boundary — not inside load() — so plain
    table reads don't mutate the caller's session as a side effect.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


_REGISTRY: dict[str, Op] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: @register("q1", oracle="SELECT ...")."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Op(name=name, build=_pin_utc(fn), oracle=oracle, doc=doc)
        return fn

    return wrap


def all_ops() -> dict[str, Op]:
    # import for side effects: modules self-register
    from pdf_extractor_spark import annotate  # noqa: F401
    from pdf_extractor_spark.operators import (  # noqa: F401
        dedup,
        media,
        relational,
        similarity,
        textstats,
    )

    return dict(_REGISTRY)
