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
    # timestamp-sensitive ops (string→timestamp casts, date_format, window)
    # must agree with DuckDB's naive-timestamp semantics regardless of the
    # DRIVER's session timezone — the external harness builds its own
    # SparkSession, so pin UTC here (runtime-settable, idempotent)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_REGISTRY: dict[str, Op] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: @register("q1", oracle="SELECT ...")."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Op(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_ops() -> dict[str, Op]:
    # import for side effects: modules self-register
    from pdf_extractor_spark.operators import (  # noqa: F401
        dedup,
        media,
        relational,
        similarity,
        textstats,
    )

    return dict(_REGISTRY)
