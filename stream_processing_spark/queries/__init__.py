"""Query registry — the correctness surface of the engine.

Each entry pairs an idiomatic-PySpark implementation with an ANSI-SQL
oracle that DuckDB runs on the same parquet tables. The driver compares
row-count + schema + order-insensitive value-hash at sf=0.01
(see /root/repo/__spark_entry__.py).

Determinism rules (both sides MUST follow them to hash-match):
- Never aggregate raw doubles: cast to DECIMAL first (the synthetic data
  is 2-decimal), aggregate exactly, then CAST the result to DOUBLE.
  Float addition is order-dependent; decimal addition is not.
- Alias every computed column identically in Spark and SQL.
- Every LIMIT carries a total tie-breaking ORDER BY.
- Round genuinely-float outputs (cosine similarity) to 6 decimals.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


# Importing the submodules populates REGISTRY via @register.
from stream_processing_spark.queries import parity  # noqa: E402,F401
from stream_processing_spark.queries import relational  # noqa: E402,F401
from stream_processing_spark.queries import relational2  # noqa: E402,F401
from stream_processing_spark.queries import relational3  # noqa: E402,F401
from stream_processing_spark.queries import relational4  # noqa: E402,F401
from stream_processing_spark.queries import relational5  # noqa: E402,F401
from stream_processing_spark.queries import llmops  # noqa: E402,F401
from stream_processing_spark.queries import streaming_queries  # noqa: E402,F401
from stream_processing_spark.queries import skew_queries  # noqa: E402,F401
from stream_processing_spark.queries import sampling_queries  # noqa: E402,F401
from stream_processing_spark.queries import sessionize_queries  # noqa: E402,F401
from stream_processing_spark.queries import analytics_queries  # noqa: E402,F401
