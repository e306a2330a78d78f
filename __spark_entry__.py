"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``stream_processing_spark``; this module only
adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# transformWithState queries need a google.protobuf runtime exported to
# python workers via env BEFORE the JVM starts; importing this module is
# the one step every harness performs before building its session, so
# the export happens here. Idempotent, and a no-op when a native
# protobuf install exists or the vendored shim is unavailable.
from stream_processing_spark.compat import ensure_protobuf_runtime

ensure_protobuf_runtime()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's demo
    pipeline (regex filter → project → count-by-key; SURVEY.md §7.2 step 2)
    over the documents table."""
    from stream_processing_spark.queries import REGISTRY

    return REGISTRY["t5_count_by_category"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stream_processing_spark.queries import REGISTRY

    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from stream_processing_spark.queries import REGISTRY

    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
