"""Skew-aware aggregation queries: salted two-phase plans whose results
are identical to the naive single-shuffle plan (the oracle proves it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_processing_spark.catalog import load_table
from stream_processing_spark.operators.skew import salted_count_by, salted_sum_by
from stream_processing_spark.queries import register
from stream_processing_spark.queries._util import dec


@register(
    "skew_salted_user_counts",
    """
    SELECT user_id, COUNT(*) AS cnt
    FROM events
    GROUP BY user_id
    """,
    doc="Salted two-phase count-by-key (operators/skew.py): identical "
    "results to the plain groupBy — the point of the oracle — with the "
    "shuffle spread over (key, salt) so hot keys can't straggle",
)
def skew_salted_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return salted_count_by(events, "user_id", salt_buckets=16)


@register(
    "skew_salted_user_totals",
    """
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY user_id
    """,
    doc="Salted two-phase sum-by-key; decimal partials keep the result "
    "exact and order-independent across both phases",
)
def skew_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = salted_sum_by(events, "user_id", dec("value"), salt_buckets=16)
    return out.select("user_id", out.total.cast("double").alias("total"))
