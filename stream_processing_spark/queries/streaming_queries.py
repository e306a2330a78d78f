"""Streaming queries in the registry: each runs a REAL Structured
Streaming query (readStream → stateful agg → memory sink, availableNow)
and returns the drained result as a DataFrame. Because the stream runs
to completion, final state equals the batch answer — so these carry
full DuckDB oracles, not just rows-only checks.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import table_path
from stream_processing_spark.queries import register


def _stream_dir(sf_dir: str, table: str) -> str:
    """FileStreamSource wants a DIRECTORY of files (the scale-correct shape:
    at 100 TB a stream is a directory micro-files land in, not one file).
    The fixtures are single .parquet files, so stage a symlink directory."""
    d = tempfile.mkdtemp(prefix=f"stream_src_{table}_")
    os.symlink(table_path(sf_dir, table), os.path.join(d, f"{table}.parquet"))
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (ts is TIMESTAMP(NANOS) in the
    footer → read as long + truncate to micros, same as catalog.load_table)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string"
    )
    raw = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir, "events"))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _drain_complete(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Run the streaming aggregation to completion; return the final
    memory-sink table (complete mode ⇒ final state == batch answer)."""
    name = f"stream_q_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:  # pragma: no cover
        q.stop()
        raise TimeoutError("stream did not drain")
    return spark.table(name)


@register(
    "streaming_counts_by_type",
    """
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    """,
    doc="A REAL Structured Streaming query (file stream → stateful count "
    "→ complete-mode memory sink, drained with availableNow); final "
    "state equals the batch aggregate, hence a full oracle. The "
    "streaming twin of T5 (reference tests/sample2_op2.py).",
)
def streaming_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return _drain_complete(agg, spark)


@register(
    "streaming_hourly_windows",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
    doc="Streaming tumbling event-time window (1h) with watermark, "
    "drained to completion — matches the batch date_trunc oracle "
    "(events_hourly_tumbling's streaming twin)",
)
def streaming_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (
        src.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )
    return _drain_complete(agg, spark)
