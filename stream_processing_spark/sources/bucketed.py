"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
shuffling both sides on the join key — every query, every time. Bucketing
moves that shuffle to WRITE time, once: both tables are written
pre-hash-partitioned into the same number of buckets on the join key, so
any later equi-join or aggregation on that key reads co-located buckets
and skips the Exchange entirely (and with ``sortBy``, the sort).

This is the Spark-native equivalent of the reference's hash routing
(`src/Streaming/worker.py:255-262` — sha1(key) % num_tasks chooses the
downstream task): the same idea, applied at the storage layer where it
amortizes across every subsequent query.

Rules for the shuffle-free plan (asserted in tests/test_bucketed.py):
- both sides bucketed on the join key with the SAME bucket count;
- ``spark.sql.sources.bucketing.enabled`` (default true);
- bucket count chosen so one bucket ≈ one task's memory at target scale
  (100 TB / 2048 buckets ≈ 50 GB of raw fact per bucket → split further
  by files within the bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucketed tables — plan contains no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
