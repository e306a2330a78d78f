"""Training-shard writer: the layout step between curation and the
dataloader.

A 100 TB corpus is consumed as partition-pruned, internally-sorted,
size-bounded parquet shards. This module is the thin, opinionated
writer that produces that layout:

- ``partitionBy`` on low-cardinality routing columns (lang, split,
  bin) → directory-level partition pruning at read time (the scan
  shows PartitionFilters, see tests/test_partitioning.py);
- ``sortWithinPartitions`` on the read-order columns (doc_id) → runs
  are contiguous inside every file, so downstream range scans and
  packers stream sequentially;
- ``maxRecordsPerFile`` bounds shard size so the dataloader's unit of
  work is uniform and stragglers are bounded — without it one hot
  partition writes one giant file.

Everything here is plain Spark writer configuration — the value is the
contract (layout in = layout assumed by every consumer), which is why
it lives in one place instead of per-call-site writer chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_shards(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as partitioned, sorted, size-bounded parquet shards."""
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .mode(mode)
        .parquet(path)
    )


def read_shard(
    spark: SparkSession, path: str, **partition_filters
) -> DataFrame:
    """Read with directory-level pruning: equality filters on partition
    columns become PartitionFilters (only matching directories are
    listed/scanned)."""
    df = spark.read.parquet(path)
    for col, val in partition_filters.items():
        df = df.filter(df[col] == val)
    return df
