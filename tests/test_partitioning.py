"""Partitioned writes + partition pruning: the other half of the storage
scale story (bucketing covers join co-location; partitioning covers
selective scans). A date-partitioned table must show PartitionFilters in
the scan and read only the matching directories."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part")) + "/events_by_day"
    events = load_table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    )
    events.write.partitionBy("day").mode("overwrite").parquet(out)
    return out


def test_partition_pruning_in_plan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_day = df.select(F.min("day")).head()[0]
    q = df.filter(F.col("day") == F.lit(one_day)).groupBy("event_type").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the day predicate must be a partition filter, not a data filter
    assert "day" in plan.split("PartitionFilters")[1].split("]")[0]


def test_partitioned_read_matches_full_filter(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_day = df.select(F.min("day")).head()[0]
    pruned = df.filter(F.col("day") == F.lit(one_day)).count()
    full = (
        load_table(spark, SF, "events")
        .filter(F.to_date("ts") == F.lit(one_day))
        .count()
    )
    assert pruned == full and pruned > 0
