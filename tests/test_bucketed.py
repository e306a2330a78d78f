"""Bucketed co-located join: the plan must contain NO shuffle exchange,
and results must equal the plain (shuffling) join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.sources.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{wh}'")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "bdb.b_lineitem", "l_orderkey", buckets=8)
    write_bucketed(orders, "bdb.b_orders", "l_orderkey", buckets=8)
    yield "bdb.b_lineitem", "bdb.b_orders"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # at test scale Spark would (correctly) broadcast the small side,
    # which bypasses bucketing; disable broadcast to exercise the plan
    # the big-fact-join case hits at 100 TB
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sq"),
    )
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sq"),
    )
    assert joined.head() == plain.head()
