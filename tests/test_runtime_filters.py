"""Runtime (bloom) filter injection — the Spark-first mechanism that makes
selective shuffle joins cheap at 100 TB: the filtered build side produces a
bloom filter that is pushed into the probe-side scan, so most probe rows
die before the shuffle. We rely on the built-in optimizer rule
(spark.sql.optimizer.runtime.bloomFilter.*) rather than hand-rolling a
prefilter; this test pins that the rule actually fires on our join shapes.

The applicationSideScanSizeThreshold (default 10 GB) is what gates it in
production — at test scale we lower it to 0 to observe the rewrite.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_runtime_bloom_filter_injected_on_selective_join(spark):
    with _confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        j = li.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == orders.o_orderkey,
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "bloom runtime filter not injected"

        # and the rewrite must not change results
        n_with = j.count()
    n_plain = (
        li.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == orders.o_orderkey,
        ).count()
    )
    assert n_with == n_plain


def test_large_large_join_uses_sort_merge(spark):
    """With broadcast off (the 100 TB fact-fact case), the planner must
    pick SortMergeJoin — keyed shuffle both sides, never a nested loop."""
    with _confs(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1",
                          "spark.sql.adaptive.enabled": "false"}):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
