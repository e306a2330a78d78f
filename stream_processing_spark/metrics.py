"""Shuffle-volume accounting from Spark's own SQLMetrics.

The 100 TB claims about "ids-only shuffles" and banded-join bounds were
plan-verified (no exchange where none belongs) and, since round 3,
stress-measured in wall time. This module closes the remaining gap: it
executes a DataFrame's physical plan and reads back the SHUFFLE BYTES
its exchanges actually wrote, so the stress bench can assert byte
ceilings, not just durations.

How: ``qe.executedPlan().execute().count()`` runs the query entirely
JVM-side (no driver data transfer; for AQE plans this drives the stage
loop to the final plan) and populates the SQLMetric accumulators on the
SAME plan instance, which a tree walk then sums. Works with the UI
disabled — SQLMetrics are accumulators, not UI state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: metric keys as registered by ShuffleExchangeExec's write metrics
BYTES_KEY = "shuffleBytesWritten"
RECORDS_KEY = "shuffleRecordsWritten"


def _sum_metric(node, key: str, seen: set[int]) -> int:
    nid = node.id()
    if nid in seen:  # ReusedExchange shares metrics with the original
        return 0
    seen.add(nid)
    total = 0
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == key:
            total += kv._2().value()
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return total + _sum_metric(node.executedPlan(), key, seen)
    if name.endswith("QueryStageExec"):
        return total + _sum_metric(node.plan(), key, seen)
    ch = node.children()
    for i in range(ch.size()):
        total += _sum_metric(ch.apply(i), key, seen)
    return total


def execute_with_shuffle_metrics(df: DataFrame) -> dict:
    """Run ``df`` to completion (JVM-side, nothing collected) and return
    ``{"rows", "shuffle_bytes_written", "shuffle_records_written"}``
    summed over every exchange in the executed plan."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    rows = plan.execute().count()
    return {
        "rows": int(rows),
        "shuffle_bytes_written": int(_sum_metric(plan, BYTES_KEY, set())),
        "shuffle_records_written": int(_sum_metric(plan, RECORDS_KEY, set())),
    }
