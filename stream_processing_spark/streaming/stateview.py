"""Query streaming state as DataFrames (state data source, Spark 4).

The reference's keyed state is a dict inside each operator process,
inspectable only by replaying the processed log (src/Streaming/
worker.py:327-368 recover_log rebuilds it line by line). Structured
Streaming keeps that state in the query checkpoint — and Spark 4's
``statestore`` / ``state-metadata`` readers make it a queryable TABLE:
no replay, no query downtime, a plain batch scan of the store files.

Operationally this is the 100 TB debugging surface for stateful
pipelines: find the skewed key whose state blew past memory, audit
exactly what a dedup set contains after a replay, verify a restarted
query recovered the totals it should have — all with ordinary SQL over
the checkpoint, while the stream keeps running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator/store inventory of a query checkpoint: operatorId,
    operatorName, stateStoreName, numPartitions, min/max batch ids."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str = "default",
    batch_id: int | None = None,
) -> DataFrame:
    """Raw keyed state of one operator's store: struct columns ``key``
    and ``value`` (schemas exactly as the operator declared them) plus
    ``partition_id``. ``batch_id`` time-travels to an earlier retained
    snapshot; default is the latest committed batch."""
    r = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .option("storeName", store_name)
    )
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint_dir)


def running_count_state(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Flattened (key, cnt) view of a streaming ``groupBy(key).count()``
    checkpoint — the engine-side twin of the reference's per-operator
    count dict (tests/sample2_op2.py:12-17)."""
    st = read_state(spark, checkpoint_dir)
    return st.select(
        F.col("key").getField("key").alias("key"),
        F.col("value").getField("count").alias("cnt"),
    )
