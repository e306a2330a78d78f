"""Idempotent foreachBatch table sink: exactly-once streaming writes to
a queryable table, surviving batch replays.

Structured Streaming guarantees each micro-batch is delivered to
``foreachBatch`` at least once with a stable ``batch_id``; after a crash
the LAST batch may be re-delivered. A sink that blindly appends would
duplicate it. The classic fix (reference analogue: the leader's
``(job_id, line_number)`` dedup dict, leader.py:241-246) is to stamp
every written row with its batch_id and make re-delivery a no-op:

    replace-where partition: delete batch_id's partition, rewrite it.

Writing each batch into its own ``__batch_id=<n>`` partition makes the
overwrite surgical (dynamic partition overwrite touches only the
replayed partition) and scales: no read-modify-write of the whole table,
no global lock — the property that matters when the table is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def idempotent_batch_writer(path: str):
    """Return a foreachBatch callback writing exactly-once to ``path``.

    Usage::

        q = (df.writeStream.foreachBatch(idempotent_batch_writer(out))
               .option("checkpointLocation", ckpt).start())
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(path)
        )

    return write


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read an idempotent sink table back (batch-id column dropped)."""
    return spark.read.parquet(path).drop("__batch_id")
