"""Range-partitioned two-pass prefix sum (scan) over a keyed frame.

The naive Spark spelling of a running total — ``F.sum(v).over(
Window.orderBy(k))`` with no partitionBy — collapses the whole frame
into ONE task: fine for a genuinely domain-bounded frame (a 7-value
flag histogram), a straggler stage when the key domain grows with the
data (the price-cents marginal saturates a ~10M-value domain at scale,
so one executor walks a 10M-row histogram while 999 idle).

This operator computes the same cumulative sums with the classic
two-pass parallel-scan decomposition (Blelloch 1990):

1. ``repartitionByRange(P, k)`` so partition *i* holds a contiguous,
   ascending key range (Spark's RangePartitioner guarantees partition
   ordinals follow key order);
2. pass 1 — a PER-PARTITION running sum (``Window.partitionBy(pid)
   .orderBy(k)``: P parallel tasks, no global collapse) plus each
   partition's subtotal;
3. the P subtotals (a P-row frame, bounded by the partition count, not
   the data) get their own exclusive running sum — the per-partition
   OFFSET each local scan must add;
4. pass 2 — broadcast the P-row offset map back and add.

The result is BIT-IDENTICAL to the single-partition window for the
integer/DECIMAL sums the registry uses (addition is reassociated, which
exact types don't care about), so oracles keep hashing green while the
plan gains P-way parallelism.

Reference analogue: the reference engine has no scan operator at all —
its aggregations are single-process dict walks (src/Streaming/
worker.py:255-262 hash-partitions, then each worker folds sequentially).
This is the Spark-shaped answer to the same "global order-dependent
fold" problem at 1000-executor scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["range_prefix_sum"]


def range_prefix_sum(
    df: DataFrame,
    key: str,
    sums: dict[str, Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Add INCLUSIVE running-sum columns ordered by ``key``.

    ``sums`` maps each output column name to the value expression it
    accumulates (a Column or an existing column name). Keys must be
    orderable; NULL keys sort FIRST (matching both engines' default
    ``ORDER BY`` window placement for ascending scans, and matching
    where repartitionByRange places them). Every input column is
    preserved; the output adds one running-sum column per entry.

    The fold is exact for integer/DECIMAL inputs — use those (registry
    determinism rule: never accumulate raw doubles).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"
        )
        num_partitions = max(1, int(num_partitions))

    exprs = {
        out: (F.col(v) if isinstance(v, str) else v)
        for out, v in sums.items()
    }
    for out in exprs:
        if out in df.columns:
            raise ValueError(f"output column {out!r} already exists")

    # Pass 1: contiguous key ranges → per-range local scans in parallel.
    # spark_partition_id() is stable here because RangePartitioner's
    # boundary sampling is deterministically seeded by partition ordinal
    # over a deterministic input.
    ranged = df.repartitionByRange(
        num_partitions, F.col(key).asc_nulls_first()
    ).withColumn("_psum_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_psum_pid").orderBy(
        F.col(key).asc_nulls_first()
    )
    local = ranged.select(
        "*",
        *[
            F.sum(expr).over(w_local).alias(f"_psum_local_{out}")
            for out, expr in exprs.items()
        ],
    )

    # Subtotals: one row per partition — bounded by the partition COUNT
    # (a config constant), never the data. The exclusive scan over this
    # P-row frame is the only non-partitioned window, by construction
    # tiny.
    subtotals = local.groupBy("_psum_pid").agg(
        *[
            F.sum(expr).alias(f"_psum_sub_{out}")
            for out, expr in exprs.items()
        ]
    )
    w_off = Window.orderBy("_psum_pid")
    offsets = subtotals.select(
        "_psum_pid",
        *[
            (
                F.coalesce(
                    F.sum(f"_psum_sub_{out}").over(w_off)
                    - F.col(f"_psum_sub_{out}"),
                    F.lit(0),
                )
            ).alias(f"_psum_off_{out}")
            for out in exprs
        ],
    )

    # Pass 2: broadcast the P-row offset map back onto the local scans.
    keep = df.columns
    out_cols = [
        (
            F.col(f"_psum_local_{out}") + F.col(f"_psum_off_{out}")
        ).alias(out)
        for out in exprs
    ]
    return local.join(F.broadcast(offsets), "_psum_pid").select(
        *keep, *out_cols
    )
