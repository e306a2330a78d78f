"""Range join: pair rows whose timestamps fall within an interval.

Spark has no native range join; a naive ``a.join(b, (b.ts >= a.lo) &
(b.ts < a.hi))`` compiles to BroadcastNestedLoopJoin — O(|a|·|b|)
comparisons, a non-starter at scale.

The scale-correct plan is BUCKETED: quantize time into buckets of the
interval width, equi-join on (key, bucket) for each of the two buckets
an interval can overlap, then apply the exact range predicate. The
cross product collapses to per-bucket work and the join is a plain
shuffled/broadcast hash join on a compact key.

Cited reference scope: the reference has no joins at all
(SURVEY.md §2.4); this is a north-star extension alongside asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, width_sec: int) -> Column:
    # unix_timestamp is TZ-stable for TIMESTAMP_NTZ inputs in UTC sessions
    return (ts.cast("long") / width_sec).cast("long")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback_sec: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For each left row, count right rows with the same ``on`` key and
    ``left_ts - lookback < right_ts <= left_ts``.

    Each left interval (lookback window) spans at most 2 buckets of
    width ``lookback_sec`` — join on (key, bucket) twice via explode,
    then filter exactly. Left rows with zero matches are kept (count 0),
    and duplicate left rows each keep their own output row (the final
    regroup is keyed by a per-row id, not by the left columns).
    """
    lb = F.explode(
        F.array(
            _bucket(F.col("__lts"), lookback_sec),
            _bucket(F.col("__lts"), lookback_sec) - 1,
        )
    )
    lhs = (
        left.withColumn("__rowid", F.monotonically_increasing_id())
        .withColumn("__lts", F.col(left_ts))
        .withColumn("__bucket", lb)
    )
    rhs = (
        right.select(
            F.col(on).alias("__rkey"),
            F.col(right_ts).alias("__rts"),
        )
        .withColumn("__bucket", _bucket(F.col("__rts"), lookback_sec))
    )
    # bucket math truncates to seconds (safe: a (lo, hi] window still
    # spans ≤2 width-sized buckets); the exact predicate must not
    window_lo = F.col("__lts") - F.expr(f"INTERVAL {lookback_sec} SECOND")
    matched = (
        lhs.join(
            rhs,
            (lhs[on] == rhs.__rkey) & (lhs.__bucket == rhs.__bucket),
            "left",
        )
        .withColumn(
            "__hit",
            F.when(
                F.col("__rts").isNotNull()
                & (F.col("__rts") > window_lo)
                & (F.col("__rts") <= F.col("__lts")),
                1,
            ).otherwise(0),
        )
    )
    group_cols = [c for c in left.columns]
    return (
        matched.groupBy("__rowid", *group_cols)
        .agg(F.sum("__hit").cast("bigint").alias(count_alias))
        .drop("__rowid")
    )
