"""Skew-aware aggregation: two-phase salted count/sum.

At 100 TB a handful of hot keys (one viral user_id, the empty string)
turn a groupBy shuffle into a single straggler task. AQE's skew-join
splitting handles joins; for aggregations the classic fix is salting:

    phase 1: group by (key, salt)  — hot key spreads over S reducers
    phase 2: group by key          — S partial rows per key, trivial

Results are IDENTICAL to the unsalted plan (count/sum are associative);
only the shuffle distribution changes. Worth it only when skew is real —
it doubles the shuffle count for well-distributed keys, which is why
it's an explicit operator, not a default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_by(
    df: DataFrame, key_col: str, salt_buckets: int = 16, alias: str = "cnt"
) -> DataFrame:
    """count-by-key robust to hot keys."""
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    partial = (
        df.select(F.col(key_col), salt.alias("__salt"))
        .groupBy(key_col, "__salt")
        .agg(F.count(F.lit(1)).alias("__pcnt"))
    )
    return partial.groupBy(key_col).agg(F.sum("__pcnt").cast("bigint").alias(alias))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, replicate the small
    side once per salt bucket, join on (key, salt). A hot key's rows land
    on ``salt_buckets`` reducers instead of one straggler.

    Results are identical to ``big.join(small, on, how)`` for inner/left
    joins (each big row meets each small match exactly once — under one
    specific salt). AQE's skew-join split covers sort-merge inner joins
    at runtime; this explicit form also covers aggregating consumers and
    engines/configs without AQE.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics proof)")
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")


def salted_sum_by(
    df: DataFrame,
    key_col: str,
    value: Column,
    salt_buckets: int = 16,
    alias: str = "total",
) -> DataFrame:
    """sum-by-key robust to hot keys; pass a decimal-cast value column
    for engine-portable exactness (see queries/_util.py)."""
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    partial = (
        df.select(F.col(key_col), value.alias("__v"), salt.alias("__salt"))
        .groupBy(key_col, "__salt")
        .agg(F.sum("__v").alias("__psum"))
    )
    return partial.groupBy(key_col).agg(F.sum("__psum").alias(alias))
