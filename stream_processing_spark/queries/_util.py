"""Shared helpers for oracle-deterministic arithmetic.

The synthetic tables store money/quantity as 2-decimal doubles. Float
addition is order-dependent, so Spark (parallel partial aggs) and DuckDB
(sequential) would diverge in the last bits. Casting to DECIMAL first
makes the aggregation exact and order-independent; casting the final
result back to DOUBLE yields bit-identical values in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2-decimal money column, values < 10^10 — plenty of headroom.
MONEY = "decimal(12,2)"
# discount/tax fractions in [0,1].
FRAC = "decimal(4,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, alias: str, typ: str = MONEY) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col, typ)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, typ: str = MONEY) -> Column:
    """Order-independent average: exact decimal sum → double ÷ count."""
    return (F.sum(dec(col, typ)).cast("double") / F.count(F.lit(1))).alias(alias)


# revenue term: l_extendedprice * (1 - l_discount), exact decimal product
def revenue_col() -> Column:
    return dec("l_extendedprice", MONEY) * (F.lit(1).cast(FRAC) - dec("l_discount", FRAC))


REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
