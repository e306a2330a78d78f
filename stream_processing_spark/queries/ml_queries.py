"""Distributed classical ML primitives as aggregations.

The scalable form of classical statistics is "reduce to sufficient
statistics, solve tiny system on the driver/in-expression": OLS needs
only (n, Σx, Σy, Σxy, Σx²) per group — one shuffle of 5 numbers per
key no matter how many rows feed it. Summing in DECIMAL keeps the
moments exact and order-independent, so the closed-form solution is
bit-reproducible in any engine (the same determinism discipline as the
rest of the registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register

# quantity is 2dp <= ~50, price 2dp <= ~1e5: products fit DECIMAL(24,4);
# sums over 1e8 rows still fit DECIMAL(38,4).
_X = "CAST(l_quantity AS DECIMAL(12,2))"
_Y = "CAST(l_extendedprice AS DECIMAL(12,2))"


@register(
    "linreg_price_on_quantity",
    f"""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM({_X}) AS DOUBLE) AS sx,
               CAST(SUM({_Y}) AS DOUBLE) AS sy,
               CAST(SUM(CAST({_X} * {_Y} AS DECIMAL(24,4))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST({_X} * {_X} AS DECIMAL(24,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST({_Y} * {_Y} AS DECIMAL(24,4))) AS DOUBLE) AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           ROUND(POW(n * sxy - sx * sy, 2) /
                 ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    ORDER BY l_returnflag
    """,
    doc="Per-group OLS (extendedprice ~ quantity) via sufficient "
    "statistics: the ONLY distributed work is one aggregation of "
    "(n, Σx, Σy, Σxy, Σx², Σy²) per return flag — 6 numbers per key "
    "regardless of row count, the canonical scale shape for classical "
    "stats. Moments are summed in DECIMAL (exact, order-independent), "
    "then the closed-form slope/intercept/R² evaluates identically in "
    "both engines; the same fixed double arithmetic on both sides plus "
    "a 6dp round makes the output bit-stable. No driver trips, no "
    "iteration, no UDFs.",
)
def linreg_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(24,4)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(24,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(24,4)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, F.lit(2))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "hll_sketch_rollup_users",
    None,  # cross-engine sketch binaries differ; error-bound-tested
    doc="Re-aggregable distinct counting (Apache DataSketches HLL, "
    "built into Spark 4): per-(event_type, day) user sketches are "
    "stored once, then UNIONED to coarser grains — here per "
    "event_type — without touching raw data again. This is the 100 TB "
    "distinct-count architecture: exact countDistinct cannot be "
    "rolled up (distinct is not associative across days), so daily "
    "cubes keep 1.5 KB sketches and every coarser report is a "
    "constant-time merge. No SQL oracle by design (sketch estimates "
    "are engine-specific); tests/test_approx.py bounds the estimate "
    "against the exact count (<=3% at lgK=12) and asserts the "
    "roll-up estimate equals the direct single-pass sketch estimate.",
)
def hll_sketch_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
    daily = (
        ev.select("event_type", day.alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("est_users"),
        )
        .orderBy("event_type")
    )
