"""Sixth relational wave: the six remaining TPC-H plan shapes (Q4, Q11,
Q12, Q16, Q20, Q21), adapted to the driver's trimmed schema (no
partsupp / commit- / receipt-date / shipmode columns — each query keeps
the ORIGINAL's join/subquery topology and swaps in available columns;
the docstrings state the substitution). With these, all 22 TPC-H query
shapes are represented in the registry.

Determinism: decimal-exact money/quantity aggregation (queries/_util),
identical aliases both engines, every LIMIT tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register
from stream_processing_spark.queries._util import dec, dsum


@register(
    "q4_priority_late_ship",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: one-quarter order scan, EXISTS-correlated "
    "lineitem probe, count per priority. The reference Q4's "
    "commitdate<receiptdate predicate becomes 'shipped more than 60 "
    "days after ordering' (the columns this schema has). Spark spells "
    "EXISTS as a left-semi join on the order key with the non-equi "
    "lateness predicate in the join condition — the semi join ships "
    "only order keys, and the quarter filter pushes into the orders "
    "scan (partition-prunable at scale).",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q11_important_part_values",
    """
    WITH pv AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(v AS DOUBLE) > (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               * 1.25 / COUNT(DISTINCT l_partkey)
        FROM lineitem
    )
    """,
    doc="TPC-H Q11 shape: grouped value sum filtered by a scalar "
    "subquery threshold (a fraction of the GLOBAL total). partsupp "
    "doesn't exist in this schema, so part value = summed lineitem "
    "extendedprice per part (same group-then-threshold topology); the "
    "threshold is 1.25x the AVERAGE part's share, so the selectivity "
    "is scale-invariant (~12 percent of parts at every sf; a fixed "
    "fraction like Q11's 0.0001 empties out as the part count grows "
    "past 1/fraction). The compare runs in DOUBLE with the identical "
    "expression shape both engines (exact decimal sum, one cast, one "
    "multiply, one divide — same IEEE ops, same order). Spark computes the "
    "1-row global threshold and broadcasts it into the HAVING filter "
    "— the grouped aggregate shuffles once on l_partkey and the "
    "threshold costs one extra scan, not a join. Exact decimal sums "
    "both sides.",
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("v")
    )
    total = li.agg(
        (
            F.sum(dec("l_extendedprice")).cast("double")
            * F.lit(1.25)
            / F.count_distinct("l_partkey")
        ).alias("thr")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("thr"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


@register(
    "q12_linestatus_priority_mix",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: fact-to-fact join filtered to late lines in "
    "one year, then conditional aggregation splitting URGENT/HIGH "
    "orders from the rest per line group. l_shipmode doesn't exist in "
    "this schema, so l_linestatus is the grouping attribute and "
    "lateness is shipdate>orderdate+90d. The year filter pushes into "
    "the lineitem scan; the join shuffles on the order key; the "
    "CASE-sum pivot reduces map-side.",
)
def q12_linestatus_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q16_supplier_count_by_part",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier count per part attribute "
    "triple, excluding one brand, a type prefix, and suppliers from a "
    "NOT IN subquery (Q16's complaint suppliers become "
    "negative-balance ones; lineitem stands in for the absent "
    "partsupp bridge). Spark spells NOT IN as a left-anti join against "
    "the tiny supplier subquery (broadcast), the part filters push "
    "into the dimension scan (broadcast join prunes the fact), and "
    "COUNT(DISTINCT) shuffles the already-filtered (attrs, suppkey) "
    "pairs once.",
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_part_suppliers",
    """
    WITH sp AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    pt AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total,
               COUNT(DISTINCT l_suppkey) AS nsupp
        FROM lineitem GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT sp.l_suppkey FROM sp
        JOIN pt ON sp.l_partkey = pt.l_partkey
        WHERE pt.nsupp >= 3
          AND CAST(sp.qty AS DOUBLE) > 3.0 * CAST(pt.total AS DOUBLE) / pt.nsupp
    )
    """,
    doc="TPC-H Q20 shape: a nested IN-chain — suppliers selected by a "
    "derived per-(part, supplier) aggregate compared against a "
    "per-part threshold (Q20's 'availqty > half of shipped quantity' "
    "becomes 'shipped more than 3x the average supplier's share of a "
    "part with >= 3 suppliers' — scale-invariant selectivity on this "
    "flat synthetic data, where absolute-share dominance vanishes as "
    "lines-per-part grow; partsupp is absent). Spark: two grouped "
    "sums sharing the l_partkey shuffle (the finer (partkey, suppkey) "
    "grouping re-aggregates map-side into the coarser), a part-key "
    "join, then a left-semi into supplier — supplier rows never fan "
    "out. Exact decimal sums; the threshold compare runs in DOUBLE "
    "with the identical op order both engines.",
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("qty")
    )
    pt = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("total"),
        F.count_distinct("l_suppkey").alias("nsupp"),
    )
    dominant = (
        sp.join(pt, "l_partkey")
        .filter(
            (F.col("nsupp") >= 3)
            & (
                F.col("qty").cast("double")
                > F.lit(3.0) * F.col("total").cast("double") / F.col("nsupp")
            )
        )
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_last_shipper_waits",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: the EXISTS + NOT-EXISTS pair over the same "
    "fact — for finished orders with MULTIPLE suppliers, count per "
    "supplier the lines where that supplier shipped LAST (every other "
    "supplier shipped no later). Q21's receipt-vs-commit lateness "
    "becomes pure ship-order lateness (those columns don't exist "
    "here). Spark: left-semi (another supplier exists) then left-anti "
    "(no other supplier shipped later) on the order-key equi-join "
    "with non-equi residuals, then a broadcast supplier join and one "
    "grouped count. Both probes shuffle ids+dates only.",
)
def q21_last_shipper_waits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    base = l1.join(
        orders, F.col("l1.l_orderkey") == orders.o_orderkey, "left_semi"
    )
    multi = base.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    last = multi.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        last.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
