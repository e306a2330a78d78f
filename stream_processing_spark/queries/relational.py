"""Relational surface: aggregations, joins, windows, sorts, set ops.

The reference has none of these beyond count-by-key (SURVEY.md §2.4 —
"None implemented"); they are first-class here because the engine targets
general query capability. Every query is written scale-first:

- small dims (nation, region, supplier) are broadcast — no shuffle of the
  fact table for those joins;
- aggregations rely on map-side partial aggregation (one row per
  partition×key crosses the wire);
- sort+limit compiles to TakeOrderedAndProject (per-partition top-k, then
  a k-row gather — no global sort);
- decimal casts keep results order-independent (see _util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register
from stream_processing_spark.queries._util import (
    FRAC,
    MONEY,
    REVENUE_SQL,
    davg,
    dec,
    dsum,
    revenue_col,
)


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary; single scan + grouped agg with "
    "map-side combine, filter pushed to parquet",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(revenue_col()).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    f"""
    SELECT o_orderkey,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped top revenue orders: 3-way join + agg + "
    "deterministic top-k (total tie-break on o_orderkey)",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is ~1.5% of lineitem — broadcast to avoid shuffling facts
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    f"""
    SELECT n_name,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-shaped local-supplier revenue: 6-table join; supplier/"
    "nation/region broadcast (dims), facts shuffle once on the join key",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
    )


@register(
    "join_left_outer_order_counts",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="Left outer join + count (customers with zero orders kept)",
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_semi_big_spenders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 200000
    )
    """,
    doc="Left-semi join (EXISTS); semi joins ship only the join key",
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_no_big_order",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
    doc="Left-anti join (NOT EXISTS): customers with no order above 400k",
)
def join_anti_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    doc="Window row_number top-N per group; one shuffle on the partition key",
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_user_value",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS DOUBLE) AS running_value
    FROM events
    """,
    doc="Running sum per user in event-time order (deterministic via "
    "(ts, event_id) total order; decimal keeps it exact)",
)
def window_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
    )


@register(
    "sort_topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k: compiles to TakeOrderedAndProject (per-partition "
    "heap + k-row gather), not a full sort — the plan that survives 100 TB",
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "set_union_key_customers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
    doc="UNION (distinct) of two customer key sets",
)
def set_union_key_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect_customers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    doc="INTERSECT of customer key sets",
)
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@register(
    "set_except_customers",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
    doc="EXCEPT (customers minus those with a 400k+ order)",
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.select("c_custkey").exceptAll(
        orders.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


@register(
    "agg_distinct_counts",
    """
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    """,
    doc="Distinct aggregation (expands to partial-distinct + final)",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (subtotals + grand total)",
)
def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", "sum_qty")
    )


@register(
    "events_hourly_tumbling",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time window aggregate — the batch twin of "
    "the streaming windowed agg (streaming/job.py); the reference has no "
    "notion of time at all (SURVEY.md §2.5)",
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value", "total_value"),
        )
    )


@register(
    "asof_last_click_before_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.event_id)
            FROM events c
            WHERE c.user_id = p.user_id
              AND c.event_type = 'click'
              AND c.ts <= p.ts) AS last_click_id
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="As-of join (latest click at-or-before each purchase, per user). "
    "Spark lacks a native as-of join; implemented as union + running "
    "last_value over (user_id, ts) — a single shuffle, no per-row probing. "
    "event_id is monotone in ts so MAX(event_id) == argmax(ts, event_id).",
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_tiebreak="click_id",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("click_id").alias("last_click_id")
    )


@register(
    "asof_next_error_after_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MIN(c.event_id)
            FROM events c
            WHERE c.user_id = p.user_id
              AND c.event_type = 'error'
              AND c.ts >= p.ts
              AND c.ts <= p.ts + INTERVAL '2 hours') AS next_error_id
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="FORWARD as-of join with tolerance (pandas merge_asof parity): "
    "the first error at-or-after each purchase, same user, within 2 "
    "hours — matches beyond tolerance are NULL. Same single-shuffle "
    "union + running-last plan as the backward direction, sorted "
    "descending. event_id is monotone in ts so MIN(event_id) == "
    "argmin(ts, event_id).",
)
def asof_next_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        errors,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_tiebreak="error_id",
        direction="forward",
        tolerance_sec=7200,
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("error_id").alias("next_error_id")
    )


@register(
    "asof_nearest_click_to_purchase",
    """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, ts AS cts FROM events
        WHERE event_type = 'click'
    ),
    cand AS (
        SELECT p.event_id, c.click_id,
               epoch_us(c.cts) - epoch_us(p.ts) AS delta_us,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY ABS(epoch_us(c.cts) - epoch_us(p.ts)) ASC,
                            (epoch_us(c.cts) > epoch_us(p.ts)) ASC,
                            CASE WHEN epoch_us(c.cts) <= epoch_us(p.ts)
                                 THEN -c.click_id
                                 ELSE c.click_id END ASC
               ) AS rn
        FROM p JOIN c USING (user_id)
    )
    SELECT p.event_id, p.user_id, p.ts,
           k.click_id AS nearest_click_id,
           k.delta_us
    FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k
      USING (event_id)
    """,
    doc="NEAREST-direction as-of join — the third member of the "
    "family (backward = asof_last_click_before_purchase, forward = "
    "asof_next_error_after_purchase; pandas merge_asof's three "
    "directions): per purchase, the same-user click closest in "
    "event time on EITHER side, ties to the earlier click (pandas "
    "semantics), equidistant same-side ties by the directional "
    "operator's own tie rules (backward: greatest id, forward: "
    "smallest). Composed from two runs of the union+running-window "
    "operator (operators/asof.py — one shuffle + one sort each, "
    "never a per-row range probe) merged on the purchase id; "
    "delta_us is the signed click-minus-purchase microsecond gap. "
    "The oracle replays it as a windowed rank over the per-user "
    "pair set — quadratic per user, which is why it is the ORACLE "
    "and the union trick is the engine.",
)
def asof_nearest_click_to_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stream_processing_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    # NULL-user clicks must match nothing: the union trick's window
    # PARTITIONs NULL keys together (they would match NULL-user
    # purchases), while SQL equi-join semantics drop them — filter
    # the right side so both agree (a NULL-user purchase still rides
    # through with a NULL match).
    clicks = events.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )

    def leg(direction: str, pre: str) -> DataFrame:
        return asof_join(
            purchases,
            clicks,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_tiebreak="click_id",
            direction=direction,
        ).select(
            "event_id",
            "user_id",
            "ts",
            F.col("click_id").alias(f"{pre}_id"),
            F.col("click_ts").alias(f"{pre}_ts"),
        )

    back = leg("backward", "b")
    fwd = leg("forward", "f").select("event_id", "f_id", "f_ts")
    m = back.join(fwd, "event_id")
    db = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    df_ = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    has_b = F.col("b_id").isNotNull()
    has_f = F.col("f_id").isNotNull()
    pick_b = has_b & (~has_f | (db <= df_))
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id"))
        .when(has_f, F.col("f_id"))
        .alias("nearest_click_id"),
        F.when(pick_b, -db)
        .when(has_f, df_)
        .cast("bigint")
        .alias("delta_us"),
    )
