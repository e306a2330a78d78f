"""Relational wave 5: unpivot/melt, FILTER-clause aggregation, explicit
GROUPING SETS with grouping_id, null-handling surface, and map/JSON
structure ops — the remaining ANSI-surface breadth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register
from stream_processing_spark.queries._util import dec, dsum


@register(
    "unpivot_customer_measures",
    """
    SELECT c_custkey, measure, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS value FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ) u
    """,
    doc="Unpivot (wide → long): DataFrame unpivot/melt compiles to a "
    "single Expand node (one scan, rows×measures output) — not the "
    "UNION ALL of N scans the oracle spells out",
)
def unpivot_customer_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return cust.unpivot(
        ids="c_custkey",
        values=["acctbal", "nationkey"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "agg_filter_clause",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Filtered aggregation (ANSI FILTER clause ≡ conditional agg): "
    "three aggregates over one scan instead of three scans; Spark "
    "expresses the filter as when()-conditional inputs, same plan shape",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 100000, dec("o_totalprice")))
        .cast("double")
        .alias("big_total"),
    )


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (neither rollup nor cube) + grouping_id "
    "to disambiguate the NULL-as-total rows from genuine NULLs; one "
    "Expand + one grouped agg, not three scans",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "null_handling_surface",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END,
                    0.0) AS bal_filled,
           (c_acctbal IS NULL) AS bal_was_null
    FROM customer
    """,
    doc="Null-handling surface: NULLIF / COALESCE / null-injecting CASE "
    "/ IS NULL — all whole-stage-codegen expressions, no UDFs",
)
def null_handling_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal_nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return cust.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_other"),
        bal_nonneg.alias("bal_nonneg"),
        F.coalesce(bal_nonneg, F.lit(0.0)).alias("bal_filled"),
        F.col("c_acctbal").isNull().alias("bal_was_null"),
    )


@register(
    "window_lead_lag_events",
    """
    SELECT event_id, user_id,
           CAST(FLOOR(EXTRACT(EPOCH FROM ts - LAG(ts) OVER w)) AS BIGINT)
               AS gap_sec,
           LEAD(event_type) OVER w AS next_type,
           NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id)
               AS value_quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lead/lag/ntile window surface: inter-event gap seconds, next "
    "event type, per-user value quartile — one shuffle on user_id "
    "shared by all three (same partition key), total (ts, event_id) "
    "order makes every offset function deterministic",
)
def window_lead_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wq = Window.partitionBy("user_id").orderBy("value", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return events.select(
        "event_id",
        "user_id",
        F.floor(gap / 1_000_000).cast("bigint").alias("gap_sec"),
        F.lead("event_type").over(w).alias("next_type"),
        F.ntile(4).over(wq).alias("value_quartile"),
    )


@register(
    "join_full_outer_daily",
    """
    WITH p AS (
        SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    e AS (
        SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT COALESCE(p.day, e.day) AS day,
           COALESCE(n_purchases, 0) AS n_purchases,
           COALESCE(n_errors, 0) AS n_errors
    FROM p FULL OUTER JOIN e ON p.day = e.day
    """,
    doc="Full outer join of two daily aggregates with COALESCE'd keys — "
    "days present on either side survive; the join inputs are already "
    "reduced (agg-before-join), so the outer join shuffles day-level "
    "rows, not events",
)
def join_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def daily(etype: str, alias: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == etype)
            .groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    p = daily("purchase", "n_purchases")
    e = daily("error", "n_errors")
    return (
        p.join(e, p.day == e.day, "full_outer")
        .select(
            F.coalesce(p.day, e.day).alias("day"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
        )
    )


@register(
    "agg_mode_priority",
    """
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    )
    WHERE rn = 1
    """,
    doc="Mode (most frequent value) per group via count + row_number "
    "with a total tie-break — the deterministic form of mode(), which "
    "engines otherwise tie-break arbitrarily",
)
def agg_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


@register(
    "array_functions_surface",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS min_val,
           len(list_filter(embedding, v -> v > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 50
    """,
    doc="Array/higher-order function surface over the embedding column: "
    "size, element access, max, sort, lambda filter — all JVM-side "
    "(no UDF), the building blocks the similarity ops compose",
)
def array_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.round(F.element_at(e, 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max(e).cast("double"), 6).alias("max_val"),
        F.round(F.element_at(F.array_sort(e), 1).cast("double"), 6).alias("min_val"),
        F.size(F.filter(e, lambda v: v > 0)).alias("n_positive"),
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 customer order-count distribution: outer join → "
    "per-customer count → histogram of counts. Two shuffles by "
    "necessity (different keys); the second input is one row per "
    "customer, already reduced",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "sort_global_orders_sample",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_totalprice > 450000
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    doc="True global sort (no LIMIT → range-partitioned Exchange + "
    "per-partition sort, Spark's TeraSort shape) over a selective "
    "filter; at 100 TB the filter prunes first so the range exchange "
    "carries only qualifying rows. The hash compare is order-blind — "
    "this entry exists to keep the global-sort path exercised.",
)
def sort_global_orders_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 450000)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@register(
    "map_functions_surface",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           len(json_keys(props)) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
    doc="JSON → typed structure ops: from_json into a map column, key "
    "cardinality, typed element access — the schema-on-read path for "
    "semi-structured props at scale (parse once, then native map ops)",
)
def map_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return events.select(
        "event_id",
        m.getItem("k").alias("k_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        (m.getItem("k") % 10).alias("k_bucket"),
    )


@register(
    "window_rank_surface",
    """
    SELECT o_orderkey, o_orderstatus,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
    """,
    doc="Rank-family window surface under REAL ties (2-decimal prices "
    "collide): rank/dense_rank/percent_rank/cume_dist depend only on "
    "the ordering key values, so they are deterministic without a "
    "tie-breaker — unlike row_number. One shuffle on the partition key.",
)
def window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "grouped_minmax_norm_pandas",
    """
    SELECT o_orderkey, o_orderstatus,
           (o_totalprice - MIN(o_totalprice) OVER w)
           / NULLIF(MAX(o_totalprice) OVER w - MIN(o_totalprice) OVER w, 0)
               AS price_norm
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus)
    """,
    doc="Grouped-map applyInPandas (§2.8 UDAF surface, batch twin of the "
    "stateful harness): per-status min-max normalization inside an "
    "Arrow-batched pandas function. Hash-matches the window-function "
    "oracle because min/max are order-independent and both engines run "
    "the identical IEEE double ops (x-lo)/(hi-lo). Groups shuffle once "
    "on the grouping key; a skewed group serializes - for hot keys "
    "prefer the window-function form, which partial-aggregates.",
)
def grouped_minmax_norm_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        lo = pdf["o_totalprice"].min()
        hi = pdf["o_totalprice"].max()
        if hi == lo:
            pdf["price_norm"] = None
        else:
            pdf["price_norm"] = (pdf["o_totalprice"] - lo) / (hi - lo)
        return pdf[["o_orderkey", "o_orderstatus", "price_norm"]]

    return orders.groupBy("o_orderstatus").applyInPandas(
        norm, "o_orderkey long, o_orderstatus string, price_norm double"
    )


@register(
    "groupwise_latest_order",
    """
    SELECT o_custkey, last_date, last_key
    FROM (
        SELECT o_custkey, o_orderdate AS last_date, o_orderkey AS last_key,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC)
                   AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    doc="Groupwise-max via max(struct(ts, key)): lexicographic struct max "
    "is a PARTIAL-AGGREGABLE reduction - each map task pre-reduces to "
    "one row per group before the shuffle, so the exchange carries "
    "|groups| rows instead of every order (the window row_number "
    "formulation the oracle uses must shuffle+sort ALL rows). The "
    "key in the struct makes the tie-break total.",
)
def groupwise_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("m"))
        .select(
            "o_custkey",
            F.col("m.o_orderdate").alias("last_date"),
            F.col("m.o_orderkey").alias("last_key"),
        )
    )


@register(
    "set_except_all_priorities",
    """
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL multiset semantics: each priority survives with "
    "(count-in-O minus count-in-F) multiplicity - the bag-difference "
    "the reference's merge/concat storage model implies but never "
    "exposes as an operator. Plans as a count-diff aggregate, not a "
    "row-by-row anti join.",
)
def set_except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return o.exceptAll(f)


@register(
    "agg_stddev_per_status",
    """
    WITH s AS (
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
                        * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx
        FROM orders GROUP BY 1
    )
    SELECT o_orderstatus, n,
           ROUND((sxx - sx * sx / n) / (n - 1), 4) AS var_samp_price,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_price
    FROM s
    """,
    doc="Per-group sample variance/stddev from decimal-exact moments "
    "(count, sum, sum-of-squares) + one closed-form double expression - "
    "same pattern as agg_corr_price_qty, grouped. Engines' stddev() "
    "accumulators are order-dependent; this is order-independent and "
    "map-side partial-aggregable.",
)
def agg_stddev_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.queries._util import dec

    orders = load_table(spark, sf_dir, "orders")
    x = dec("o_totalprice")
    s = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    return s.select(
        "o_orderstatus",
        "n",
        F.round(var, 4).alias("var_samp_price"),
        F.round(F.sqrt(var), 4).alias("stddev_price"),
    )


@register(
    "union_by_name_entities",
    """
    SELECT c_custkey AS ent_id, 'customer' AS etype, c_name AS name,
           c_acctbal AS bal, c_mktsegment AS segment
    FROM customer
    UNION ALL BY NAME
    SELECT s_suppkey AS ent_id, 'supplier' AS etype, s_name AS name,
           s_acctbal AS bal, s_nationkey AS nationkey
    FROM supplier
    """,
    doc="Schema-drift union: UNION ALL BY NAME / "
    "unionByName(allowMissingColumns=True) aligns by column NAME and "
    "null-fills the disjoint tail (segment only on customers, "
    "nationkey only on suppliers) - positional UNION would silently "
    "mix columns. How heterogeneous source generations coexist in one "
    "scan at scale.",
)
def union_by_name_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ent_id"),
        F.lit("customer").alias("etype"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("segment"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("ent_id"),
        F.lit("supplier").alias("etype"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("bal"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


@register(
    "safe_cast_surface",
    """
    SELECT doc_id,
           TRY_CAST(string_split(text, ' ')[1] AS BIGINT) AS first_tok_int,
           TRY_CAST(lang AS DOUBLE) AS lang_as_num,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS n_chars_rt,
           COALESCE(TRY_CAST(string_split(text, ' ')[1] AS BIGINT), -1)
               AS first_tok_filled
    FROM documents
    """,
    doc="Error-safe parsing surface: TRY_CAST / try_cast yields NULL "
    "instead of failing the job on malformed values - at 100 TB a "
    "single bad row must never kill the scan (ANSI mode makes plain "
    "CAST throw). Word tokens and language tags parse to NULL, the "
    "numeric round-trip survives.",
)
def safe_cast_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    first_tok = F.split("text", " ").getItem(0)
    return docs.select(
        "doc_id",
        first_tok.try_cast("bigint").alias("first_tok_int"),
        F.col("lang").try_cast("double").alias("lang_as_num"),
        F.col("n_chars").cast("string").try_cast("bigint").alias("n_chars_rt"),
        F.coalesce(first_tok.try_cast("bigint"), F.lit(-1)).alias(
            "first_tok_filled"
        ),
    )


@register(
    "sql_udf_disc_revenue",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) -
                     CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS disc_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="SQL scalar UDF surface (Spark 4 CREATE FUNCTION ... RETURN "
    "expr): the discounted-revenue term packaged as a declarative SQL "
    "function instead of a Python UDF — Catalyst INLINES the body into "
    "the plan, so the aggregate stays whole-stage-codegen JVM-side "
    "with zero serialization (the exact opposite of the row-Python "
    "path plan-lint forbids). The body mirrors REVENUE_SQL's decimal "
    "spelling, hence bit-identical sums; the oracle is the inlined "
    "expression.",
)
def sql_udf_disc_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sqludf_lineitem"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(17,4)
        RETURN CAST(p AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2)))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(disc_rev(l_extendedprice, l_discount)) AS DOUBLE)
                   AS disc_revenue
        FROM sqludf_lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "collation_lcase_group",
    """
    WITH mixed AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer
    )
    SELECT lower(seg) AS seg, COUNT(*) AS n
    FROM mixed
    GROUP BY lower(seg)
    """,
    doc="String collation surface (Spark 4.0): grouping under "
    "UTF8_LCASE makes case-insensitivity a PROPERTY OF THE COMPARISON "
    "(hash/sort keys derive from the collation), not an expression "
    "rewrite — at scale that matters because the shuffle key is the "
    "collated value itself. The fixture mixes case by key parity; the "
    "group key is projected through lower() and cast back to a "
    "default-collation string so both engines emit one canonical row "
    "per case-insensitive class. Oracle = the classic lower() rewrite, "
    "which is the collation's equivalence class on this data.",
)
def collation_lcase_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "coll_customer"
    )
    return spark.sql(
        """
        WITH mixed AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                        ELSE lower(c_mktsegment) END AS seg
            FROM coll_customer
        )
        SELECT CAST(lower(seg COLLATE UTF8_LCASE) AS STRING) AS seg,
               COUNT(*) AS n
        FROM mixed
        GROUP BY seg COLLATE UTF8_LCASE
        """
    )


@register(
    "sql_variables_param_filter",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_totalprice > 150000.0
    GROUP BY o_orderstatus
    """,
    doc="SQL session variables (Spark 4 DECLARE/SET VARIABLE): the "
    "price floor is bound as a typed session variable and referenced "
    "by name in the query — the parameterized-query surface that "
    "replaces string interpolation (and its injection risk) for "
    "dashboard-style repeated queries. Catalyst constant-folds the "
    "variable at plan time, so the predicate still pushes down to the "
    "parquet scan exactly as a literal would. Oracle = the same query "
    "with the value inlined.",
)
def sql_variables_param_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "var_orders"
    )
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql("SET VARIABLE price_floor = 150000.0")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_price
        FROM var_orders
        WHERE o_totalprice > price_floor
        GROUP BY o_orderstatus
        """
    )


@register(
    "jsonl_source_counts",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="JSON-lines source path end-to-end (the reference reads "
    "text/naive-CSV only; SURVEY §2.1 notes the format breadth here): "
    "orders staged as JSONL, read back with an EXPLICIT schema (schema "
    "inference at 100 TB is a full extra scan — never rely on it), "
    "then aggregated. Doubles survive the text roundtrip exactly "
    "(shortest-roundtrip serialization), proven by the decimal-sum "
    "hash against the parquet-sourced oracle.",
)
def jsonl_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    d = tempfile.mkdtemp(prefix="jsonl_src_")
    src.write.mode("overwrite").json(d)
    back = spark.read.schema(
        "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    ).json(d)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "orc_roundtrip_digest",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="ORC source/sink path end-to-end: lineitem measures staged as "
    "ORC (the columnar format Spark ships beside parquet — relevant "
    "wherever Hive-era estates feed the pipeline), read back and "
    "aggregated; binary column storage makes the roundtrip bit-exact, "
    "proven against the parquet-sourced oracle.",
)
def orc_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    src = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    d = tempfile.mkdtemp(prefix="orc_src_")
    src.write.mode("overwrite").orc(d)
    back = spark.read.schema("l_returnflag string, l_quantity double").orc(d)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


@register(
    "pandas_api_status_revenue",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="pandas-on-Spark API tier (pyspark.pandas): the same "
    "status-revenue rollup expressed as df.pandas_api().groupby(...)"
    ".agg(...) — the migration surface for pandas codebases. The "
    "pandas spelling compiles to the identical hash-aggregate plan "
    "(no Python execution, no index materialization on this path), "
    "and decimal dtypes survive the API round-trip, so the sums stay "
    "exact — proven by the hash match against the plain-SQL oracle.",
)
def pandas_api_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    out = (
        df.pandas_api()
        .groupby("o_orderstatus", as_index=False)
        .agg(n=("p", "count"), total=("p", "sum"))
        .to_spark()
    )
    return out.select(
        "o_orderstatus",
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("double").alias("total_price"),
    )
