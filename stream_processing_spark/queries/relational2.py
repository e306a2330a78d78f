"""Second wave of relational coverage: min-per-group with join-back,
conditional-aggregation pivot, percentiles, date parts, string function
surface, ordered list aggregation, CASE bucketing, CUBE, and the
spark.sql entry point (shared-ANSI text running verbatim on both
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table, register_views
from stream_processing_spark.queries import register
from stream_processing_spark.queries._util import dsum


@register(
    "q2_cheapest_supplier_per_nation",
    """
    SELECT s.s_nationkey, s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN (
        SELECT s_nationkey, MIN(s_acctbal) AS min_bal
        FROM supplier GROUP BY s_nationkey
    ) m ON s.s_nationkey = m.s_nationkey AND s.s_acctbal = m.min_bal
    """,
    doc="TPC-H Q2-shaped min-per-group + join-back (all suppliers tied "
    "at the minimum are kept — deliberately, like Q2)",
)
def q2_cheapest_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    # window min avoids the self-join: one shuffle on the group key
    w = Window.partitionBy("s_nationkey")
    return (
        supp.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot via conditional aggregation (engine-portable spelling of "
    "df.groupBy().pivot()); single shuffle",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [
        F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{s.lower()}")
        for s in ("F", "O", "P")
    ]
    return orders.groupBy("o_orderpriority").agg(*aggs)


@register(
    "agg_percentiles_price",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
    "DuckDB quantile_cont; rounded to absorb float noise)",
)
def agg_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


@register(
    "date_parts_order_volume",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mon,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Calendar rollup by (year, month) — date-part extraction surface",
)
def date_parts_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total"),
    )


@register(
    "string_functions_surface",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           replace(c_name, '#', '-') AS name_dashed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           trim('  ' || c_name || ' ') AS name_trim
    FROM customer
    """,
    doc="Scalar string-function surface (the reference has NO built-in "
    "functions at all — SURVEY.md §2.2: 'anything is arbitrary Python')",
)
def string_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    key_str = F.col("c_custkey").cast("string")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.lpad(key_str, 10, "0").alias("key_padded"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
    )


@register(
    "regexp_functions_surface",
    """
    SELECT doc_id,
           regexp_extract(text, 'ta(bl)e', 1) AS grp_extract,
           len(regexp_extract_all(text, 'scan|merge')) AS n_matches,
           regexp_replace(substr(text, 1, 60), '[aeiou]', '*', 'g')
               AS vowels_masked,
           CASE WHEN regexp_matches(text, '^key ') THEN 1 ELSE 0 END
               AS starts_with_key
    FROM documents
    """,
    doc="Regex scalar surface: group extraction, match counting, global "
    "replace, anchored match — grep beyond line-level (the reference "
    "shells out to grep for ALL regex work, LogQuerier/server.py:30)",
)
def regexp_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "ta(bl)e", 1).alias("grp_extract"),
        F.regexp_count("text", F.lit("scan|merge")).cast("bigint").alias("n_matches"),
        F.regexp_replace(F.substring("text", 1, 60), "[aeiou]", "*").alias(
            "vowels_masked"
        ),
        F.when(F.col("text").rlike("^key "), 1).otherwise(0).alias("starts_with_key"),
    )


@register(
    "datetime_functions_surface",
    """
    WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
    SELECT o_orderkey,
           CAST(d + INTERVAL 7 DAY AS DATE) AS d_plus7,
           date_diff('day', DATE '1995-01-01', d) AS days_since_95,
           last_day(d) AS month_end,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           isodow(d) AS iso_weekday,
           CAST(weekofyear(d) AS BIGINT) AS iso_week,
           CAST(quarter(d) AS BIGINT) AS qtr
    FROM o
    """,
    doc="Date arithmetic surface: offsets, diffs, boundary snapping, ISO "
    "calendar parts — all JVM-side (no UDFs), all pruned to a "
    "2-column scan",
)
def datetime_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 7).alias("d_plus7"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since_95"
        ),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        (F.weekday(d) + 1).cast("bigint").alias("iso_weekday"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.quarter(d).cast("bigint").alias("qtr"),
    )


@register(
    "agg_ordered_list",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    doc="Ordered list aggregation surfaced as a string (array renderings "
    "differ across engines; the joined string is portable)",
)
def agg_ordered_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations")
    )


@register(
    "case_bucketing_acctbal",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY 1
    """,
    doc="CASE-based bucketing + grouped agg",
)
def case_bucketing_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return cust.groupBy(bucket.alias("bal_bucket")).agg(
        F.count(F.lit(1)).alias("n"), dsum("c_acctbal", "total_bal")
    )


@register(
    "agg_cube_events",
    """
    SELECT event_type, user_id % 10 AS user_mod, COUNT(*) AS cnt
    FROM events
    GROUP BY CUBE (event_type, user_id % 10)
    """,
    doc="CUBE grouping sets over the events stream table",
)
def agg_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_type", (F.col("user_id") % 10).alias("user_mod"))
        .cube("event_type", "user_mod")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# TPC-H Q4-shaped: one ANSI string, executed VERBATIM by both engines —
# the spark.sql entry point is first-class, not a translation layer.
_Q4_SHARED_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
      )
    GROUP BY o_orderpriority
"""


@register(
    "sql_q4_order_priority",
    _Q4_SHARED_SQL,
    doc="TPC-H Q4-shaped via spark.sql on registered views — the SAME "
    "ANSI text is the oracle; demonstrates the general SQL entry point "
    "(SURVEY.md §7.2 step 7)",
)
def sql_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SHARED_SQL)
