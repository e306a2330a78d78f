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
