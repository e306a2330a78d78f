"""Semi-structured analytics on the VARIANT type (Spark 4).

The reference carries nested JSON as opaque strings inside the
``{key, value}`` envelope and re-parses per use in operator code
(src/Streaming/worker.py:52-58); ``parity.json_extract_props`` and
``relational5.map_functions_surface`` already cover the string-function
and typed-map paths. This module covers the third — and at 100 TB the
right — representation: parse ONCE into Spark's binary-encoded VARIANT
and do every subsequent access with ``variant_get`` path extraction.

Why this is the scale path: a string JSON column pays a full parse per
expression touching it; VARIANT parses once per row at ingest into a
binary form whose field access is an offset walk, and (with shredding
in the parquet writer) promotes hot paths to real columns that prune
and push down. The queries keep outputs integer/string-typed so the
DuckDB oracles (running plain JSON functions over the same strings)
hash-match exactly — the oracle checks the SEMANTICS of path
extraction, not the storage encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register


@register(
    "variant_typed_extract_stats",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Parse-once VARIANT ingestion of the props envelope, then typed "
    "path extraction feeding a grouped aggregate. The single parse_json "
    "is the only JSON cost in the plan; every reuse of the field is a "
    "binary path walk, not a re-parse — the representation a 100 TB "
    "event table should land in. Integer outputs, exact oracle.",
)
def variant_typed_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "variant_missing_path_semantics",
    """
    SELECT event_type,
           COUNT(*) AS n_total,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS n_k_present,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.absent') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_absent_null
    FROM events
    GROUP BY event_type
    """,
    doc="Missing-path semantics: try_variant_get on a path the document "
    "does not contain yields NULL (never an error), so schema drift in "
    "semi-structured data degrades to NULLs a query can count — the "
    "contract that lets one reader span documents with heterogeneous "
    "shapes. Both engines agree NULL-for-missing; the oracle proves it.",
)
def variant_missing_path_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.try_variant_get(v, "$.k", "bigint")).alias("n_k_present"),
        F.sum(
            F.when(
                F.try_variant_get(v, "$.absent", "bigint").isNull(), 1
            ).otherwise(0)
        ).alias("n_absent_null"),
    )


@register(
    "variant_nested_roundtrip_filter",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_f_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS cents_total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    doc="Construct→parse→extract roundtrip: rows are serialized to a "
    "NESTED json document (to_json of a struct-of-struct), parsed to "
    "VARIANT, then filtered and aggregated purely through variant_get "
    "paths ($.pay.st, $.pay.cents). The oracle computes the same answer "
    "from the base columns, proving the variant path pipeline is "
    "lossless for string/int payloads. Money rides as integer cents "
    "(doubles would round-trip through JSON text).",
)
def variant_nested_roundtrip_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderpriority").alias("prio"),
            F.struct(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .alias("cents"),
                F.col("o_orderstatus").alias("st"),
            ).alias("pay"),
        )
    )
    v = F.parse_json(doc)
    return (
        orders.select(
            F.variant_get(v, "$.prio", "string").alias("o_orderpriority"),
            F.variant_get(v, "$.pay.st", "string").alias("st"),
            F.variant_get(v, "$.pay.cents", "bigint").alias("cents"),
        )
        .filter(F.col("st") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_f_orders"),
            F.sum("cents").alias("cents_total"),
        )
    )


@register(
    "variant_array_path_access",
    """
    SELECT l_returnflag AS rf, COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS qty_cents,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS price_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Array-path extraction through VARIANT: each lineitem row is "
    "serialized to {rf, vals: [qty_cents, price_cents]}, parsed to "
    "variant, and read back ONLY via paths ($.rf, $.vals[0], "
    "$.vals[1]) feeding a grouped aggregate. Proves index-addressed "
    "array access inside variant documents is lossless; the oracle "
    "computes the same answer from the base columns. Completes the "
    "variant access surface: scalar fields, nested objects "
    "(variant_nested_roundtrip_filter), and arrays.",
)
def variant_array_path_access(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    doc = F.to_json(
        F.struct(
            F.col("l_returnflag").alias("rf"),
            F.array(
                (F.col("l_quantity").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                ),
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                ),
            ).alias("vals"),
        )
    )
    v = F.parse_json(doc)
    return (
        li.select(
            F.variant_get(v, "$.rf", "string").alias("rf"),
            F.variant_get(v, "$.vals[0]", "bigint").alias("q"),
            F.variant_get(v, "$.vals[1]", "bigint").alias("p"),
        )
        .groupBy("rf")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("q").alias("qty_cents"),
            F.sum("p").alias("price_cents"),
        )
    )
