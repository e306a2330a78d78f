"""SQL pipe syntax (|> operators, Spark 4).

One oracle-gated query written in Spark's pipe syntax — the linear
FROM → WHERE → AGGREGATE → SELECT dataflow form — proving the engine's
modern SQL entry point computes identically to the classic form (the
DuckDB oracle is the standard-SQL spelling of the same query). Pipe
stages parse into the same Catalyst plan as nested SELECTs, so there
is no performance dimension here; this is surface parity for users who
write pipeline-shaped SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register


@register(
    "pipe_syntax_lineitem_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Q1's core rollup written in SQL PIPE SYNTAX (FROM |> WHERE "
    "|> AGGREGATE ... GROUP BY |> SELECT): same Catalyst plan as the "
    "classic spelling, verified value-identical against the standard-"
    "SQL oracle. Decimal-cast sums keep the aggregation order-"
    "independent, as everywhere in the registry.",
)
def pipe_syntax_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "pipe_lineitem"
    )
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate <= DATE '1998-09-01'
        |> AGGREGATE COUNT(*) AS n_rows,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS p
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_rows,
                  CAST(q AS DOUBLE) AS sum_qty,
                  CAST(p AS DOUBLE) AS sum_price
        """
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey,
       CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM {customer} c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
"""


@register(
    "lateral_top2_orders_per_customer",
    _LATERAL_SQL.format(customer="customer", orders="orders"),
    doc="Correlated LATERAL subquery: each BUILDING customer's top-2 "
    "orders by price (deterministic tie-break). Catalyst decorrelates "
    "this into the same ranked-window/join shape as "
    "window_top3_orders_per_customer — the point of the entry is that "
    "the CORRELATED spelling, which users write naturally, reaches an "
    "identical distributed plan rather than a per-customer nested "
    "loop. Identical SQL runs on both engines.",
)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        _LATERAL_SQL.format(customer="lat_customer", orders="lat_orders")
    )


_GBA_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
FROM {orders}
GROUP BY ALL
"""


@register(
    "group_by_all_status_priority",
    _GBA_SQL.format(orders="orders"),
    doc="GROUP BY ALL (Spark 4 / DuckDB shared dialect): every "
    "non-aggregate select item becomes a grouping key — the "
    "resilient-to-refactor spelling analysts actually use. Same "
    "aggregate discipline as everywhere (decimal-cast sums).",
)
def group_by_all_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gba_orders")
    return spark.sql(_GBA_SQL.format(orders="gba_orders"))
