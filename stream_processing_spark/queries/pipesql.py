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
