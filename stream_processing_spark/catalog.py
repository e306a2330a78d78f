"""Table catalog: loaders + schema registry for the synthetic test tables.

The driver provides TPC-H-ish parquet tables at /root/testdata/sf*/
(see TESTDATA.md). The reference had no schema system at all (SURVEY.md
§1.2 — everything UTF-8 text); here every table has an explicit schema so
Catalyst can prune columns and push filters into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scans get column pruning + predicate pushdown
    from Catalyst for free — do NOT cache or materialize here.

    events.ts has shipped in two parquet layouts across driver testdata
    generations: TIMESTAMP(NANOS) (which Spark only reads via the
    nanosAsLong legacy flag) and plain TIMESTAMP micros (NTZ). Normalize
    both to a session-TZ TimestampType under a pinned UTC session so
    every downstream window/date_trunc query — and the DuckDB oracle,
    which reads naive timestamps — sees identical wall-clock values."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros()/cast yield a session-TZ timestamp; pin UTC so
        # window/date_trunc queries agree with the oracle's naive
        # timestamps even if the caller's session (e.g. the driver's
        # vanilla one) inherited a non-UTC system zone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long nanos: integer-divide to
            # micros — double division would lose precision on ~1.7e18
            # nanosecond values (53-bit mantissa)
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if ts_type == "timestamp_ntz":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        if ts_type != "timestamp":
            # a third footer layout must fail HERE, loudly, not later as
            # per-query oracle mismatches with no signal at load time
            raise TypeError(
                f"events.ts read as unexpected dtype {ts_type!r}; known "
                "layouts: bigint (TIMESTAMP(NANOS) via nanosAsLong), "
                "timestamp_ntz, timestamp — teach load_table the new "
                "testdata layout before running queries against it"
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works
    against the same names DuckDB uses in the oracle."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class Catalog:
    """Convenience handle: ``cat.lineitem`` etc."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)
