"""Distributed grep (LogQuerier parity, SURVEY.md §2.6).

The reference fans out one TCP thread per machine and shells out to grep
(src/LogQuerier/client.py:113-152, src/LogQuerier/server.py:10-36). On
Spark the fan-out *is* the partitioned scan: one `read.text` over a glob,
`input_file_name()` as the machine identity, `rlike` as the regex engine.
No custom scheduling; filter runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _lines(spark: SparkSession, path_glob: str) -> DataFrame:
    return (
        spark.read.text(path_glob)
        # element_at(split(...), -1) = basename, matching the reference's
        # "machine.{id}.log: " prefix (src/LogQuerier/server.py:30-33)
        .withColumn("source_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
    )


def dgrep(
    spark: SparkSession,
    pattern: str,
    path_glob: str,
    ignore_case: bool = False,
) -> DataFrame:
    """Matched lines with their source file — `grep <pat>` over all logs."""
    pat = f"(?i){pattern}" if ignore_case else pattern
    df = _lines(spark, path_glob)
    return df.filter(F.col("value").rlike(pat)).select("source_file", "value")


def dgrep_count(
    spark: SparkSession,
    pattern: str,
    path_glob: str,
    ignore_case: bool = False,
) -> DataFrame:
    """`grep -c` mode: per-file match counts (reference:
    src/LogQuerier/client.py:103-111). The cluster TOTAL is
    `df.agg(sum(...))` — computed by the caller or via `total=True`.
    """
    pat = f"(?i){pattern}" if ignore_case else pattern
    df = _lines(spark, path_glob)
    return (
        df.groupBy("source_file")
        .agg(F.sum(F.col("value").rlike(pat).cast("long")).alias("match_count"))
        .orderBy("source_file")
    )
