"""Distributed grep (LogQuerier parity, SURVEY.md §2.6).

The reference fans out one TCP thread per machine and shells out to grep
with the client's raw arguments (src/LogQuerier/client.py:113-152,
src/LogQuerier/server.py:30-33 — so -i/-v/-c/-n/-w/-x/-F/-A/-B all
work). On Spark the fan-out *is* the partitioned scan: one `read.text`
over a glob, `input_file_name()` as the machine identity, `rlike` as the
regex engine. No custom scheduling; the filter runs inside whole-stage
codegen.

Flag support and the scale story:
- -i / -v / -F / -w / -x are pure predicate rewrites — still a single
  codegen'd scan+filter, zero shuffle.
- -n / -A / -B need per-file line order. Spark rows carry no intrinsic
  order, so the scan materializes (input_file_block_start(),
  monotonically_increasing_id()) AT READ TIME: block start is the
  in-file byte offset of the split and the id is increasing in read
  order within a split, so ordering by (offset, id) within each file
  reconstructs exact file order for ANY split layout — including files
  larger than one split and many small files packed into one partition.
  Line numbers and context flags then cost exactly one shuffle
  (window partitioned by file), which is the minimum possible: a
  global per-file numbering is inherently an exchange.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _lines(spark: SparkSession, path_glob: str) -> DataFrame:
    return (
        spark.read.text(path_glob)
        # element_at(split(...), -1) = basename, matching the reference's
        # "machine.{id}.log: " prefix (src/LogQuerier/server.py:30-33).
        # __path keeps the FULL path as the file identity: two files with
        # the same basename in different directories must not share a
        # numbering partition.
        .withColumn("__path", F.input_file_name())
        .withColumn("source_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        # file-order witnesses — MUST be evaluated at scan time (both
        # functions return garbage after an exchange)
        .withColumn("__off", F.input_file_block_start())
        .withColumn("__id", F.monotonically_increasing_id())
    )


def compile_pattern(
    pattern: str,
    ignore_case: bool = False,
    fixed: bool = False,
    word: bool = False,
    line: bool = False,
) -> str:
    """grep flag semantics as a single regex (portable Java/RE2 subset:
    \\b word boundaries and inline (?i), no lookarounds).

    fixed → -F (literal), word → -w, line → -x, ignore_case → -i.
    """
    pat = re.escape(pattern) if fixed else pattern
    if word:
        pat = rf"\b(?:{pat})\b"
    if line:
        pat = rf"^(?:{pat})$"
    if ignore_case:
        pat = f"(?i){pat}"
    return pat


def dgrep(
    spark: SparkSession,
    pattern: str,
    path_glob: str,
    ignore_case: bool = False,
    invert: bool = False,
    word: bool = False,
    line: bool = False,
    fixed: bool = False,
    line_numbers: bool = False,
    after: int = 0,
    before: int = 0,
) -> DataFrame:
    """Matched lines with their source file — `grep` over all logs.

    invert → -v, line_numbers → -n (adds a 1-based ``line_no`` column),
    after/before → -A/-B context lines (context is measured around
    SELECTED lines, i.e. after -v if given, exactly like grep).
    """
    pat = compile_pattern(pattern, ignore_case, fixed, word, line)
    df = _lines(spark, path_glob)
    sel = F.col("value").rlike(pat)
    if invert:
        sel = ~sel

    if not (line_numbers or after or before):
        return df.filter(sel).select("source_file", "value")

    w = Window.partitionBy("__path").orderBy("__off", "__id")
    df = df.withColumn("line_no", F.row_number().over(w)).withColumn(
        "__sel", sel.cast("int")
    )
    keep = F.col("__sel") == 1
    if after:  # a selected line at m prints m..m+A → look back A rows
        df = df.withColumn("__a", F.max("__sel").over(w.rowsBetween(-after, 0)))
        keep = keep | (F.col("__a") == 1)
    if before:  # a selected line at m prints m-B..m → look ahead B rows
        df = df.withColumn("__b", F.max("__sel").over(w.rowsBetween(0, before)))
        keep = keep | (F.col("__b") == 1)
    cols = ["source_file"] + (["line_no"] if line_numbers else []) + ["value"]
    return df.filter(keep).select(*cols)


def dgrep_count(
    spark: SparkSession,
    pattern: str,
    path_glob: str,
    ignore_case: bool = False,
    invert: bool = False,
    word: bool = False,
    line: bool = False,
    fixed: bool = False,
) -> DataFrame:
    """`grep -c` mode: per-file match counts (reference:
    src/LogQuerier/client.py:103-111). Counts SELECTED lines (grep -c
    ignores context flags). The cluster TOTAL is `df.agg(sum(...))` —
    computed by the caller (cli.py prints it like client.py:151-152).
    """
    pat = compile_pattern(pattern, ignore_case, fixed, word, line)
    df = _lines(spark, path_glob)
    sel = F.col("value").rlike(pat)
    if invert:
        sel = ~sel
    return (
        df.groupBy("source_file")
        .agg(F.sum(sel.cast("long")).alias("match_count"))
        .orderBy("source_file")
    )
