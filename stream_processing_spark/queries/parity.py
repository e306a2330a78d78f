"""Reference-parity queries (SURVEY.md §2.2, §2.3, §2.6).

Each query reproduces one reference operator's semantics over the
driver-provided tables: T1 regex filter, T2 positional projection,
T3 fused filter+project, T4 equality filter, T5/T6 count-by-key,
A2/G1-G3 distributed-grep counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register

# A pattern with hits in the synthetic documents vocabulary.
GREP_PATTERN = "merge .* sort|scan"


@register(
    "t1_filter_pattern",
    f"""
    SELECT doc_id, text
    FROM documents
    WHERE regexp_matches(text, '{GREP_PATTERN}')
    """,
    doc="T1 regex filter (reference tests/sample1_op1.py:8-13)",
)
def t1_filter_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(GREP_PATTERN)).select("doc_id", "text")


@register(
    "t2_select_columns",
    """
    SELECT doc_id,
           split_part(text, ' ', 1) AS w0,
           split_part(text, ' ', 3) AS w2
    FROM documents
    """,
    doc="T2 positional projection (reference tests/sample1_op2.py:7-14)",
)
def t2_select_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        toks.getItem(0).alias("w0"),
        toks.getItem(2).alias("w2"),
    )


@register(
    "t3_filter_project",
    f"""
    SELECT doc_id,
           split_part(text, ' ', 1) AS w0,
           lang
    FROM documents
    WHERE regexp_matches(text, '{GREP_PATTERN}')
    """,
    doc="T3 fused filter+project (reference tests/mp4_demo1.py:8-13); "
    "Catalyst fuses these into one whole-stage-codegen span automatically",
)
def t3_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(GREP_PATTERN)).select(
        "doc_id", F.split(F.col("text"), " ").getItem(0).alias("w0"), "lang"
    )


@register(
    "t4_filter_eq",
    """
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase'
    """,
    doc="T4 equality filter (reference tests/sample2_op1.py:8-14); "
    "pushed down into the parquet scan",
)
def t4_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )


@register(
    "t5_count_by_category",
    """
    SELECT lang AS category, COUNT(*) AS cnt
    FROM documents
    GROUP BY lang
    """,
    doc="T5 stateful count-by-category, final values "
    "(reference tests/sample2_op2.py:8-17); map-side partial agg + "
    "one shuffle on the group key",
)
def t5_count_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.col("lang").alias("category")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "t6_word_count",
    """
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
    doc="T6 running count per key, final values "
    "(reference tests/mp4_demo2.py:6-10) — the word-count pattern",
)
def t6_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "grep_count_by_source",
    f"""
    SELECT source, COUNT(*) AS match_count
    FROM documents
    WHERE regexp_matches(text, '{GREP_PATTERN}')
    GROUP BY source
    """,
    doc="A2/G3 distributed grep -c: per-source match counts "
    "(reference src/LogQuerier/client.py:103-111); the TCP fan-out "
    "collapses into one partitioned scan + grouped count",
)
def grep_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(GREP_PATTERN))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("match_count"))
    )


@register(
    "grep_total_count",
    f"""
    SELECT COUNT(*) AS total_matches
    FROM documents
    WHERE regexp_matches(text, '{GREP_PATTERN}')
    """,
    doc="A2 cluster-total grep count (reference src/LogQuerier/client.py:151-152)",
)
def grep_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(GREP_PATTERN)).agg(
        F.count(F.lit(1)).alias("total_matches")
    )


@register(
    "grep_case_insensitive",
    """
    SELECT source, COUNT(*) AS match_count
    FROM documents
    WHERE regexp_matches(text, '(?i)SCAN|MERGE')
    GROUP BY source
    """,
    doc="G2 grep -i parity: case-insensitive regex ((?i) inline flag — "
    "identical syntax in Spark's rlike and DuckDB's regexp_matches), "
    "per-source counts",
)
def grep_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike("(?i)SCAN|MERGE"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("match_count"))
    )


@register(
    "grep_invert_count",
    """
    SELECT source, COUNT(*) AS n_unmatched
    FROM documents
    WHERE NOT regexp_matches(text, 'SCAN|MERGE')
    GROUP BY source
    """,
    doc="G2 grep -v parity: inverted match — per-source counts of lines "
    "NOT matching the pattern",
)
def grep_invert_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(~F.col("text").rlike("SCAN|MERGE"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_unmatched"))
    )


@register(
    "json_extract_props",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE event_type = 'click'
    """,
    doc="JSON field extraction from the props envelope — the reference's "
    "nested-JSON-string values (src/Streaming/worker.py:52-58) as a "
    "first-class typed extraction",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "click").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


def _user_token_stats(key: str, value: str) -> list[tuple[str, str]]:
    """A genuinely user-defined record op — NOT in plans.rainstorm's
    OP_LIBRARY — following the reference contract fn(key, value) ->
    list[(k', v')] (src/Streaming/framework.py:11-65)."""
    toks = value.split(" ")
    return [(toks[0], str(len(toks)))]


@register(
    "t7_custom_flatmap",
    """
    SELECT split_part(text, ' ', 1) AS key,
           CAST(len(string_split(text, ' ')) AS VARCHAR) AS value
    FROM documents
    """,
    doc="T7 arbitrary-operator parity: a user fn(key, value) -> "
    "list[(k,v)] that is NOT in the op library, run Arrow-batched "
    "through transforms.flat_map (mapInPandas) over the {key, value} "
    "envelope — the same path `cli rainstorm \"udf file.py:fn\"` "
    "submits (plans/rainstorm.py parse_op).",
)
def t7_custom_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.operators import transforms as T

    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )
    return T.flat_map(kv, _user_token_stats)


@register(
    "grep_word_anchor_count",
    r"""
    SELECT source, COUNT(*) AS n_matched
    FROM documents
    WHERE regexp_matches(text, '\b(?:scan|merge)\b')
    GROUP BY source
    """,
    doc="G2 `grep -w` parity: word-anchored match via \\b boundaries "
    "(portable Java-regex/RE2 subset — sources/grep.py "
    "compile_pattern(word=True)); per-source counts of lines containing "
    "'scan' or 'merge' as whole words.",
)
def grep_word_anchor_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.sources.grep import compile_pattern

    pat = compile_pattern("scan|merge", word=True)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(pat))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


@register(
    "grep_fixed_literal_count",
    """
    SELECT source,
           CAST(SUM(CASE WHEN regexp_matches(text, 'scan.merge')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_as_regex,
           CAST(SUM(CASE WHEN contains(text, 'scan.merge')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed
    FROM documents
    GROUP BY source
    """,
    doc="G2 `grep -F` parity: the same pattern 'scan.merge' counted as a "
    "regex (the '.' matches the space in 'scan merge' -> hits) and as a "
    "-F literal (compile_pattern(fixed=True) re.escape's it -> 0 hits "
    "in this punctuation-free corpus); the contrast per source proves "
    "the literal path escapes metacharacters.",
)
def grep_fixed_literal_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.sources.grep import compile_pattern

    as_regex = compile_pattern("scan.merge")
    as_fixed = compile_pattern("scan.merge", fixed=True)
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(F.col("text").rlike(as_regex).cast("long")).alias("n_as_regex"),
        F.sum(F.col("text").rlike(as_fixed).cast("long")).alias("n_fixed"),
    )


@register(
    "grep_context_count",
    f"""
    WITH lines AS (
        SELECT source, doc_id,
               regexp_matches(text, '{GREP_PATTERN}') AS m
        FROM documents
    ),
    ctx AS (
        SELECT source,
               (m OR COALESCE(LAG(m) OVER w, FALSE)
                  OR COALESCE(LEAD(m) OVER w, FALSE)) AS printed
        FROM lines
        WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    )
    SELECT source,
           CAST(SUM(CASE WHEN printed THEN 1 ELSE 0 END) AS BIGINT)
               AS printed_lines
    FROM ctx
    GROUP BY source
    """,
    doc="grep -A1 -B1 context-line accounting per source: a line is "
    "printed iff it matches or an adjacent line (previous/next in the "
    "file's line order) matches — overlapping context windows dedup "
    "naturally because the rule is per-line, exactly how grep prints. "
    "The registry twin of sources/grep.py's context rows "
    "(lead/lag over per-file order; reference passthrough "
    "src/LogQuerier/server.py:30-33), promoting the -A/-B feature "
    "from pytest-only into the oracle-gated surface. One window over "
    "each source's line order, then a tiny per-source count.",
)
def grep_context_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    m = F.col("text").rlike(GREP_PATTERN)
    printed = (
        m
        | F.coalesce(F.lag(m.cast("boolean")).over(w), F.lit(False))
        | F.coalesce(F.lead(m.cast("boolean")).over(w), F.lit(False))
    )
    return (
        docs.select("source", printed.alias("printed"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("printed"), 1).otherwise(0)).alias(
                "printed_lines"
            )
        )
    )


@register(
    "grep_only_matching_counts",
    """
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, 'scan|merge'))) AS BIGINT)
               AS n_occurrences,
           CAST(SUM(CASE WHEN regexp_matches(text, 'scan|merge')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lines
    FROM documents
    GROUP BY source
    """,
    doc="G2 `grep -o` parity: per-source count of pattern OCCURRENCES "
    "(regexp_extract_all + size — every hit counted, not every line) "
    "next to the plain line count, proving -o multiplies matches "
    "within a line. Both engines use leftmost non-overlapping match "
    "semantics, so the occurrence totals agree exactly. The registry "
    "twin of sources/grep.py dgrep(only_matching=True) (reference "
    "passthrough src/LogQuerier/server.py:30-33). Single scan + one "
    "grouped sum; everything pre-shuffle is codegen'd.",
)
def grep_only_matching_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    occ = F.size(F.regexp_extract_all(F.col("text"), F.lit("scan|merge"), F.lit(0)))
    return docs.groupBy("source").agg(
        F.sum(occ.cast("long")).alias("n_occurrences"),
        F.sum(F.col("text").rlike("scan|merge").cast("long")).alias("n_lines"),
    )


@register(
    "grep_max_count_first_matches",
    """
    SELECT source, doc_id, rk
    FROM (
        SELECT source, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                    AS BIGINT) AS rk
        FROM documents
        WHERE regexp_matches(text, 'scan|merge')
    )
    WHERE rk <= 5
    """,
    doc="G2 `grep -m 5` parity: the FIRST five matching lines per source "
    "in line order (doc_id stands in for the file line number, as in "
    "grep_context_count) — a running rank over matching lines only, "
    "capped per file. The registry twin of sources/grep.py "
    "dgrep(max_count=...). The filter runs before the window, so the "
    "shuffle carries only matching lines.",
)
def grep_max_count_first_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        docs.filter(F.col("text").rlike("scan|merge"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "rk")
    )


@register(
    "grep_files_with_matches",
    """
    SELECT DISTINCT source FROM documents
    WHERE regexp_matches(text, 'merge .* sort')
    """,
    doc="G2 `grep -l` parity: names of sources containing at least one "
    "match — scan+filter in codegen, then a distinct over the tiny "
    "source-name column (the shuffle carries one short string per "
    "matching file). The registry twin of sources/grep.py dgrep_files.",
)
def grep_files_with_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike("merge .* sort"))
        .select("source")
        .distinct()
    )


@register(
    "grep_multi_pattern_count",
    """
    SELECT source, COUNT(*) AS match_count
    FROM documents
    WHERE text LIKE '%sort merge%' OR text LIKE '%hash join%'
    GROUP BY source
    ORDER BY source
    """,
    doc="G2 `grep -e p1 -e p2` parity (any-match across multiple "
    "patterns, reference raw-flag passthrough "
    "src/LogQuerier/server.py:30-33): compile_patterns OR's the "
    "per-pattern compilations into ONE alternation so the scan stays a "
    "single codegen'd regex filter — never one pass per pattern. The "
    "patterns are -F literals here, so the oracle can spell the same "
    "selection as two LIKEs.",
)
def grep_multi_pattern_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.sources.grep import compile_patterns

    pat = compile_patterns(["sort merge", "hash join"], fixed=True)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(pat))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("match_count"))
        .orderBy("source")
    )
