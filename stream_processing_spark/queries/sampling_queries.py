"""Deterministic sampling + range join — training-data pipeline ops.

Spark's ``df.sample`` is seed-reproducible only for a fixed partitioning,
which makes it useless as a pipeline contract (a repartition changes the
sample). Hash-based sampling is the scale-correct alternative: membership
depends only on the ROW, so it's stable across partitionings, engines,
and reruns — and therefore oracle-checkable. md5 order/prefix compare is
portable to every engine that can md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register


@register(
    "sample_hash_pct",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE md5(text) < '1a'
    """,
    doc="Deterministic ~10% sample: md5(text) lexicographic prefix "
    "compare ('1a' = 26/256 of the hex space). Row-content-addressed → "
    "stable under repartition/rerun/engine, unlike df.sample(seed); "
    "pure map-side filter, no shuffle, trivially parallel at 100 TB",
)
def sample_hash_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.md5(F.col("text").cast("binary")) < "1a").select(
        "doc_id", "lang", "source"
    )


@register(
    "sample_stratified_per_lang",
    """
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents
    )
    WHERE rn <= 20
    """,
    doc="Stratified sample: exactly 20 docs per language, chosen by "
    "md5 order (deterministic, uniform-ish, content-addressed). One "
    "shuffle on the stratum key; at scale prefer the per-stratum "
    "hash-threshold variant when quotas are proportional",
)
def sample_stratified_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("text").cast("binary")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "range_join_clicks_before_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT COUNT(*)
            FROM events c
            WHERE c.user_id = p.user_id
              AND c.event_type = 'click'
              AND c.ts >  p.ts - INTERVAL '1 hour'
              AND c.ts <= p.ts) AS n_clicks_1h
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="Range join (operators/rangejoin.py): clicks per user within the "
    "hour before each purchase. The naive inequality join is a "
    "BroadcastNestedLoopJoin (O(n·m)); here time is quantized into "
    "1-hour buckets and each purchase equi-joins its ≤2 overlapping "
    "buckets on (user_id, bucket) — a plain hash join on a compact key, "
    "then the exact interval predicate. Purchases with zero clicks kept.",
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.operators.rangejoin import range_join_count

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_join_count(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lookback_sec=3600,
        count_alias="n_clicks_1h",
    )


_WRS_K = 50


@register(
    "weighted_reservoir_sample",
    f"""
    WITH w AS (
        SELECT doc_id, lang, n_chars,
               LEAST(CAST(CEIL(n_chars / 64.0) AS BIGINT), 16) AS wt
        FROM documents
    ),
    copies AS (
        SELECT doc_id, lang, n_chars, wt,
               md5(CAST(i AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
                   AS ukey
        FROM w, UNNEST(range(0, wt)) AS u(i)
    ),
    pri AS (
        SELECT doc_id, lang, n_chars, wt, MIN(ukey) AS priority
        FROM copies GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id, lang, n_chars, wt, priority
    FROM pri
    ORDER BY priority, doc_id
    LIMIT {_WRS_K}
    """,
    doc=f"EXACT-k weighted reservoir sample (top-{_WRS_K} docs by "
    "length-derived weight): each row spawns wt hash copies and its "
    "priority is the MIN copy hash — by symmetry the global minimum "
    "is uniform over all Σwt copies, so the first selection lands on "
    "row i with probability EXACTLY wt_i/Σwt (and pairwise order is "
    "exactly wt_i/(wt_i+wt_j)) — the A-ES reservoir property with "
    "zero transcendental math: everything is md5 string comparison, "
    "so the sample is deterministic, engine-portable (hash-matched "
    "oracle), and stable under rerun/repartition — unlike ln/pow "
    "scores, whose libm last-ulp differences can flip ranks across "
    "engines. Complements sample_weighted_by_length (Bernoulli, "
    "random size) with fixed-size semantics. Scale shape: the copy "
    "explode is bounded by the weight cap (16), the shuffle carries "
    "(id, 32-char key), and the top-k is one TakeOrderedAndProject.",
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wt = F.least(F.ceil(F.col("n_chars") / 64.0).cast("bigint"), F.lit(16))
    # wt=0 guard: sequence(0, -1) in Spark yields [0, -1] (step
    # defaults to -1), i.e. TWO copies for a zero-weight row, while
    # the oracle's range(0, 0) is empty — filter to match the
    # oracle's "no copies → excluded" semantics exactly
    copies = docs.select(
        "doc_id", "lang", "n_chars", wt.alias("wt")
    ).filter(F.col("wt") > 0).select(
        "doc_id", "lang", "n_chars", "wt",
        F.explode(F.sequence(F.lit(0), F.col("wt") - 1)).alias("i"),
    )
    pri = (
        copies.select(
            "doc_id", "lang", "n_chars", "wt",
            F.md5(
                F.concat(
                    F.col("i").cast("string"), F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("ukey"),
        )
        .groupBy("doc_id", "lang", "n_chars", "wt")
        .agg(F.min("ukey").alias("priority"))
    )
    return pri.orderBy("priority", "doc_id").limit(_WRS_K)
