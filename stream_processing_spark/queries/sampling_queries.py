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
