"""Relational wave 4: statistical aggregates from exact sums, RANGE-frame
windows, and corpus-level text statistics (trigram top-k, TF-IDF).

Determinism: every statistic is assembled from decimal-exact sums with
the SAME final double expression on both engines — never from the
engines' own corr()/stddev() (whose internal accumulation orders
differ). Logarithms are avoided (libm last-bit divergence); TF-IDF uses
a linear inverse-frequency weight, documented on the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register
from stream_processing_spark.queries._util import dec


@register(
    "agg_corr_price_qty",
    """
    WITH s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        FROM lineitem
    )
    SELECT ROUND((n * sxy - sx * sy)
           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
    FROM s
    """,
    doc="Pearson correlation assembled from five decimal-exact sums and "
    "one closed-form double expression — NOT the engines' corr() (whose "
    "streaming accumulators are order-dependent). One scan, one 1-row "
    "reduce; the pattern for any moment-based statistic at scale.",
)
def agg_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(F.round(corr, 6).alias("corr_qty_price"))


@register(
    "window_range_frame_user_value",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS value_1h
    FROM events
    """,
    doc="RANGE-frame window (event-time, INTERVAL preceding) — the "
    "value-based frame the ROWS-frame running sum can't express; one "
    "shuffle on user_id, frame evaluated on the sorted partition. "
    "Decimal sum keeps the sliding aggregate exact. NOTE: ties in ts "
    "share a frame (RANGE semantics), so the result is "
    "order-deterministic even with duplicate timestamps.",
)
def window_range_frame_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # microsecond-precision frame bound: ts has sub-second parts, so a
    # cast-to-seconds frame would mis-bucket boundary rows
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("value_1h"),
    )


@register(
    "rollup_multires_events",
    """
    SELECT date_trunc('day', ts) AS day,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hypertable-style multi-resolution rollup: the DAILY aggregate is "
    "computed FROM THE HOURLY aggregate (re-aggregation of partials), "
    "not from raw events — at 100 TB the 1d rollup reads 24 rows per "
    "(day,type) instead of millions. Decimal partial sums make the "
    "two-level reduction exactly equal to the direct aggregate, which "
    "is what the oracle (direct from raw) proves.",
)
def rollup_multires_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("value")).alias("sv"),  # decimal partials, exact
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sv").cast("double").alias("total_value"),
        )
    )


@register(
    "text_trigram_topk",
    """
    WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents
    ),
    tri AS (
        SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS trigram
        FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 3
    )
    SELECT trigram, COUNT(*) AS freq
    FROM tri
    GROUP BY trigram
    ORDER BY freq DESC, trigram
    LIMIT 20
    """,
    doc="Corpus-level top-20 word trigrams: explode shingles → count → "
    "TakeOrderedAndProject (per-partition heap, 20-row gather). Total "
    "tie-break on the trigram string keeps the LIMIT deterministic.",
)
def text_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.functions import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    tri = dd.shingles(docs, n=3, distinct=False).select(
        F.col("sh").alias("trigram")
    )
    return (
        tri.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("trigram"))
        .limit(20)
    )


@register(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * (n.n_docs * 1.0 / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tfidf
    FROM (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
    doc="Top-3 characteristic terms per document by TF-IDF with a LINEAR "
    "inverse-document-frequency weight (N/df instead of log(N/df) — "
    "same ranking for fixed N, and avoids cross-engine libm last-bit "
    "divergence; the log variant is a one-line swap in production). "
    "tf and df are integer aggregates; one double division, row_number "
    "with a total tie-break.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * (F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )
