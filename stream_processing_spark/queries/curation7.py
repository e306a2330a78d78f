"""Curation tier, round 12: BM25F multi-field retrieval and near-dup
cluster canonicalization (connected components → survivor map).

Beyond-reference surface (build brief: dedup + retrieval families).
Same determinism discipline as the rest of the registry: rational idf
(no ln), per-term scores rounded to 6dp and DECIMAL-summed, window
NULL placement pinned on both engines, total tie-breaking orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import dedup as dd
from stream_processing_spark.queries import register
from stream_processing_spark.queries.llmops import (
    _JACCARD_CTES,
    _JACCARD_MAX_DF,
    _SHINGLE_SQL,
)

# ------------------------------------------------- BM25F multi-field

_BM25F_TERMS = ("scan", "merge", "window")  # same termset as BM25
_BM25F_K1 = 1.2
_BM25F_TITLE_LEN = 5  # leading tokens form the "title" field
# per-field weights and length-normalization slopes (Zaragoza &
# Robertson, "Simple BM25 extension to multiple weighted fields"):
# the title field is short and information-dense → higher weight,
# gentler length normalization
_BM25F_W = {"title": 2.0, "body": 1.0}
_BM25F_B = {"title": 0.5, "body": 0.8}


@register(
    "bm25f_topk_docs",
    f"""
    WITH sp AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE text IS NOT NULL
    ),
    fields AS (
        SELECT doc_id, 'title' AS fld,
               list_slice(t, 1, {_BM25F_TITLE_LEN}) AS toks FROM sp
        UNION ALL
        SELECT doc_id, 'body' AS fld,
               list_slice(t, {_BM25F_TITLE_LEN} + 1, len(t)) AS toks
        FROM sp
    ),
    lens AS (
        SELECT doc_id, fld, len(toks) AS L FROM fields
    ),
    avglens AS (
        SELECT fld, CAST(SUM(L) AS DOUBLE) / COUNT(*) AS avgl,
               COUNT(*) AS n FROM lens GROUP BY fld
    ),
    tf AS (
        SELECT f.doc_id, f.fld, u.token, COUNT(*) AS tf
        FROM fields f, UNNEST(f.toks) AS u(token)
        WHERE u.token IN {_BM25F_TERMS!r}
        GROUP BY 1, 2, 3
    ),
    dfreq AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ),
    wtf AS (
        SELECT t.doc_id, t.token,
               SUM(CASE t.fld
                       WHEN 'title' THEN {_BM25F_W['title']} * t.tf
                           / (1 - {_BM25F_B['title']}
                              + {_BM25F_B['title']} * l.L / a.avgl)
                       ELSE {_BM25F_W['body']} * t.tf
                           / (1 - {_BM25F_B['body']}
                              + {_BM25F_B['body']} * l.L / a.avgl)
                   END) AS tfw
        FROM tf t
        JOIN lens l ON l.doc_id = t.doc_id AND l.fld = t.fld
        JOIN avglens a ON a.fld = t.fld
        GROUP BY 1, 2
    ),
    n_docs AS (SELECT COUNT(*) AS N FROM sp),
    scored AS (
        SELECT w.doc_id,
               CAST(ROUND(
                   ((n.N - d.df + 0.5) / (d.df + 0.5))
                   * w.tfw / ({_BM25F_K1} + w.tfw), 6)
                    AS DECIMAL(18,6)) AS term_score
        FROM wtf w JOIN dfreq d ON d.token = w.token CROSS JOIN n_docs n
    )
    SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS bm25f
    FROM scored GROUP BY doc_id
    ORDER BY bm25f DESC, doc_id LIMIT 10
    """,
    doc="BM25F multi-field retrieval top-10 for the fixed query termset "
    "— the fielded generalization of bm25_topk_docs (Zaragoza & "
    "Robertson): the first "
    f"{_BM25F_TITLE_LEN} tokens act as a 'title' field (weight "
    f"{_BM25F_W['title']}, b={_BM25F_B['title']}), the rest as 'body' "
    f"(weight {_BM25F_W['body']}, b={_BM25F_B['body']}); per-field "
    "length-normalized tfs are weight-summed into ONE pseudo-frequency "
    "before a single k1 saturation, which is what distinguishes BM25F "
    "from naively summing per-field BM25 scores. idf stays the exact "
    "rational (N−df+0.5)/(df+0.5) with df counted over docs matching "
    "in ANY field; each term's score is one fixed double expression "
    "rounded to 6dp then DECIMAL-summed. Plan: posexplode tags fields "
    "map-side (no second corpus scan), tf shuffles on (doc, field, "
    "term), the per-field (avgl, N) stats and df broadcast, "
    "TakeOrderedAndProject keeps the top-k. NULL-text docs have no "
    "fields and are excluded.",
)
def bm25f_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("t"))
    )
    tl = _BM25F_TITLE_LEN
    fields = docs.select(
        "doc_id",
        F.lit("title").alias("fld"),
        F.slice("t", 1, tl).alias("toks"),
    ).unionByName(
        docs.select(
            "doc_id",
            F.lit("body").alias("fld"),
            F.slice(
                "t", tl + 1, F.greatest(F.size("t") - tl, F.lit(0))
            ).alias("toks"),
        )
    )
    lens = fields.select("doc_id", "fld", F.size("toks").alias("L"))
    avglens = lens.groupBy("fld").agg(
        (F.sum("L").cast("double") / F.count(F.lit(1))).alias("avgl")
    )
    tf = (
        fields.select(
            "doc_id", "fld", F.explode("toks").alias("token")
        )
        .filter(F.col("token").isin(*_BM25F_TERMS))
        .groupBy("doc_id", "fld", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("N"))
    wt = F.when(
        F.col("fld") == "title",
        _BM25F_W["title"]
        * F.col("tf")
        / (
            1
            - _BM25F_B["title"]
            + _BM25F_B["title"] * F.col("L") / F.col("avgl")
        ),
    ).otherwise(
        _BM25F_W["body"]
        * F.col("tf")
        / (
            1
            - _BM25F_B["body"]
            + _BM25F_B["body"] * F.col("L") / F.col("avgl")
        )
    )
    wtf = (
        tf.join(lens, ["doc_id", "fld"])
        .join(F.broadcast(avglens), "fld")
        .groupBy("doc_id", "token")
        .agg(F.sum(wt).alias("tfw"))
    )
    idf = (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    term_score = F.round(
        idf * F.col("tfw") / (_BM25F_K1 + F.col("tfw")), 6
    ).cast("decimal(18,6)")
    return (
        wtf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(F.sum("term_score").cast("double").alias("bm25f"))
        .orderBy(F.desc("bm25f"), F.asc("doc_id"))
        .limit(10)
    )


# --------------------------------- near-dup cluster canonicalization


@register(
    "dedup_cc_survivor_map",
    "WITH RECURSIVE"
    + _SHINGLE_SQL.split("WITH", 1)[1]
    + ","
    + _JACCARD_CTES
    + """,
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM jpairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM jpairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(label) AS cluster_id
        FROM reach GROUP BY node
    ),
    survivors AS (
        SELECT c.cluster_id, d.doc_id AS canonical_doc_id
        FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY c.cluster_id
            ORDER BY d.n_chars DESC NULLS LAST, d.doc_id ASC) = 1
    )
    SELECT c.doc_id, c.cluster_id, s.canonical_doc_id,
           c.doc_id = s.canonical_doc_id AS is_survivor
    FROM clusters c JOIN survivors s ON s.cluster_id = c.cluster_id
    """,
    doc="Near-dup cluster CANONICALIZATION: the keep/drop decision a "
    "training-data pipeline actually executes after near-dup "
    "detection. Composes the 3-gram Jaccard edges (J ≥ 0.8, df ≤ "
    f"{_JACCARD_MAX_DF}) with the O(log n) connected-components "
    "closure (operators/graph.py — the same machinery as "
    "dedup_connected_components), then elects ONE survivor per "
    "cluster by (longest n_chars, then smallest doc_id — DESC NULLS "
    "LAST pinned on both engines) and maps every member, singletons "
    "included, to its canonical id. The survivor election is a "
    "PARTITIONED window (per cluster); the oracle runs the identical "
    "closure as a recursive CTE. Output: one row per document with "
    "its cluster, canonical id, and survivor flag — keep-list joins "
    "downstream are a broadcast of the non-survivor ids.",
)
def dedup_cc_survivor_map(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stream_processing_spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(
        dd.shingles(docs, n=3), threshold=0.8, max_df=_JACCARD_MAX_DF
    ).select("doc_a", "doc_b")
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    clusters = (
        docs.select("doc_id")
        .join(cc, docs.doc_id == cc.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc_nulls_last("n_chars"), F.asc("doc_id")
    )
    survivors = (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id", F.col("doc_id").alias("canonical_doc_id")
        )
    )
    return clusters.join(survivors, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "canonical_doc_id",
        (F.col("doc_id") == F.col("canonical_doc_id")).alias(
            "is_survivor"
        ),
    )


# --------------------------------------- source concentration (HHI)


@register(
    "hhi_source_concentration",
    """
    WITH s AS (
        SELECT COALESCE(source, '(null)') AS source,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * cnt) AS DOUBLE)
                 * 10000
                 / (CAST(SUM(cnt) AS DOUBLE) * SUM(cnt)), 6) AS hhi,
           ROUND((CAST(SUM(cnt) AS DOUBLE) * SUM(cnt))
                 / CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * cnt)
                        AS DOUBLE), 6) AS effective_sources
    FROM s
    """,
    doc="Herfindahl-Hirschman concentration of the corpus over sources "
    "(HHI = 10000·Σ share², plus the effective-source count 1/Σ "
    "share²) — the one-number audit of whether a training mix is "
    "dominated by a single crawl/source, the summary sibling of "
    "corpus_js_divergence_sources. Count sums are exact integers "
    "(Σcnt² in DECIMAL(19) products so petabyte corpus counts "
    "survive), ONE double expression per output. NULL source is a "
    "first-class '(null)' level. Scale shape: one source-domain "
    "aggregation; the HHI walk is a single source-domain fold — no "
    "windows, no joins. Exactly one output row.",
)
def hhi_source_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy(
        F.coalesce("source", F.lit("(null)")).alias("source")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    sq = F.sum(F.col("cnt").cast("decimal(19,0)") * F.col("cnt")).cast(
        "double"
    )
    tot = F.sum("cnt").cast("double")
    return s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.round(sq * 10000 / (tot * F.sum("cnt")), 6).alias("hhi"),
        F.round((tot * F.sum("cnt")) / sq, 6).alias(
            "effective_sources"
        ),
    )
