"""Round-6 curation operators — the Gopher repetition-signal family.

Rae et al. (Gopher, 2021) §A.1 and the FineWeb/Dolma reproductions
filter documents on *character-coverage* repetition signals: the
fraction of a document's characters covered by its most frequent
word n-gram (n = 2..4) and by all *duplicated* word n-grams
(n = 5..8).  The existing ``quality_bigram_repetition`` reports the
top-bigram share of bigram *occurrences*; this module adds the
character-fraction form the published filters actually threshold on.

The reference corpus (documents.parquet) is single-line text, so the
line/paragraph dedup rules of the same paper are degenerate here (one
line per doc) and intentionally omitted — the n-gram family is the
meaningful subset on this data.

Determinism rules as elsewhere in the registry: integer counts and
coverage products end-to-end, ONE double division per output column,
ROUND(…, 6) on the final fractions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.queries import register
from stream_processing_spark.runtime import rebalance_for_expansion

# Gopher thresholds use the most-frequent-gram char fraction for
# n=2..4 and the duplicated-gram char fraction for n=5..8 (the paper
# runs 5..10; 8 keeps the explode factor bounded while preserving the
# signal shape on ≤100-token synthetic docs).
_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8)


def _frac_cols_sql() -> str:
    cols = []
    for n in _TOP_NS:
        cols.append(
            f"ROUND(LEAST(1.0, CAST(COALESCE(MAX(CASE WHEN n = {n} "
            f"THEN top_cover END), 0) AS DOUBLE) / CAST(nc AS DOUBLE)), 6) "
            f"AS top{n}_char_frac"
        )
    for n in _DUP_NS:
        cols.append(
            f"ROUND(LEAST(1.0, CAST(COALESCE(MAX(CASE WHEN n = {n} "
            f"THEN dup_cover END), 0) AS DOUBLE) / CAST(nc AS DOUBLE)), 6) "
            f"AS dup{n}_char_frac"
        )
    return ",\n           ".join(cols)


@register(
    "quality_gopher_repetition",
    f"""
    WITH base AS (
        SELECT doc_id, length(text) AS nc, string_split(text, ' ') AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id, nc, ns.n,
               array_to_string(t[i : i + ns.n - 1], ' ') AS g
        FROM base
        CROSS JOIN (VALUES {",".join(f"({n})" for n in _TOP_NS + _DUP_NS)})
            AS ns(n),
        UNNEST(range(1, len(t) - ns.n + 2)) AS u(i)
        WHERE len(t) >= ns.n
    ),
    cnt AS (
        SELECT doc_id, nc, n, g, COUNT(*) AS c, length(g) AS lg
        FROM g GROUP BY doc_id, nc, n, g
    ),
    per_n AS (
        SELECT doc_id, nc, n,
               MAX(c * lg) AS top_cover,
               SUM(CASE WHEN c >= 2 THEN c * lg ELSE 0 END) AS dup_cover
        FROM cnt GROUP BY doc_id, nc, n
    )
    SELECT doc_id,
           {_frac_cols_sql()}
    FROM per_n GROUP BY doc_id, nc
    """,
    doc="Gopher-style repetition signals as character fractions: for "
    "each doc, the share of characters covered by the single most-"
    "covering word n-gram (n=2..4) and by all duplicated n-grams "
    "(n=5..8) — the quantities the published quality filters "
    "threshold on (top-2-gram > 0.20 → drop, dup-5-gram > 0.15 → "
    "drop, etc.). 'Covered' = occurrences × gram length (spaces "
    "included), capped at 1.0 since overlapping occurrences can "
    "double-count. Plan: one scan, one explode producing "
    f"{len(_TOP_NS + _DUP_NS)}× ~token-count rows, then two "
    "aggregations both keyed by doc_id — map-side partial aggregation "
    "absorbs the within-doc duplicate mass before the shuffle, and "
    "no operator ever joins across documents, so the query scales "
    "linearly in corpus size with per-doc-bounded state. Integer "
    "coverage products, one double division per column, round 6dp.",
)
def quality_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the 7-way explode across cores only when the scan itself
    # is narrower than the cluster (no unconditional full-text shuffle)
    docs = rebalance_for_expansion(docs)
    base = docs.select(
        "doc_id",
        F.length("text").alias("nc"),
        F.split(F.col("text"), " ").alias("t"),
    )
    ns = F.array(*[F.lit(n) for n in _TOP_NS + _DUP_NS])
    grams = (
        base.select("doc_id", "nc", "t", F.explode(ns).alias("n"))
        .filter(F.size("t") >= F.col("n"))
        .select(
            "doc_id",
            "nc",
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - n + 1), "
                    "i -> array_join(slice(t, i, n), ' '))"
                )
            ).alias("g"),
        )
    )
    cnt = grams.groupBy("doc_id", "nc", "n", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    cover = F.col("c") * F.length("g")
    per_n = cnt.groupBy("doc_id", "nc", "n").agg(
        F.max(cover).alias("top_cover"),
        F.sum(F.when(F.col("c") >= 2, cover).otherwise(0)).alias(
            "dup_cover"
        ),
    )

    def _frac(agg_col):
        return F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(agg_col, F.lit(0)).cast("double")
                / F.col("nc").cast("double"),
            ),
            6,
        )

    return per_n.groupBy("doc_id", "nc").agg(
        *[
            _frac(
                F.max(F.when(F.col("n") == n, F.col("top_cover")))
            ).alias(f"top{n}_char_frac")
            for n in _TOP_NS
        ],
        *[
            _frac(
                F.max(F.when(F.col("n") == n, F.col("dup_cover")))
            ).alias(f"dup{n}_char_frac")
            for n in _DUP_NS
        ],
    ).drop("nc")
