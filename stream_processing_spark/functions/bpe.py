"""Distributed BPE (byte-pair-encoding) merge training.

Tokenizer training is a standard step of a large-corpus data pipeline.
BPE's classic formulation is sequential, but its heavy work — counting
adjacent symbol pairs — is a pure aggregation, and it runs over the
WORD-FREQUENCY table, not the corpus: vocabulary grows ~log of corpus
size, so after the one corpus-sized word count each merge iteration
touches a table millions of rows wide at 100 TB, not terabytes. That is
exactly how production BPE trainers scale, and it maps onto Spark as:

    per merge step:
      1. explode each word's symbol sequence into adjacent pairs,
         sum word frequencies per pair        (distributed agg)
      2. take the argmax pair, deterministic tie-break
         (count DESC, left ASC, right ASC)    (constant driver trip)
      3. rewrite every word's symbols, merging that pair left-to-right
         non-overlapping                      (map-side string rewrite)

The merge rewrite is engine-portable string algebra (no UDF, no
lookbehind — RE2 engines lack it): with symbols space-joined, double
every gap and wrap in spaces, then a plain non-regex replace of
`' a  b '` with `' ab '` is exactly the left-to-right non-overlapping
scan (each match consumes at most one space from each doubled gap, so
neighboring matches never starve each other: 'a b a b' -> 'ab ab'),
then collapse gaps back. The DuckDB oracle unrolls the same three
steps per merge as CTEs.

Lineage: each iteration's frame is localCheckpoint'd (or reliably
checkpointed on a cluster via ``reliable=True``) so the plan doesn't
grow a tower of string rewrites — same discipline as
operators/graph.py's label propagation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_processing_spark.runtime import materialize


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(repr, freq): space-joined character sequence per distinct word."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("repr"),
            "freq",
        )
    )


def _adjacent_pairs(wf: DataFrame) -> DataFrame:
    """(a, b, c): adjacent symbol pairs weighted by word frequency."""
    pairs = F.expr(
        "transform(slice(split(repr, ' '), 1, size(split(repr, ' ')) - 1), "
        "(s, i) -> struct(s AS a, element_at(split(repr, ' '), i + 2) AS b))"
    )
    return (
        wf.select(F.explode(pairs).alias("p"), "freq")
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
        .groupBy("a", "b")
        .agg(F.sum("freq").cast("bigint").alias("c"))
    )


def merge_pair_expr(repr_col: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of (a, b) in a space-joined
    symbol string — the doubled-gap replace described in the module doc."""
    doubled = F.concat(
        F.lit(" "), F.regexp_replace(repr_col, " ", "  "), F.lit(" ")
    )
    merged = F.replace(doubled, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


def bpe_train(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    [(step, left_sym, right_sym, pair_count), ...]. Each step costs one
    distributed pair-count aggregation plus a 1-row driver trip. The
    merge list is a constant-size trained artifact, served from the
    in-process model cache on repeat calls over unchanged data (train
    once, serve many — functions/model_cache.py)."""
    from stream_processing_spark.functions.model_cache import cached_model

    return cached_model(
        docs,
        "bpe_merges",
        (n_merges, text_col),
        lambda: _bpe_train_uncached(
            docs, n_merges, text_col, reliable, checkpoint_dir
        ),
    )


def _bpe_train_uncached(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
    reliable: bool,
    checkpoint_dir: str | None,
) -> list[tuple[int, str, str, int]]:
    cur = word_frequencies(docs, text_col)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        cur = materialize(
            cur, eager=False, reliable=reliable, checkpoint_dir=checkpoint_dir
        )
        top = (
            _adjacent_pairs(cur)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .head()
        )
        if top is None:
            break
        merges.append((step, top["a"], top["b"], int(top["c"])))
        cur = cur.select(
            merge_pair_expr(F.col("repr"), top["a"], top["b"]).alias("repr"),
            "freq",
        )
    return merges


def wordpiece_train(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> list[tuple[int, str, str, int, float]]:
    """WordPiece merge training (Schuster & Nakajima 2012; the BERT
    tokenizer): identical machinery to ``bpe_train`` except the merge
    criterion — instead of the most FREQUENT adjacent pair, pick the
    pair maximizing the likelihood ratio

        score(a, b) = count(ab) / (count(a) * count(b))

    i.e. the pair whose merge most increases a unigram LM's corpus
    likelihood. Symbol counts come from the same word-frequency table
    (one extra vocab-sized aggregation per step); the score is a
    single IEEE division of exact integers, so the argmax and its
    total tie-break (score DESC, a ASC, b ASC) are engine-exact and
    the DuckDB oracle replays the ladder. Returns
    [(step, left, right, pair_count, score), ...].

    Simplification vs production WordPiece: no '##' continuation
    markers (the reference corpus is space-tokenized, so surface
    forms never collide); greedy-longest-match encoding is what
    ``merge_pair_expr`` already implements. Served from the
    in-process model cache like ``bpe_train``."""
    from stream_processing_spark.functions.model_cache import cached_model

    return cached_model(
        docs,
        "wordpiece_merges",
        (n_merges, text_col),
        lambda: _wordpiece_train_uncached(
            docs, n_merges, text_col, reliable, checkpoint_dir
        ),
    )


def _wordpiece_train_uncached(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
    reliable: bool,
    checkpoint_dir: str | None,
) -> list[tuple[int, str, str, int, float]]:
    cur = word_frequencies(docs, text_col)
    merges: list[tuple[int, str, str, int, float]] = []
    for step in range(1, n_merges + 1):
        cur = materialize(
            cur, eager=False, reliable=reliable, checkpoint_dir=checkpoint_dir
        )
        pairs = _adjacent_pairs(cur)
        syms = (
            cur.select(F.explode(F.split("repr", " ")).alias("s"), "freq")
            .groupBy("s")
            .agg(F.sum("freq").cast("bigint").alias("n"))
        )
        sa = syms.select(F.col("s").alias("a"), F.col("n").alias("na"))
        sb = syms.select(F.col("s").alias("b"), F.col("n").alias("nb"))
        score = F.col("c").cast("double") / (
            F.col("na").cast("double") * F.col("nb").cast("double")
        )
        top = (
            pairs.join(sa, "a")
            .join(sb, "b")
            .select("a", "b", "c", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
            .head()
        )
        if top is None:
            break
        merges.append(
            (step, top["a"], top["b"], int(top["c"]), float(top["score"]))
        )
        cur = cur.select(
            merge_pair_expr(F.col("repr"), top["a"], top["b"]).alias("repr"),
            "freq",
        )
    return merges
