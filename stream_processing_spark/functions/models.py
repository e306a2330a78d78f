"""Trained-artifact persistence: quantizer codebooks and BPE merges.

The in-process codebook cache (similarity.py) dies with the driver; a
production index trains ONCE and serves from storage. These helpers
round-trip the two model shapes the engine trains — k-means/IVF
centroid codebooks and BPE merge tables — through plain parquet, so a
serving job loads kilobytes instead of re-running training jobs, and
the artifacts version alongside the data (same directory conventions
as the Store). Loaded centroids inject into ``ivf_topk(cents=...)``;
loaded merges feed ``bpe.merge_pair_expr`` to tokenize new text with a
frozen vocabulary.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def save_centroids(
    spark: SparkSession, cents: dict[int, list[float]], path: str
) -> None:
    """Codebook → parquet rows (cid, pos, val): engine-neutral layout,
    exact float64 round-trip."""
    rows = [
        (cid, pos, float(v))
        for cid, vec in cents.items()
        for pos, v in enumerate(vec)
    ]
    spark.createDataFrame(rows, "cid int, pos int, val double").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_centroids(spark: SparkSession, path: str) -> dict[int, list[float]]:
    rows = spark.read.parquet(path).collect()
    by: dict[int, dict[int, float]] = {}
    for r in rows:
        by.setdefault(int(r.cid), {})[int(r.pos)] = float(r.val)
    return {cid: [vals[p] for p in range(len(vals))] for cid, vals in by.items()}


def save_classifier(
    spark: SparkSession,
    weights: list[tuple[int, str]],
    bias: float,
    n_docs: int,
    path: str,
) -> None:
    """Quality-classifier artifact → parquet rows (bucket, w6, meta):
    the <=B weight rows as 6dp-decimal strings (exact round-trip), plus
    one meta row (bucket -1) carrying bias and the training doc count."""
    rows = [(int(b), str(w), None) for b, w in weights]
    rows.append((-1, repr(float(bias)), int(n_docs)))
    spark.createDataFrame(
        rows, "bucket bigint, w6 string, n_docs bigint"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_classifier(
    spark: SparkSession, path: str
) -> tuple[list[tuple[int, str]], float, int]:
    rows = spark.read.parquet(path).collect()
    weights = sorted(
        (int(r.bucket), r.w6) for r in rows if r.bucket >= 0
    )
    meta = next(r for r in rows if r.bucket == -1)
    return weights, float(meta.w6), int(meta.n_docs)


def save_bpe_merges(
    spark: SparkSession, merges: list[tuple[int, str, str, int]], path: str
) -> None:
    spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_count bigint"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe_merges(
    spark: SparkSession, path: str
) -> list[tuple[int, str, str, int]]:
    rows = spark.read.parquet(path).orderBy("step").collect()
    return [
        (int(r.step), r.left_sym, r.right_sym, int(r.pair_count)) for r in rows
    ]


def save_wordpiece_merges(
    spark: SparkSession,
    merges: list[tuple[int, str, str, int, float]],
    path: str,
) -> None:
    """WordPiece merge table → parquet. The likelihood-ratio score is
    an IEEE double whose exact value participates in downstream
    tie-breaks, so it rides as ``repr`` text (exact round-trip — the
    same trick as the classifier's w6 strings)."""
    rows = [
        (int(s), a, b, int(c), repr(float(sc)))
        for s, a, b, c, sc in merges
    ]
    spark.createDataFrame(
        rows,
        "step int, left_sym string, right_sym string, "
        "pair_count bigint, score_repr string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_wordpiece_merges(
    spark: SparkSession, path: str
) -> list[tuple[int, str, str, int, float]]:
    rows = spark.read.parquet(path).orderBy("step").collect()
    return [
        (int(r.step), r.left_sym, r.right_sym, int(r.pair_count),
         float(r.score_repr))
        for r in rows
    ]


def save_unigram_vocab(
    spark: SparkSession, vocab: list[tuple[str, int, str]], path: str
) -> None:
    """Unigram-LM vocabulary (piece, count, 6dp-decimal log-prob
    string) → parquet. ``lp6`` stays a decimal STRING end-to-end —
    the Viterbi E-step consumes it as decimal(18,6), never a float."""
    rows = [(p, int(c), str(lp)) for p, c, lp in vocab]
    spark.createDataFrame(
        rows, "piece string, cnt bigint, lp6 string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_unigram_vocab(
    spark: SparkSession, path: str
) -> list[tuple[str, int, str]]:
    rows = spark.read.parquet(path).collect()
    return sorted((r.piece, int(r.cnt), r.lp6) for r in rows)


def save_dsir_weights(
    spark: SparkSession,
    weights: list[tuple[int, int, int, str]],
    path: str,
) -> None:
    """DSIR bucket-weight table (bucket, n_target, n_raw, repr-double
    weight string) → parquet; <= B rows, B a constant."""
    rows = [(int(b), int(t), int(n), str(w)) for b, t, n, w in weights]
    spark.createDataFrame(
        rows, "bucket bigint, n_target bigint, n_raw bigint, w_repr string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_dsir_weights(
    spark: SparkSession, path: str
) -> list[tuple[int, int, int, str]]:
    rows = spark.read.parquet(path).collect()
    return sorted(
        (int(r.bucket), int(r.n_target), int(r.n_raw), r.w_repr)
        for r in rows
    )
