"""Behavioral tests for the round-10 operators: n-gram novelty,
temperature mixture resampling, and dimension-variance selection —
semantics on crafted fixtures, not just oracle hash equality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stream_processing_spark.queries import REGISTRY


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_novelty_semantics_on_crafted_corpus(spark, tmp_path):
    """First holder scores 1.0; a verbatim late copy scores 0.0; a
    half-overlapping doc scores the exact novel fraction."""
    from stream_processing_spark.functions import dedup as dd
    from stream_processing_spark.runtime import materialize

    base = "a b c d e f"              # shingles: abc bcd cde def (4)
    copy = base                        # all 4 seen -> novelty 0
    half = "c d e x y z"              # cde (seen) + dex exy xyz (new)
    df = _docs(spark, [(base, "en"), (copy, "en"), (half, "en")])

    sh = materialize(dd.shingles(df, n=3), eager=False)
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1)
                .otherwise(0)
            ).alias("n_novel"),
        )
        .collect()
    }
    assert got == {0: (4, 4), 1: (4, 0), 2: (4, 3)}


def test_temperature_resample_invariants(spark):
    """Total resampled volume tracks the corpus size (stochastic
    rounding is unbiased: |sum(n_resampled) - total| bounded by the
    number of langs), minority langs are upweighted (weight > 1),
    the majority lang downweighted (weight < 1), and weights follow
    the sqrt ordering."""
    q = REGISTRY["mixture_temperature_resample"].spark
    out = {r["lang"]: r for r in q(spark, "/root/testdata/sf0.01").collect()}
    assert len(out) >= 2
    counts = {k: r["n_docs"] for k, r in out.items()}
    total = sum(counts.values())
    # sqrt-share weights: w_l = (sqrt(n_l)/sum sqrt) * total / n_l,
    # recomputed here independently (6dp tolerance: the engine rounds
    # share and weight to 6dp)
    denom = sum(math.sqrt(n) for n in counts.values())
    for lang, r in out.items():
        expect = (math.sqrt(counts[lang]) / denom) * total / counts[lang]
        assert abs(r["weight"] - expect) < 1e-3, (lang, r["weight"], expect)
    big = max(counts, key=counts.get)
    small = min(counts, key=counts.get)
    if counts[big] != counts[small]:
        assert out[small]["weight"] > out[big]["weight"]
    resampled = sum(r["n_resampled"] for r in out.values())
    # each doc's copies differ from weight by < 1 in expectation;
    # deterministic hash rounding keeps the realized total within a
    # loose band around the corpus size
    assert abs(resampled - total) < 0.1 * total + 10 * len(out)


def test_dim_variance_topk_matches_numpy(spark):
    """Top-k rows agree with a numpy recomputation at 6dp."""
    import numpy as np

    from stream_processing_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    q = REGISTRY["embedding_dim_variance_topk"].spark
    got = q(spark, sf).collect()
    assert len(got) == 10

    X = np.array(
        [r["embedding"] for r in
         load_table(spark, sf, "embeddings").collect()],
        dtype=np.float64,
    )
    mean = X.mean(axis=0)
    var = (X * X).mean(axis=0) - mean * mean
    order = sorted(range(X.shape[1]), key=lambda p: (-var[p], p))[:10]
    assert [r["pos"] for r in got] == order
    for r in got:
        assert abs(r["variance"] - var[r["pos"]]) < 5e-6
        assert abs(r["mean_val"] - mean[r["pos"]]) < 5e-6
