"""Artifact persistence: saved models must round-trip exactly and a
query served from a LOADED codebook must equal one that trains live."""

from __future__ import annotations

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import bpe, models
from stream_processing_spark.functions import similarity as sim

SF = "/root/testdata/sf0.001"


def test_centroids_roundtrip_and_serving_parity(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    cents = sim.kmeans_centroids(emb, n_cells=16)

    path = str(tmp_path / "codebook")
    models.save_centroids(spark, cents, path)
    loaded = models.load_centroids(spark, path)
    assert loaded == cents  # exact float64 round-trip through parquet

    live = sim.ivf_topk(emb, query_vec_id=0, k=10).collect()
    served = sim.ivf_topk(emb, query_vec_id=0, k=10, cents=loaded).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in live]


def test_classifier_roundtrip_and_cache_serving_parity(spark, tmp_path):
    """The trained classifier artifact must round-trip exactly, and
    the model-cache path (trained_classifier) must serve weights equal
    to a live train — the r8-verdict split of inference from training."""
    from stream_processing_spark.queries import curation6 as c6

    docs = load_table(spark, SF, "documents")
    c6.clear_classifier_cache()
    w_live, bias, n_docs = c6.train_quality_classifier(docs, rounds=2)
    rows = sorted(
        (int(r["bucket"]), str(r["w"])) for r in w_live.collect()
    )
    assert n_docs > 0 and rows

    path = str(tmp_path / "clf")
    models.save_classifier(spark, rows, bias, n_docs, path)
    lw, lb, ln = models.load_classifier(spark, path)
    assert (lw, lb, ln) == (rows, bias, n_docs)

    # cache serving: second call must NOT retrain (weights identical,
    # and the cache key is populated)
    w1, b1, n1 = c6.trained_classifier(spark, docs, rounds=2)
    assert len(c6._CLF_MODEL_CACHE) == 1
    w2, b2, n2 = c6.trained_classifier(spark, docs, rounds=2)
    got1 = sorted((int(r["bucket"]), str(r["w"])) for r in w1.collect())
    got2 = sorted((int(r["bucket"]), str(r["w"])) for r in w2.collect())
    assert got1 == got2 == rows
    assert (b1, n1) == (b2, n2) == (bias, n_docs)
    c6.clear_classifier_cache()


def test_bpe_merges_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    merges = bpe.bpe_train(docs, n_merges=4)
    assert len(merges) == 4

    path = str(tmp_path / "merges")
    models.save_bpe_merges(spark, merges, path)
    assert models.load_bpe_merges(spark, path) == merges
