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


def test_bpe_merges_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    merges = bpe.bpe_train(docs, n_merges=4)
    assert len(merges) == 4

    path = str(tmp_path / "merges")
    models.save_bpe_merges(spark, merges, path)
    assert models.load_bpe_merges(spark, path) == merges
