"""Round-3 hardening: conditional pre-explode rebalance, reliable
checkpointing for iterative/multi-branch ops, and source-fingerprinted
codebook cache invalidation (VERDICT r2 next-round items 2/4/6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stream_processing_spark.functions import dedup, similarity
from stream_processing_spark.operators.graph import connected_components
from stream_processing_spark.runtime import materialize, rebalance_for_expansion


def _docs(spark, n=60):
    rows = [(i, f"tok{i} alpha beta gamma delta tok{i % 7}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- rebalance
def test_rebalance_noop_when_already_wide(spark):
    par = spark.sparkContext.defaultParallelism
    wide = _docs(spark).repartition(par * 2)
    assert rebalance_for_expansion(wide).rdd.getNumPartitions() == par * 2


def test_rebalance_widens_narrow_input(spark):
    par = spark.sparkContext.defaultParallelism
    narrow = _docs(spark).coalesce(1)
    assert rebalance_for_expansion(narrow).rdd.getNumPartitions() == par


def test_shingles_no_extra_shuffle_on_wide_input(spark):
    # a pre-partitioned input must flow into the explode NARROWLY: the
    # output keeps the input partitioning instead of a fresh round-robin
    par = spark.sparkContext.defaultParallelism
    wide = _docs(spark).repartition(par + 7)
    out = dedup.shingles(wide, distinct=False)
    assert out.rdd.getNumPartitions() == par + 7
    # and the under-parallel path still widens (local fixture case)
    out1 = dedup.shingles(_docs(spark).coalesce(1), distinct=False)
    assert out1.rdd.getNumPartitions() == par


def test_simhash_results_invariant_to_input_partitioning(spark):
    par = spark.sparkContext.defaultParallelism
    a = dedup.simhash32(_docs(spark).coalesce(1)).collect()
    b = dedup.simhash32(_docs(spark).repartition(par * 2)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------- reliable ckpt
def test_materialize_reliable_requires_dir(spark):
    # fresh contexts have no checkpoint dir configured
    if spark.sparkContext.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="checkpoint directory"):
            materialize(_docs(spark), reliable=True)


def test_materialize_reliable_writes_checkpoint_dir(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = materialize(_docs(spark), reliable=True, checkpoint_dir=ckpt)
    assert out.count() == 60
    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "reliable checkpoint produced no files"


def test_connected_components_reliable_matches_local(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    local = {(r.node, r.component) for r in connected_components(edges).collect()}
    rel = {
        (r.node, r.component)
        for r in connected_components(
            edges, reliable=True, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert local == rel
    assert rel == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)}


def test_lsh_banded_pairs_reliable_matches_local(spark, tmp_path):
    from stream_processing_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").head()[0])
    kw = dict(threshold=0.9, dim=dim, bands=4, rows_per_band=8)
    local = sorted(map(tuple, similarity.lsh_banded_pairs(emb, **kw).collect()))
    rel = sorted(
        map(
            tuple,
            similarity.lsh_banded_pairs(
                emb, reliable=True, checkpoint_dir=str(tmp_path / "lsh"), **kw
            ).collect(),
        )
    )
    assert local == rel


def test_jaccard_pairs_reliable_matches_local(spark, tmp_path):
    sh = dedup.shingles(_docs(spark), n=2)
    kw = dict(threshold=0.3, max_df=20)
    local = sorted(map(tuple, dedup.jaccard_pairs(sh, **kw).collect()))
    rel = sorted(
        map(
            tuple,
            dedup.jaccard_pairs(
                sh, reliable=True, checkpoint_dir=str(tmp_path / "jac"), **kw
            ).collect(),
        )
    )
    assert local == rel


# ---------------------------------------------------------- codebook cache
def test_centroid_cache_invalidated_on_rewrite(spark, tmp_path):
    p = str(tmp_path / "emb.parquet")

    def write(shift: float) -> None:
        rows = [
            (i, [float(i % 5) + shift, float(i % 3), 1.0, 0.5]) for i in range(80)
        ]
        spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(p)

    write(0.0)
    c1 = similarity.kmeans_centroids(spark.read.parquet(p), n_cells=4)
    # same path, same bytes → cache hit (identical object back)
    c1b = similarity.kmeans_centroids(spark.read.parquet(p), n_cells=4)
    assert c1b is c1

    write(10.0)  # rewrite behind the SAME path
    c2 = similarity.kmeans_centroids(spark.read.parquet(p), n_cells=4)
    assert c2 is not c1
    assert c2 != c1, "stale quantizer served after source rewrite"
