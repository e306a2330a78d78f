"""Unit tests for sparse_cosine_pairs and pagerank_copurchase_parts
(graph_retrieval.py). Oracle hash-matches run in test_oracle_queries.py;
these cover algebraic invariants the fixture comparison cannot.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_processing_spark.queries import REGISTRY
from stream_processing_spark.queries.graph_retrieval import (
    _PR_BASE,
    _PR_SCALE,
    _SC_THRESHOLD,
)

SF = "/root/testdata/sf0.001"


def _write_documents(spark, path: str, rows: list[tuple[int, str]]) -> str:
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.parquet(os.path.join(path, "documents.parquet"))
    return path


def test_sparse_cosine_identical_docs_score_one(spark, tmp_path):
    """Two identical docs share every shingle with equal weights ->
    cosine exactly 1; an unrelated doc never pairs with them."""
    text = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"z{i}" for i in range(20))
    d = _write_documents(spark, str(tmp_path), [(0, text), (1, text), (2, other)])
    rows = REGISTRY["sparse_cosine_pairs"].spark(spark, d).collect()
    assert [(r.doc_a, r.doc_b, r.cos_sim) for r in rows] == [(0, 1, 1.0)]


def test_sparse_cosine_bounds_and_threshold(spark):
    rows = REGISTRY["sparse_cosine_pairs"].spark(spark, SF).collect()
    assert rows, "fixture corpus should contain near-dup pairs"
    for r in rows:
        assert _SC_THRESHOLD <= r.cos_sim <= 1.0
        assert r.doc_a < r.doc_b


def test_pagerank_mass_and_floor(spark):
    out = REGISTRY["pagerank_copurchase_parts"].spark(spark, SF)
    rows = out.collect()
    n = len(rows)
    assert n > 0
    ranks = [r.rank_scaled for r in rows]
    # every node keeps at least the damping base; integer div only
    # leaks mass, so total rank never exceeds the initial mass
    assert all(r >= _PR_BASE for r in ranks)
    assert sum(ranks) <= n * _PR_SCALE
    # the graph is non-degenerate: co-purchased parts beat isolated ones
    assert max(ranks) > _PR_BASE


def test_pagerank_is_deterministic_across_repartition(spark):
    a = REGISTRY["pagerank_copurchase_parts"].spark(spark, SF)
    b = (
        REGISTRY["pagerank_copurchase_parts"]
        .spark(spark, SF)
        .repartition(7)
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pagerank_hub_outranks_leaves(spark, tmp_path):
    """Star graph via two-part orders {0,1}, {0,2}, {0,3}: the hub part 0
    has degree 3 and receives whole leaf ranks; each leaf receives only
    a third of the hub's rank — the hub must outrank every leaf, and
    the leaves tie by symmetry."""
    rows_in = [
        (o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01")
        for o, p in [(1, 0), (1, 1), (2, 0), (2, 2), (3, 0), (3, 3)]
    ]
    li = spark.createDataFrame(
        rows_in,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber bigint, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    li.coalesce(1).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    rows = {
        r.part_id: r.rank_scaled
        for r in REGISTRY["pagerank_copurchase_parts"].spark(spark, str(tmp_path)).collect()
    }
    assert rows[0] > rows[1]
    assert rows[1] == rows[2] == rows[3]


def test_triangle_count_k4(spark, tmp_path):
    """One order containing 4 parts forms K4: C(4,3) = 4 triangles, and
    every part participates in exactly C(3,2) = 3 of them. A second
    order sharing only 2 parts adds an edge but no triangle."""
    rows_in = [
        (1, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01")
        for p in (10, 11, 12, 13)
    ] + [
        (2, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01")
        for p in (13, 99)
    ]
    li = spark.createDataFrame(
        rows_in,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber bigint, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    li.coalesce(1).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    got = {
        r.part_id: r.n_triangles
        for r in REGISTRY["triangle_count_copurchase"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}  # part 99: no triangle
