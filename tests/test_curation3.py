"""Unit tests for the batch-2 curation operators (curation3.py):
Misra-Gries heavy hitters, duplicate-span dedup, temperature mixture
weights, CDC latest-change apply. Oracle hash-matches run in
test_oracle_queries.py; these tests cover the adversarial / boundary
behavior the fixture data cannot.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stream_processing_spark.queries import REGISTRY
from stream_processing_spark.queries.curation3 import (
    _HH_SHARE_DEN,
    _MG_CAP,
    _SPAN_W,
    _mg_candidates,
)


# ------------------------------------------------------- heavy hitters


def test_mg_candidates_superset_beyond_capacity(spark):
    """Vocabulary >> sketch capacity: every true heavy hitter must
    survive the per-partition Misra-Gries stage (the superset
    guarantee the exact recount depends on)."""
    # 3 heavy tokens (3000 occurrences each) drowned in 3x the sketch
    # capacity of unique rare tokens, shuffled deterministically.
    rows = [f"heavy_{i % 3}" for i in range(9000)] + [
        f"rare_{i}" for i in range(3 * _MG_CAP)
    ]
    df = (
        spark.createDataFrame([(t,) for t in rows], "token string")
        .orderBy(F.md5("token"))  # interleave heavies among rares
        .repartition(4)
    )
    total = len(rows)
    cands = set(
        r.token
        for r in df.mapInPandas(_mg_candidates, schema="token string")
        .distinct()
        .collect()
    )
    assert len(cands) <= 4 * (_MG_CAP + 1)  # bounded state per partition
    exact = {
        r.token
        for r in df.groupBy("token")
        .count()
        .where(F.col("count") * _HH_SHARE_DEN >= total)
        .collect()
    }
    assert exact == {"heavy_0", "heavy_1", "heavy_2"}
    assert exact <= cands


def _write_documents(spark, path: str, rows: list[tuple[int, str]]) -> str:
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.parquet(os.path.join(path, "documents.parquet"))
    return path


def test_heavy_hitter_query_on_synthetic_dir(spark, tmp_path):
    # one dominant token, the rest unique -> exactly one heavy hitter
    docs = [(0, " ".join(["dup"] * 120)), (1, " ".join(f"u{i}" for i in range(40)))]
    d = _write_documents(spark, str(tmp_path), docs)
    out = REGISTRY["heavy_hitter_tokens"].spark(spark, d).collect()
    by_tok = {r.token: r for r in out}
    assert "dup" in by_tok and by_tok["dup"].n_occurrences == 120
    assert all(
        r.n_occurrences * _HH_SHARE_DEN >= 160 for r in out
    )  # threshold holds for every returned row


# ------------------------------------------------ duplicate span dedup


def test_duplicate_spans_detects_exact_window_and_boundaries(spark, tmp_path):
    shared = [f"s{i}" for i in range(_SPAN_W)]  # exactly W shared tokens
    doc_a = " ".join(["a0", *shared, "a1"])
    doc_b = " ".join(["b0", "b1", *shared])
    # doc_c shares only W-1 tokens -> must NOT produce a cross-doc span
    doc_c = " ".join([*shared[:-1], "c0", "c1"])
    d = _write_documents(
        spark, str(tmp_path), [(0, doc_a), (1, doc_b), (2, doc_c)]
    )
    out = REGISTRY["dedup_duplicate_spans"].spark(spark, d).collect()
    # exactly one cross-doc span: the shared W-token run in docs 0 and 1
    assert len(out) == 1
    row = out[0]
    assert row.n_docs == 2 and row.n_occurrences == 2 and row.first_doc_id == 0


def test_duplicate_spans_counts_within_doc_repeats(spark, tmp_path):
    span = " ".join(f"t{i}" for i in range(_SPAN_W))
    # the span occurs twice in doc 0 (separated) and once in doc 1
    d = _write_documents(
        spark,
        str(tmp_path),
        [(0, f"{span} x0 x1 x2 x3 x4 x5 x6 x7 {span}"), (1, span)],
    )
    rows = REGISTRY["dedup_duplicate_spans"].spark(spark, d).collect()
    target = [r for r in rows if r.n_docs == 2]
    assert any(r.n_occurrences == 3 for r in target)


# ------------------------------------- temperature mixture weights


def test_temperature_weights_sum_to_one_and_flatten(spark):
    out = REGISTRY["mixture_temperature_weights"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 5
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-5
    # temperature 0.5 flattens: weight ratio strictly tighter than count ratio
    hi = max(out, key=lambda r: r.n_docs)
    lo = min(out, key=lambda r: r.n_docs)
    if hi.n_docs > lo.n_docs:
        assert hi.weight / lo.weight < hi.n_docs / lo.n_docs


# --------------------------------------------- CDC latest-change apply


def test_cdc_apply_covers_all_merge_paths(spark):
    out = REGISTRY["cdc_apply_latest_changes"].spark(
        spark, "/root/testdata/sf0.01"
    )
    ops = {r.change_op for r in out.select("change_op").distinct().collect()}
    assert ops == {"keep", "update", "insert"}
    # no deleted key survives: every even-custkey whose latest change is
    # an error must be absent from the output
    assert out.where(F.col("cust_id").isNull()).count() == 0
    # keys are unique after apply (MERGE invariant)
    n = out.count()
    assert out.select("cust_id").distinct().count() == n
