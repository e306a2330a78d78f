"""Bloom-prefilter join: result invariance (the contract), no false
negatives, and real pruning even with an undersized filter."""

from __future__ import annotations

import hashlib  # noqa: F401  (kept for golden tests elsewhere)

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.operators import bloomjoin

SF = "/root/testdata/sf0.001"


def _build(spark):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    sel = orders.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    return lineitem, sel


def test_bloom_join_equals_plain_join(spark):
    lineitem, sel = _build(spark)
    plain = (
        lineitem.join(sel, lineitem.l_orderkey == sel.o_orderkey)
        .select("l_orderkey", "l_linenumber")
    )
    bloomed = bloomjoin.bloom_join(
        lineitem, sel, big_key="l_orderkey", build_key="o_orderkey"
    ).select("l_orderkey", "l_linenumber")
    assert sorted(map(tuple, bloomed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bloom_join_equality_survives_undersized_filter(spark):
    # a tiny bitset (256 bits for ~60 keys x 3 hashes) saturates with
    # false positives — selectivity dies, correctness must not
    lineitem, sel = _build(spark)
    plain = lineitem.join(
        sel, lineitem.l_orderkey == sel.o_orderkey
    ).count()
    bloomed = bloomjoin.bloom_join(
        lineitem, sel, big_key="l_orderkey", build_key="o_orderkey",
        m_bits=256, k_hashes=3,
    ).count()
    assert bloomed == plain


def test_prefilter_superset_and_selective(spark):
    lineitem, sel = _build(spark)
    true_keys = {r.o_orderkey for r in sel.collect()}
    pre = bloomjoin.bloom_prefilter(
        lineitem, sel, big_key="l_orderkey", build_key="o_orderkey"
    )
    kept_keys = {r.l_orderkey for r in pre.select("l_orderkey").distinct().collect()}
    all_keys = {
        r.l_orderkey
        for r in lineitem.select("l_orderkey").distinct().collect()
    }
    # no false negatives: every truly-matching key survives the filter
    assert (all_keys & true_keys) <= kept_keys
    # real pruning: at default sizing (64k bits) the FP rate is ~0, so
    # the kept set should be close to the true match set, far below all
    assert len(kept_keys) < len(all_keys)


def test_bit_positions_deterministic_and_seed_independent(spark):
    # the filter hashes must be deterministic across evaluations (build
    # and probe compute them independently — any instability would mean
    # false negatives) and the k seeds must give k distinct streams.
    # They derive from Spark's own xxhash64(seed_i, key), so recompute
    # via a second, independent expression path and compare.
    m_bits, k = 1 << 16, 3
    df = spark.createDataFrame([(424242,), (7,), (-1,)], "key bigint")
    cols = bloomjoin._bit_positions(F.col("key"), m_bits, k)
    got = df.select(*[c.alias(f"p{i}") for i, c in enumerate(cols)]).collect()
    again = df.selectExpr(
        *[f"pmod(xxhash64({i}, key), {m_bits}) AS p{i}" for i in range(k)]
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    # INDEPENDENT golden values (captured on Spark 4.1): build and
    # probe evaluate the hash in separate jobs, possibly separate
    # sessions/restarts — a Spark upgrade silently changing xxhash64
    # (or a pmod/cast edge) must fail HERE, not as bloom false
    # negatives in production
    assert [tuple(r) for r in got] == [
        (52791, 61691, 14055),   # key 424242
        (24332, 35765, 36727),   # key 7
        (49446, 59868, 19280),   # key -1
    ]
    for r in got:
        assert all(0 <= r[f"p{i}"] < m_bits for i in range(k))
    # seeds decorrelate: not all three positions identical for any key
    assert any(len({r[f"p{i}"] for i in range(k)}) > 1 for r in got)


def test_prefilter_is_map_side_only(spark):
    # the membership test must run in the scan stage: a pure
    # filter over the fact scan, no Exchange anywhere in its plan
    lineitem, sel = _build(spark)
    pre = bloomjoin.bloom_prefilter(
        lineitem, sel, big_key="l_orderkey", build_key="o_orderkey"
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "getbit" in plan.lower(), plan


def test_bloom_join_refuses_outer_joins(spark):
    import pytest

    lineitem, sel = _build(spark)
    with pytest.raises(ValueError, match="result-invariant"):
        bloomjoin.bloom_join(
            lineitem, sel, big_key="l_orderkey", build_key="o_orderkey",
            how="left_outer",
        )
