"""Property tests for the round-11 statistics/packing operators:
mathematical invariants on randomized fixtures (hypothesis), next to
the hand-computed semantics tests in test_r11_ops.py."""

from __future__ import annotations

import math

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_processing_spark.queries import REGISTRY

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text) — lang/source fixed."""
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con.execute(
        f"""COPY (SELECT CAST(c0 AS BIGINT) doc_id, c1 AS text,
                         'en' AS lang, 'src' AS source,
                         CAST(length(c1) AS BIGINT) n_chars
                  FROM (VALUES {vals}) t(c0, c1))
            TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()


def _write_events_values(tmp_path, vals_a, vals_b):
    """Two halves of the day span with the given value lists."""
    con = duckdb.connect()
    rows = [(i, 1, v) for i, v in enumerate(vals_a)] + [
        (1000 + i, 9, v) for i, v in enumerate(vals_b)
    ]
    vv = ", ".join(f"({e}, {d}, {v})" for e, d, v in rows)
    con.execute(
        f"""COPY (SELECT CAST(c0 AS BIGINT) event_id,
                         TIMESTAMP '2024-01-01'
                           + (c1 || ' days')::INTERVAL AS ts,
                         CAST(c0 % 7 AS BIGINT) user_id,
                         'view' AS event_type,
                         CAST(c2 AS DOUBLE) AS value, '{{}}' AS props
                  FROM (VALUES {vv}) t(c0, c1, c2))
            TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()


_tok_counts = st.lists(st.integers(1, 700), min_size=1, max_size=20)


@given(counts=_tok_counts)
@SET
def test_packing_invariants(spark, tmp_path_factory, counts):
    """Next-fit invariants on random token counts: (1) a window's fill
    exceeds the budget only when it holds a single oversized doc;
    (2) window ids are contiguous from 0 per shard and non-decreasing
    in doc order; (3) every doc appears exactly once."""
    tmp = tmp_path_factory.mktemp("pack")
    _write_docs(tmp, [(i, " ".join(["t"] * n)) for i, n in enumerate(counts)])
    rows = sorted(
        (
            (r["shard"], r["doc_id"], r["n_tokens"], r["window_id"])
            for r in REGISTRY["context_window_packing"]
            .spark(spark, str(tmp))
            .collect()
        )
    )
    assert len(rows) == len(counts)
    assert {d for _, d, _, _ in rows} == set(range(len(counts)))
    from stream_processing_spark.queries.llmprep import _PACK_BUDGET

    by_shard: dict[int, list] = {}
    for s, d, n, w in rows:
        by_shard.setdefault(s, []).append((d, n, w))
    for s, docs in by_shard.items():
        docs.sort()
        wins = [w for _, _, w in docs]
        assert wins[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(wins, wins[1:])), wins
        fills: dict[int, list[int]] = {}
        for _, n, w in docs:
            fills.setdefault(w, []).append(n)
        for w, ns in fills.items():
            if sum(ns) > _PACK_BUDGET:
                assert len(ns) == 1 and ns[0] > _PACK_BUDGET, (w, ns)


_vals = st.lists(
    st.integers(1, 30).map(lambda c: c / 4), min_size=1, max_size=25
)


@given(va=_vals, vb=_vals)
@SET
def test_mann_whitney_complementarity(spark, tmp_path_factory, va, vb):
    """U_first + U_second = n_a · n_b (rank-sum complementarity): the
    second-half U computed by swapping the halves must complement the
    reported first-half U exactly."""
    tmp = tmp_path_factory.mktemp("mw")
    _write_events_values(tmp, va, vb)
    r = (
        REGISTRY["mann_whitney_value_drift"]
        .spark(spark, str(tmp))
        .collect()[0]
    )
    na, nb = r["n_first"], r["n_second"]
    assert (na, nb) == (len(va), len(vb))
    tmp2 = tmp_path_factory.mktemp("mw2")
    _write_events_values(tmp2, vb, va)
    r2 = (
        REGISTRY["mann_whitney_value_drift"]
        .spark(spark, str(tmp2))
        .collect()[0]
    )
    assert r["u_first"] + r2["u_first"] == na * nb
    # z is antisymmetric under the swap (up to the 6dp rounding)
    if r["z_mw"] is not None and r2["z_mw"] is not None:
        assert abs(r["z_mw"] + r2["z_mw"]) <= 2e-6


_texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=12).filter(
        lambda t: t.strip() != ""
    ),
    min_size=1,
    max_size=8,
)


@given(ta=_texts, tb=_texts)
@SET
def test_js_divergence_bounds_and_symmetry(spark, tmp_path_factory, ta, tb):
    """0 ≤ JSD ≤ ln 2, and swapping the two sources leaves the value
    unchanged (the divergence is symmetric by construction)."""
    tmp = tmp_path_factory.mktemp("js")
    rows = [(i, t.strip()) for i, t in enumerate(ta)] + [
        (100 + i, t.strip()) for i, t in enumerate(tb)
    ]
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{t}', '{'s1' if i < 100 else 's2'}')" for i, t in rows
    )
    con.execute(
        f"""COPY (SELECT CAST(c0 AS BIGINT) doc_id, c1 AS text,
                         'en' AS lang, c2 AS source,
                         CAST(length(c1) AS BIGINT) n_chars
                  FROM (VALUES {vals}) t(c0, c1, c2))
            TO '{tmp}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    out = (
        REGISTRY["corpus_js_divergence_sources"]
        .spark(spark, str(tmp))
        .collect()
    )
    if not out:  # one side had only empty-token docs
        return
    r = out[0]
    assert -1e-9 <= r["jsd_nats"] <= math.log(2) + 1e-6
    # symmetry: swap the source labels and compare
    tmp2 = tmp_path_factory.mktemp("js2")
    con = duckdb.connect()
    vals2 = ", ".join(
        f"({i}, '{t}', '{'s2' if i < 100 else 's1'}')" for i, t in rows
    )
    con.execute(
        f"""COPY (SELECT CAST(c0 AS BIGINT) doc_id, c1 AS text,
                         'en' AS lang, c2 AS source,
                         CAST(length(c1) AS BIGINT) n_chars
                  FROM (VALUES {vals2}) t(c0, c1, c2))
            TO '{tmp2}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    r2 = (
        REGISTRY["corpus_js_divergence_sources"]
        .spark(spark, str(tmp2))
        .collect()[0]
    )
    assert abs(r["jsd_nats"] - r2["jsd_nats"]) <= 2e-9
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (
        r2["n_tokens_b"],
        r2["n_tokens_a"],
    )


@given(
    qp=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 40)),
        min_size=3,
        max_size=30,
    )
)
@SET
def test_spearman_bounds_and_self_correlation(
    spark, tmp_path_factory, qp
):
    """|ρ| ≤ 1 on random (quantity, price) rows; price == quantity
    gives exactly ρ = 1 (identical rank vectors, ties included)."""
    tmp = tmp_path_factory.mktemp("sp")
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {q}, {p})" for i, (q, p) in enumerate(qp))
    con.execute(
        f"""COPY (SELECT CAST(c0 AS BIGINT) l_orderkey,
                         CAST(c0 AS BIGINT) l_partkey,
                         CAST(1 AS BIGINT) l_suppkey,
                         CAST(1 AS INT) l_linenumber,
                         CAST(c1 AS DOUBLE) l_quantity,
                         CAST(c2 AS DOUBLE) l_extendedprice,
                         0.0 l_discount, 0.0 l_tax, 'N' l_returnflag,
                         'O' l_linestatus,
                         TIMESTAMP '2024-01-01' l_shipdate
                  FROM (VALUES {vals}) t(c0, c1, c2))
            TO '{tmp}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    r = (
        REGISTRY["spearman_quantity_price"].spark(spark, str(tmp)).collect()[0]
    )
    if r["spearman_rho"] is not None:  # constant column ⇒ NULL
        assert -1 - 1e-9 <= r["spearman_rho"] <= 1 + 1e-9
    # self-correlation: price = quantity exactly
    tmp2 = tmp_path_factory.mktemp("sp2")
    con = duckdb.connect()
    vals2 = ", ".join(f"({i}, {q})" for i, (q, _) in enumerate(qp))
    con.execute(
        f"""COPY (SELECT CAST(c0 AS BIGINT) l_orderkey,
                         CAST(c0 AS BIGINT) l_partkey,
                         CAST(1 AS BIGINT) l_suppkey,
                         CAST(1 AS INT) l_linenumber,
                         CAST(c1 AS DOUBLE) l_quantity,
                         CAST(c1 AS DOUBLE) l_extendedprice,
                         0.0 l_discount, 0.0 l_tax, 'N' l_returnflag,
                         'O' l_linestatus,
                         TIMESTAMP '2024-01-01' l_shipdate
                  FROM (VALUES {vals2}) t(c0, c1))
            TO '{tmp2}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    r2 = (
        REGISTRY["spearman_quantity_price"]
        .spark(spark, str(tmp2))
        .collect()[0]
    )
    if len({q for q, _ in qp}) > 1:
        assert r2["spearman_rho"] == 1.0
    else:
        assert r2["spearman_rho"] is None  # zero rank variance
