"""Behavioral tests for the round-11 operators (llmprep + expstats):
semantics on crafted, hand-computed fixtures — complementing the
oracle hash checks the gate runs."""

from __future__ import annotations

import hashlib
import math

import duckdb

from stream_processing_spark.queries import REGISTRY


def _copy(con, tmp_path, table: str, select: str) -> None:
    con.execute(
        f"COPY ({select}) TO '{tmp_path}/{table}.parquet' (FORMAT PARQUET)"
    )


def _docs_fixture(con, tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    vals = ", ".join(
        "({}, '{}', '{}', '{}', {})".format(i, t, lg, s, len(t))
        for i, t, lg, s in rows
    )
    _copy(
        con, tmp_path, "documents",
        f"""SELECT CAST(c0 AS BIGINT) doc_id, c1 AS text, c2 AS lang,
                   c3 AS source, CAST(c4 AS BIGINT) n_chars
            FROM (VALUES {vals}) t(c0, c1, c2, c3, c4)""",
    )


def _toks(n: int) -> str:
    return " ".join(["t"] * n)


def test_packing_next_fit_walk(spark, tmp_path):
    """Shard 0 (ids ≡ 0 mod 8) with token counts [300,300,300,600,100]
    under budget 512: every doc overflows the open window (the 600-token
    doc gets its own), so windows are 0..4; shard 1 with [200,200,100]
    co-packs into one window."""
    con = duckdb.connect()
    rows = [
        (0, _toks(300), "en", "s"), (8, _toks(300), "en", "s"),
        (16, _toks(300), "en", "s"), (24, _toks(600), "en", "s"),
        (32, _toks(100), "en", "s"),
        (1, _toks(200), "en", "s"), (9, _toks(200), "en", "s"),
        (17, _toks(100), "en", "s"),
    ]
    _docs_fixture(con, tmp_path, rows)
    con.close()
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["window_id"])
        for r in REGISTRY["context_window_packing"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        0: (0, 300, 0), 8: (0, 300, 1), 16: (0, 300, 2),
        24: (0, 600, 3), 32: (0, 100, 4),
        1: (1, 200, 0), 9: (1, 200, 0), 17: (1, 100, 0),
    }


def test_rag_chunks_offsets_and_md5(spark, tmp_path):
    """len 350 → starts 0/150/300 with lens 200/200/50; len 150 → one
    chunk; md5 matches hashlib over the exact substring."""
    t350 = "x" * 349 + "y"
    t150 = "a" * 150
    con = duckdb.connect()
    _docs_fixture(con, tmp_path, [(0, t350, "en", "s"), (1, t150, "en", "s")])
    con.close()
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in REGISTRY["rag_chunk_offsets"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert {k for k in got} == {(0, 0), (0, 1), (0, 2), (1, 0)}
    assert [got[(0, k)]["start_offset"] for k in range(3)] == [0, 150, 300]
    assert [got[(0, k)]["chunk_len"] for k in range(3)] == [200, 200, 50]
    assert got[(1, 0)]["chunk_len"] == 150
    for (d, k), r in got.items():
        src = t350 if d == 0 else t150
        want = hashlib.md5(
            src[r["start_offset"]:r["start_offset"] + 200].encode()
        ).hexdigest()
        assert r["chunk_md5"] == want, (d, k)


def test_dpo_pairs_argmax_and_singleton_groups(spark, tmp_path):
    """TTR scores 0.25/1.0/0.5 → chosen=the 1.0 doc, rejected=the 0.25
    doc, margin 0.75; a tie on score breaks to the higher doc_id for
    chosen and lower for rejected; a 1-doc group emits nothing."""
    con = duckdb.connect()
    _docs_fixture(con, tmp_path, [
        (0, "a a a a", "en", "s"),      # ttr 0.25
        (1, "a b c d", "en", "s"),      # ttr 1.0
        (2, "a b a b", "en", "s"),      # ttr 0.5
        (3, "p q", "de", "s"),          # ttr 1.0 (tie group)
        (4, "r s", "de", "s"),          # ttr 1.0
        (5, "lonely doc", "fr", "s"),   # singleton group -> absent
    ])
    con.close()
    got = {
        (r["lang"], r["source"]): r
        for r in REGISTRY["dpo_preference_pairs"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == {("en", "s"), ("de", "s")}
    en = got[("en", "s")]
    assert (en["chosen_doc_id"], en["rejected_doc_id"]) == (1, 0)
    assert en["chosen_score"] == 1.0 and en["rejected_score"] == 0.25
    assert en["margin"] == 0.75
    de = got[("de", "s")]
    assert (de["chosen_doc_id"], de["rejected_doc_id"]) == (4, 3)
    assert de["margin"] == 0.0


def test_heaps_fit_two_point_slope(spark, tmp_path):
    """Two docs: 'a b' (N=2,V=2) then 'a c d' (N=5,V=4). The 2-point
    OLS slope equals (ln4−ln2)/(ln5−ln2) over the 6dp-rounded logs."""
    con = duckdb.connect()
    _docs_fixture(con, tmp_path, [
        (0, "a b", "en", "s"), (1, "a c d", "en", "s"),
    ])
    con.close()
    r = (
        REGISTRY["heaps_vocab_growth_fit"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_docs"], r["n_tokens"], r["vocab"]) == (2, 5, 4)
    lx = [round(math.log(2), 6), round(math.log(5), 6)]
    ly = [round(math.log(2), 6), round(math.log(4), 6)]
    b = (ly[1] - ly[0]) / (lx[1] - lx[0])
    k = math.exp((sum(ly) - b * sum(lx)) / 2)
    assert abs(r["heaps_b"] - b) < 1e-6
    assert abs(r["heaps_k"] - k) < 1e-6


def test_js_divergence_identical_zero_disjoint_ln2(spark, tmp_path):
    """Identical token distributions → JSD exactly 0 (every term has
    p=q so ln(p/m)=0); disjoint vocabularies → JSD = ln 2."""
    con = duckdb.connect()
    _docs_fixture(con, tmp_path, [
        (0, "a b a", "en", "s1"),
        (1, "a b a", "en", "s2"),   # identical distribution to s1
        (2, "x y x", "en", "s3"),   # disjoint vocab
    ])
    con.close()
    got = {
        (r["s1"], r["s2"]): r
        for r in REGISTRY["corpus_js_divergence_sources"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got[("s1", "s2")]["jsd_nats"] == 0.0
    assert abs(got[("s1", "s3")]["jsd_nats"] - math.log(2)) < 1e-6
    assert abs(got[("s2", "s3")]["jsd_nats"] - math.log(2)) < 1e-6
    assert got[("s1", "s3")]["vocab_union"] == 4  # {a,b} ∪ {x,y}


def _events_fixture(con, tmp_path, select):
    _copy(con, tmp_path, "events", select)


def test_mann_whitney_disjoint_halves(spark, tmp_path):
    """First half all value 1.00, second half all 2.00 → every A rank
    below every B rank ⇒ U_first = 0 and z < 0."""
    con = duckdb.connect()
    _events_fixture(con, tmp_path, """
        SELECT CAST(i AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (CASE WHEN i < 20 THEN 1 ELSE 9 END
                                         || ' days')::INTERVAL AS ts,
               CAST(i AS BIGINT) user_id, 'view' AS event_type,
               CAST(CASE WHEN i < 20 THEN 1.00 ELSE 2.00 END AS DOUBLE)
                   AS value,
               '{}' AS props
        FROM range(0, 50) t(i)""")
    con.close()
    r = (
        REGISTRY["mann_whitney_value_drift"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_first"], r["n_second"]) == (20, 30)
    assert r["u_first"] == 0.0
    assert r["z_mw"] < 0


def test_cuped_removes_linear_covariate_exactly(spark, tmp_path):
    """y = 2x per user (x in the first half-span, y in the second):
    θ = 2 exactly and both variants' adjusted means coincide at the
    global value — the covariate's variance is fully removed."""
    con = duckdb.connect()
    # users 0..3 with x = u+1: event at day 1 (value x) and day 8 (2x)
    _events_fixture(con, tmp_path, """
        SELECT CAST(u * 2 + h AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (CASE WHEN h = 0 THEN 1 ELSE 8 END
                                         || ' days')::INTERVAL AS ts,
               CAST(u AS BIGINT) user_id, 'view' AS event_type,
               CAST(CASE WHEN h = 0 THEN u + 1.0
                    ELSE 2.0 * (u + 1) END AS DOUBLE) AS value,
               '{}' AS props
        FROM range(0, 4) t(u) CROSS JOIN range(0, 2) s(h)""")
    con.close()
    got = {
        r["variant"]: r
        for r in REGISTRY["cuped_adjusted_ab_metric"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # x = [1,2,3,4], y = 2x; variant 0 = users {0,2}, variant 1 = {1,3}
    assert got[0]["theta"] == 2.0 and got[1]["theta"] == 2.0
    assert got[0]["mean_y"] == 4.0 and got[1]["mean_y"] == 6.0
    assert got[0]["mean_y_adj"] == 5.0 and got[1]["mean_y_adj"] == 5.0


def test_spearman_monotone_is_plus_minus_one(spark, tmp_path):
    """Strictly increasing price in quantity → ρ=1; strictly
    decreasing → ρ=−1 (no ties, exact)."""
    con = duckdb.connect()
    for direction, want in [("+", 1.0), ("-", -1.0)]:
        price = "10.0 + q" if direction == "+" else "100.0 - q"
        _copy(con, tmp_path, "lineitem", f"""
            SELECT CAST(q AS BIGINT) l_orderkey, CAST(q AS BIGINT) l_partkey,
                   CAST(1 AS BIGINT) l_suppkey, CAST(1 AS INT) l_linenumber,
                   CAST(q AS DOUBLE) l_quantity,
                   CAST({price} AS DOUBLE) l_extendedprice,
                   0.0 l_discount, 0.0 l_tax, 'N' l_returnflag,
                   'O' l_linestatus, TIMESTAMP '2024-01-01' l_shipdate
            FROM range(1, 21) t(q)""")
        r = (
            REGISTRY["spearman_quantity_price"]
            .spark(spark, str(tmp_path))
            .collect()[0]
        )
        assert r["n_rows"] == 20
        assert r["spearman_rho"] == want, direction
    con.close()


def test_nelson_aalen_hand_computed_curve(spark, tmp_path):
    """Lifetimes {0:2 deaths, 5:1 death, 10:1 censored} (horizon d10,
    censor window 3): risk sets 4/2/1, H = 0.5, 1.0, 1.0 and
    survival exp(−H)."""
    con = duckdb.connect()
    # u0,u1: single event d0 (lt 0); u2: d0+d5 (lt 5); u3: d0+d10 (lt 10)
    _events_fixture(con, tmp_path, """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (d || ' days')::INTERVAL AS ts,
               CAST(u AS BIGINT) user_id, 'view' AS event_type,
               1.0 AS value, '{}' AS props
        FROM (VALUES (0, 0), (1, 0), (2, 0), (2, 5), (3, 0), (3, 10))
             t(u, d)""")
    con.close()
    got = {
        r["lifetime_days"]: r
        for r in REGISTRY["nelson_aalen_cumulative_hazard"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert {k: (v["n_at_risk"], v["n_deaths"]) for k, v in got.items()} == {
        0: (4, 2), 5: (2, 1), 10: (1, 0)
    }
    assert got[0]["cum_hazard"] == 0.5
    assert got[5]["cum_hazard"] == 1.0
    assert got[10]["cum_hazard"] == 1.0
    assert abs(got[0]["survival_na"] - math.exp(-0.5)) < 1e-6
    assert abs(got[5]["survival_na"] - math.exp(-1.0)) < 1e-6


def test_chi2_perfect_association_cramers_one(spark, tmp_path):
    """First half all 'view', second half all 'click', 20+20 events:
    chi² = N = 40 exactly and Cramér's V = 1."""
    con = duckdb.connect()
    _events_fixture(con, tmp_path, """
        SELECT CAST(i AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (CASE WHEN i < 20 THEN 1 ELSE 9 END
                                         || ' days')::INTERVAL AS ts,
               CAST(i AS BIGINT) user_id,
               CASE WHEN i < 20 THEN 'view' ELSE 'click' END AS event_type,
               1.0 AS value, '{}' AS props
        FROM range(0, 40) t(i)""")
    con.close()
    r = (
        REGISTRY["chi2_event_type_drift"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_events"], r["n_types"], r["dof"]) == (40, 2, 1)
    assert r["chi2"] == 40.0
    assert r["cramers_v"] == 1.0


def test_streaming_psi_equals_batch_psi(spark):
    """The streaming twin's drained state reproduces the batch PSI
    report exactly (same oracle, same rows)."""
    sf = "/root/testdata/sf0.001"
    batch = sorted(
        map(tuple, REGISTRY["psi_value_drift"].spark(spark, sf).collect())
    )
    stream = sorted(
        map(
            tuple,
            REGISTRY["streaming_psi_drift_monitor"].spark(spark, sf).collect(),
        )
    )
    assert batch == stream
