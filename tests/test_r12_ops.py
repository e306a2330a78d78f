"""Behavioral tests for the round-12 operators (expstats2 + curation7):
semantics on crafted, hand-computed fixtures — complementing the oracle
hash checks the gate runs (the r11 chi² lesson: both engines can agree
while both are wrong; only a fixture with a known answer catches it)."""

from __future__ import annotations

import duckdb

from stream_processing_spark.queries import REGISTRY


def _copy(con, tmp_path, table: str, select: str) -> None:
    con.execute(
        f"COPY ({select}) TO '{tmp_path}/{table}.parquet' (FORMAT PARQUET)"
    )


# ------------------------------------------------------ Kendall tau-b


def test_kendall_tau_hand_computed(spark, tmp_path):
    """(q,d) rows (1,1),(1,1),(2,3),(3,2) [d in cents]: concordant cell
    pairs P = 4, discordant Q = 1, tie terms T1 = T2 = 2 over
    n(n−1) = 12 ⇒ tau_b = 2·3/√(10·10) = 0.6 exactly."""
    con = duckdb.connect()
    _copy(con, tmp_path, "lineitem", """
        SELECT CAST(i AS BIGINT) l_orderkey, CAST(i AS BIGINT) l_partkey,
               CAST(i AS BIGINT) l_suppkey, CAST(1 AS INT) l_linenumber,
               CAST(q AS DOUBLE) l_quantity,
               CAST(10.0 AS DOUBLE) l_extendedprice,
               CAST(d AS DOUBLE) l_discount, CAST(0.0 AS DOUBLE) l_tax,
               'N' l_returnflag, 'O' l_linestatus,
               TIMESTAMP '2024-01-01' l_shipdate
        FROM (VALUES (0, 1, 0.01), (1, 1, 0.01),
                     (2, 2, 0.03), (3, 3, 0.02)) t(i, q, d)""")
    con.close()
    r = (
        REGISTRY["kendall_tau_quantity_discount"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_rows"] == 4
    assert r["conc_pairs"] == 4.0 and r["disc_pairs"] == 1.0
    assert r["tau_b"] == 0.6


# ------------------------------------------- rolling exact median


def test_rolling_median_hand_computed(spark, tmp_path):
    """Daily revenues 100/300/200/500/400 dollars: ramp-up medians in
    cents are 10000, 20000 (even: midpoint), 20000, 25000 (even),
    30000."""
    con = duckdb.connect()
    _copy(con, tmp_path, "orders", """
        SELECT CAST(i AS BIGINT) o_orderkey, CAST(i AS BIGINT) o_custkey,
               'O' o_orderstatus, CAST(p AS DOUBLE) o_totalprice,
               TIMESTAMP '2024-03-01' + (i || ' days')::INTERVAL
                   AS o_orderdate,
               '1-URGENT' o_orderpriority
        FROM (VALUES (0, 100.0), (1, 300.0), (2, 200.0),
                     (3, 500.0), (4, 400.0)) t(i, p)""")
    con.close()
    rows = sorted(
        REGISTRY["rolling_median_daily_revenue"]
        .spark(spark, str(tmp_path))
        .collect(),
        key=lambda r: r["day"],
    )
    assert [r["rev_cents"] for r in rows] == [
        10000, 30000, 20000, 50000, 40000
    ]
    assert [r["n_win"] for r in rows] == [1, 2, 3, 4, 5]
    assert [r["med_cents"] for r in rows] == [
        10000.0, 20000.0, 20000.0, 25000.0, 30000.0
    ]


# ------------------------------------------------ IPW Hájek estimator


def test_ipw_hand_computed(spark, tmp_path):
    """Stratum b=0 (1 event each): users 0-3, treated {1,3} both
    convert, control {0,2} don't. Stratum b=1 (2 events each): users
    4-7, treated {5,7} one converts, control {4,6} both convert.
    Hájek: mean_t = (2·4/2 + 1·4/2)/8 = 0.75,
    mean_c = (0 + 2·4/2)/8 = 0.5, ate = 0.25."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' ts, CAST(u AS BIGINT) user_id,
               et AS event_type, CAST(1.0 AS DOUBLE) AS value,
               '{}' AS props
        FROM (VALUES
            (0, 'view'), (1, 'purchase'), (2, 'view'), (3, 'purchase'),
            (4, 'purchase'), (4, 'view'),
            (5, 'purchase'), (5, 'view'),
            (6, 'purchase'), (6, 'view'),
            (7, 'view'), (7, 'view')) t(u, et)""")
    con.close()
    r = (
        REGISTRY["ipw_conversion_effect"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_users"], r["n_treated"]) == (8, 4)
    assert r["mean_treated"] == 0.75
    assert r["mean_control"] == 0.5
    assert r["ate_ipw"] == 0.25


# ------------------------------------------------------ Page-Hinkley


def test_page_hinkley_hand_computed(spark, tmp_path):
    """Daily means 100/100/400 cents, δ=5: steps −5/−5/+195 ⇒
    m = −5/−10/185, running min −5/−10/−10 ⇒ ph = 0/0/195; no alarm
    under λ=500."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(i AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (i || ' days')::INTERVAL AS ts,
               CAST(i AS BIGINT) user_id, 'view' event_type,
               CAST(v AS DOUBLE) AS value, '{}' AS props
        FROM (VALUES (0, 1.00), (1, 1.00), (2, 4.00)) t(i, v)""")
    con.close()
    rows = sorted(
        REGISTRY["page_hinkley_value_drift"]
        .spark(spark, str(tmp_path))
        .collect(),
        key=lambda r: r["day"],
    )
    assert [r["m_t"] for r in rows] == [-5.0, -10.0, 185.0]
    assert [r["ph_t"] for r in rows] == [0.0, 0.0, 195.0]
    assert [r["alarm"] for r in rows] == [False, False, False]


# ------------------------------------------------- cohort LTV matrix


def test_cohort_ltv_hand_computed(spark, tmp_path):
    """User 1 joins 2024-01 (10 in Jan, 20 in Feb), user 2 joins
    2024-02 (5 in Feb): cohort 202401 ages 0/1 carry ltv 10 then 30;
    cohort 202402 age 0 carries 5."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               CAST(d AS TIMESTAMP) ts, CAST(u AS BIGINT) user_id,
               'purchase' event_type, CAST(v AS DOUBLE) AS value,
               '{}' AS props
        FROM (VALUES (1, DATE '2024-01-15', 10.0),
                     (1, DATE '2024-02-10', 20.0),
                     (2, DATE '2024-02-20', 5.0)) t(u, d, v)""")
    con.close()
    got = {
        (r["cohort_ym"], r["age_months"]): (
            r["n_users"], r["rev"], r["ltv_per_user"]
        )
        for r in REGISTRY["cohort_ltv_matrix"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        (202401, 0): (1, 10.0, 10.0),
        (202401, 1): (1, 20.0, 30.0),
        (202402, 0): (1, 5.0, 5.0),
    }


# ------------------------------------------------ BM25F field weights


def test_bm25f_title_beats_body(spark, tmp_path):
    """Equal-length docs, same single query-term tf: the doc with the
    term in the TITLE field (weight 2, gentler b) must outscore the
    doc with it in the body; a doc without any query term is absent."""
    a = "scan f1 f2 f3 f4 b1 b2 b3 b4 b5"  # term at pos 0 → title
    b = "f1 f2 f3 f4 f5 scan b2 b3 b4 b5"  # term at pos 5 → body
    c = "f1 f2 f3 f4 f5 b1 b2 b3 b4 b5"    # no query term
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate([a, b, c])
    )
    _copy(con, tmp_path, "documents", f"""
        SELECT CAST(c0 AS BIGINT) doc_id, c1 AS text, 'en' lang,
               's' source, CAST(length(c1) AS BIGINT) n_chars
        FROM (VALUES {vals}) t(c0, c1)""")
    con.close()
    got = {
        r["doc_id"]: r["bm25f"]
        for r in REGISTRY["bm25f_topk_docs"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == {0, 1}
    assert got[0] > got[1] > 0


# ------------------------------------- survivor canonicalization map


def test_survivor_map_longest_wins_and_singletons(spark, tmp_path):
    """Docs 0 and 1 share 8 of doc 1's 10 shingles (J = 0.8): one
    cluster, survivor = doc 1 (more chars). Doc 5 is a singleton and
    survives itself."""
    d0 = "a b c d e f g h i j"
    d1 = d0 + " k l"  # superset text: longer, J = 8/10 = 0.8
    d5 = "q w e1 r t y u i1 o p"
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{t}')" for i, t in [(0, d0), (1, d1), (5, d5)]
    )
    _copy(con, tmp_path, "documents", f"""
        SELECT CAST(c0 AS BIGINT) doc_id, c1 AS text, 'en' lang,
               's' source, CAST(length(c1) AS BIGINT) n_chars
        FROM (VALUES {vals}) t(c0, c1)""")
    con.close()
    got = {
        r["doc_id"]: (
            r["cluster_id"], r["canonical_doc_id"], r["is_survivor"]
        )
        for r in REGISTRY["dedup_cc_survivor_map"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        0: (0, 1, False),
        1: (0, 1, True),
        5: (5, 5, True),
    }


# ------------------------------------------------ Mann-Kendall trend


def test_mann_kendall_strict_increase(spark, tmp_path):
    """Daily counts 1,2,3,4 (strictly increasing, no ties): S = 6,
    var = 4·3·13/18, z = (6−1)/√var."""
    import math

    con = duckdb.connect()
    # day i gets i+1 events (i = 0..3)
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (i || ' days')::INTERVAL AS ts,
               CAST(1 AS BIGINT) user_id, 'view' event_type,
               CAST(1.0 AS DOUBLE) AS value, '{}' AS props
        FROM range(0, 4) t(i), range(0, 10) s(j) WHERE j <= i""")
    con.close()
    r = (
        REGISTRY["mann_kendall_daily_trend"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_days"], r["s_stat"]) == (4, 6)
    assert r["z_mk"] == round(5 / math.sqrt(4 * 3 * 13 / 18), 6)


# ------------------------------------------------- winsorized mean


def test_winsorized_mean_hand_computed(spark, tmp_path):
    """Prices 1..40 dollars: P5 rank 2 → lo 200¢, P95 rank 38 → hi
    3800¢; clamped sum 81800¢ over 40 rows ⇒ mean 20.45."""
    con = duckdb.connect()
    _copy(con, tmp_path, "orders", """
        SELECT CAST(i AS BIGINT) o_orderkey, CAST(i AS BIGINT) o_custkey,
               'O' o_orderstatus, CAST(i AS DOUBLE) o_totalprice,
               TIMESTAMP '2024-01-01' o_orderdate, 'x' o_orderpriority
        FROM range(1, 41) t(i)""")
    con.close()
    r = (
        REGISTRY["winsorized_mean_price"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_rows"], r["lo_cents"], r["hi_cents"]) == (40, 200, 3800)
    assert r["winsorized_mean"] == 20.45


# ------------------------------------------------ longest user streak


def test_longest_streak_gaps_and_islands(spark, tmp_path):
    """User 1 active days {0,1,2,4,5} → longest 3 of 5; user 2 active
    one day → 1 of 1."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (d || ' days')::INTERVAL AS ts,
               CAST(u AS BIGINT) user_id, 'view' event_type,
               CAST(1.0 AS DOUBLE) AS value, '{}' AS props
        FROM (VALUES (1, 0), (1, 1), (1, 2), (1, 4), (1, 5),
                     (1, 5), (2, 9)) t(u, d)""")
    con.close()
    got = {
        r["user_id"]: (r["n_active_days"], r["longest_streak_days"])
        for r in REGISTRY["user_longest_streak"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {1: (5, 3), 2: (1, 1)}


# --------------------------------------------- cohort retention


def test_retention_triangle_hand_computed(spark, tmp_path):
    """Cohort 2024-01 = {u1, u2}: both active at age 0, only u1 at
    age 1 → retention 1.0 then 0.5; cohort 2024-02 = {u3} at 1.0."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               CAST(d AS TIMESTAMP) ts, CAST(u AS BIGINT) user_id,
               'view' event_type, CAST(1.0 AS DOUBLE) AS value,
               '{}' AS props
        FROM (VALUES (1, DATE '2024-01-05'), (1, DATE '2024-02-05'),
                     (2, DATE '2024-01-20'),
                     (3, DATE '2024-02-11')) t(u, d)""")
    con.close()
    got = {
        (r["cohort_ym"], r["age_months"]): (r["n_cohort"], r["n_active"],
                                            r["retention"])
        for r in REGISTRY["cohort_retention_triangle"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        (202401, 0): (2, 2, 1.0),
        (202401, 1): (2, 1, 0.5),
        (202402, 0): (1, 1, 1.0),
    }


# ------------------------------------- grouped value percentiles


def test_grouped_percentiles_rank_picks(spark, tmp_path):
    """Type 'view' with values 1..10 dollars: lower-order-statistic
    picks are p50 = 5.0 (rank 5), p90 = 9.0, p99 = 10.0."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(i AS BIGINT) event_id, TIMESTAMP '2024-01-01' ts,
               CAST(i AS BIGINT) user_id, 'view' event_type,
               CAST(i AS DOUBLE) AS value, '{}' AS props
        FROM range(1, 11) t(i)""")
    con.close()
    r = (
        REGISTRY["grouped_value_percentiles"]
        .spark(spark, str(tmp_path))
        .collect()
    )
    assert len(r) == 1 and r[0]["etype"] == "view"
    assert (r[0]["n_values"], r[0]["p50"], r[0]["p90"], r[0]["p99"]) == (
        10, 5.0, 9.0, 10.0,
    )


# ---------------------------------------------- HHI concentration


def test_hhi_hand_computed(spark, tmp_path):
    """Sources 3:1 → Σshare² = 0.625 ⇒ HHI 6250, effective 1.6."""
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(["a", "a", "a", "b"])
    )
    _copy(con, tmp_path, "documents", f"""
        SELECT CAST(c0 AS BIGINT) doc_id, 'w x y z' AS text,
               'en' AS lang, c1 AS source, CAST(7 AS BIGINT) n_chars
        FROM (VALUES {vals}) t(c0, c1)""")
    con.close()
    r = (
        REGISTRY["hhi_source_concentration"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_sources"], r["n_docs"]) == (2, 4)
    assert r["hhi"] == 6250.0
    assert r["effective_sources"] == 1.6


# ------------------------------------------------ Holt linear trend


def test_holt_recurrence_hand_computed(spark, tmp_path):
    """Two days with totals 100¢ then 200¢ (α=0.2, β=0.1, l₁=x₁,
    b₁=0): l₂ = 0.2·200 + 0.8·100 = 120, b₂ = 0.1·20 = 2,
    forecast = 120 + 7·2 = 134."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(i AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (i || ' days')::INTERVAL AS ts,
               CAST(i AS BIGINT) user_id, 'view' event_type,
               CAST(v AS DOUBLE) AS value, '{}' AS props
        FROM (VALUES (0, 1.00), (1, 2.00)) t(i, v)""")
    con.close()
    rows = sorted(
        REGISTRY["holt_linear_daily_trend"]
        .spark(spark, str(tmp_path))
        .collect(),
        key=lambda r: r["day"],
    )
    assert [(r["x_cents"], r["level"], r["trend"]) for r in rows] == [
        (100.0, 100.0, 0.0),
        (200.0, 120.0, 2.0),
    ]
    assert rows[1]["forecast_7d"] == 134.0


def test_streaming_page_hinkley_equals_batch(spark, tmp_path):
    """The drained streaming twin must reproduce the batch PH walk
    row-for-row on the same fixture."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(i AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + ((i % 5) || ' days')::INTERVAL
                   AS ts,
               CAST(i AS BIGINT) user_id, 'view' event_type,
               CAST((i % 7) + 0.25 AS DOUBLE) AS value, '{}' AS props
        FROM range(0, 40) t(i)""")
    con.close()
    batch = sorted(
        map(
            tuple,
            REGISTRY["page_hinkley_value_drift"]
            .spark(spark, str(tmp_path))
            .collect(),
        )
    )
    streamed = sorted(
        map(
            tuple,
            REGISTRY["streaming_page_hinkley_monitor"]
            .spark(spark, str(tmp_path))
            .collect(),
        )
    )
    assert batch == streamed and len(batch) == 5


# ------------------------------------------- stratified / DR ATE


def test_stratified_dr_equals_hand_strata(spark, tmp_path):
    """Same fixture as the IPW test: stratum diffs are +1 and −0.5
    with equal weights ⇒ ATE = 0.25 over all 8 users (every stratum
    has both arms)."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' ts, CAST(u AS BIGINT) user_id,
               et AS event_type, CAST(1.0 AS DOUBLE) AS value,
               '{}' AS props
        FROM (VALUES
            (0, 'view'), (1, 'purchase'), (2, 'view'), (3, 'purchase'),
            (4, 'purchase'), (4, 'view'),
            (5, 'purchase'), (5, 'view'),
            (6, 'purchase'), (6, 'view'),
            (7, 'view'), (7, 'view')) t(u, et)""")
    con.close()
    r = (
        REGISTRY["stratified_dr_ate"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_users"], r["n_overlap"]) == (8, 8)
    assert r["ate_dr"] == 0.25


# ----------------------------------------------- BH FDR drift gate


def test_bh_fdr_rejects_drifters_only(spark, tmp_path):
    """Types x and y swap dominance across the halves (strong drift);
    type z0 is balanced: BH at q=0.1 must reject x and y and keep z0
    (whose p ranks last)."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01'
                   + (CASE WHEN h = 0 THEN 1 ELSE 9 END
                      || ' days')::INTERVAL AS ts,
               CAST(ROW_NUMBER() OVER () AS BIGINT) user_id,
               et AS event_type, CAST(1.0 AS DOUBLE) AS value,
               '{}' AS props
        FROM (
            SELECT 0 AS h, 'x' AS et FROM range(40)
            UNION ALL SELECT 0, 'y' FROM range(10)
            UNION ALL SELECT 0, 'z0' FROM range(25)
            UNION ALL SELECT 1, 'x' FROM range(10)
            UNION ALL SELECT 1, 'y' FROM range(40)
            UNION ALL SELECT 1, 'z0' FROM range(25)
        ) t""")
    con.close()
    got = {
        r["etype"]: (r["reject"], r["p_rank"])
        for r in REGISTRY["bh_fdr_type_drift"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got["x"][0] and got["y"][0]
    assert not got["z0"][0] and got["z0"][1] == 3


# ---------------------------------------- degenerate-input sweeps

R12_BATCH = [
    "kendall_tau_quantity_discount", "rolling_median_daily_revenue",
    "ipw_conversion_effect", "page_hinkley_value_drift",
    "cohort_ltv_matrix", "mann_kendall_daily_trend",
    "winsorized_mean_price", "user_longest_streak",
    "cohort_retention_triangle", "grouped_value_percentiles",
    "hhi_source_concentration", "bm25f_topk_docs",
    "dedup_cc_survivor_map", "holt_linear_daily_trend",
    "stratified_dr_ate", "bh_fdr_type_drift",
    "median_ci_orders", "lorenz_user_activity_deciles",
    "markov_steady_state_event_types",
]


def _empty_tables(con, tmp_path):
    con.execute(f"""COPY (SELECT CAST(1 AS BIGINT) event_id,
        TIMESTAMP '2024-01-01' ts, CAST(1 AS BIGINT) user_id,
        'view' event_type, CAST(1.0 AS DOUBLE) AS value, '' AS props
        WHERE false) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT CAST(1 AS BIGINT) o_orderkey,
        CAST(1 AS BIGINT) o_custkey, 'O' o_orderstatus,
        CAST(1.0 AS DOUBLE) o_totalprice,
        TIMESTAMP '2024-01-01' o_orderdate, 'x' o_orderpriority
        WHERE false) TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT CAST(1 AS BIGINT) l_orderkey,
        CAST(1 AS BIGINT) l_partkey, CAST(1 AS BIGINT) l_suppkey,
        CAST(1 AS INT) l_linenumber, CAST(1.0 AS DOUBLE) l_quantity,
        CAST(1.0 AS DOUBLE) l_extendedprice,
        CAST(0.0 AS DOUBLE) l_discount, CAST(0.0 AS DOUBLE) l_tax,
        'N' l_returnflag, 'O' l_linestatus,
        TIMESTAMP '2024-01-01' l_shipdate
        WHERE false) TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT CAST(1 AS BIGINT) doc_id, '' AS text,
        'en' AS lang, 's' AS source, CAST(0 AS BIGINT) n_chars
        WHERE false) TO '{tmp_path}/documents.parquet'
        (FORMAT PARQUET)""")


def _oracle_on(tmp_path, tables):
    ora = duckdb.connect()
    for t in tables:
        ora.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return ora


def test_r12_empty_tables_match_oracle(spark, tmp_path):
    """An empty day-slice must yield the oracle's (usually empty or
    NULL-carrying 1-row) answer, never a compile/driver error."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from oracle_util import compare

    con = duckdb.connect()
    _empty_tables(con, tmp_path)
    con.close()
    ora = _oracle_on(tmp_path, ["events", "orders", "lineitem",
                                "documents"])
    for name in R12_BATCH:
        spec = REGISTRY[name]
        compare(
            spec.spark(spark, str(tmp_path)),
            ora.sql(spec.oracle),
            f"empty:{name}",
        )
    ora.close()


def test_r12_null_bearing_rows_match_oracle(spark, tmp_path):
    """NULL ts/value/user_id/event_type/price/quantity/discount/text
    rows mixed with real ones: every r12 query must agree with its
    oracle exactly (pairwise deletion and documented exclusions are
    pinned on BOTH engines)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from oracle_util import compare

    con = duckdb.connect()
    con.execute(f"""COPY (
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               CASE WHEN i % 5 = 0 THEN NULL
                    ELSE TIMESTAMP '2024-01-01'
                         + ((i % 9) || ' days')::INTERVAL END AS ts,
               CASE WHEN i % 7 = 0 THEN NULL
                    ELSE CAST(i % 6 AS BIGINT) END AS user_id,
               CASE WHEN i % 11 = 0 THEN NULL
                    WHEN i % 2 = 0 THEN 'view' ELSE 'purchase' END
                   AS event_type,
               CASE WHEN i % 3 = 0 THEN NULL
                    ELSE CAST((i % 13) + 0.25 AS DOUBLE) END AS value,
               '' AS props
        FROM range(0, 120) t(i))
        TO '{tmp_path}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
        SELECT CAST(i AS BIGINT) o_orderkey, CAST(i AS BIGINT) o_custkey,
               'O' o_orderstatus,
               CASE WHEN i % 4 = 0 THEN NULL
                    ELSE CAST((i % 17) + 10.5 AS DOUBLE) END
                   AS o_totalprice,
               CASE WHEN i % 6 = 0 THEN NULL
                    ELSE TIMESTAMP '2024-02-01'
                         + ((i % 8) || ' days')::INTERVAL END
                   AS o_orderdate,
               'x' o_orderpriority
        FROM range(0, 80) t(i))
        TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
        SELECT CAST(i AS BIGINT) l_orderkey,
               CAST(i % 9 AS BIGINT) l_partkey,
               CAST(i AS BIGINT) l_suppkey, CAST(1 AS INT) l_linenumber,
               CASE WHEN i % 5 = 0 THEN NULL
                    ELSE CAST((i % 7) + 1.0 AS DOUBLE) END AS l_quantity,
               CASE WHEN i % 8 = 0 THEN NULL
                    ELSE CAST((i % 11) * 3.5 + 1 AS DOUBLE) END
                   AS l_extendedprice,
               CASE WHEN i % 6 = 0 THEN NULL
                    ELSE CAST((i % 4) * 0.01 AS DOUBLE) END
                   AS l_discount,
               CAST(0.0 AS DOUBLE) l_tax, 'N' l_returnflag,
               'O' l_linestatus, TIMESTAMP '2024-01-01' l_shipdate
        FROM range(0, 90) t(i))
        TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
        SELECT CAST(i AS BIGINT) doc_id,
               CASE WHEN i % 6 = 0 THEN NULL
                    WHEN i % 6 = 1 THEN ''
                    ELSE 'merge scan w' || (i % 4) || ' x y z a b c'
                    END AS text,
               'en' AS lang,
               CASE WHEN i % 9 = 0 THEN NULL
                    ELSE 's' || (i % 3) END AS source,
               CAST(i % 40 AS BIGINT) n_chars
        FROM range(0, 60) t(i))
        TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)""")
    con.close()
    ora = _oracle_on(tmp_path, ["events", "orders", "lineitem",
                                "documents"])
    for name in R12_BATCH:
        spec = REGISTRY[name]
        compare(
            spec.spark(spark, str(tmp_path)),
            ora.sql(spec.oracle),
            f"nulls:{name}",
        )
    ora.close()


# -------------------------------------------- median order-stat CI


def test_median_ci_hand_computed(spark, tmp_path):
    """Prices 1..25: k_med = 13 → 13.0; z√n = 9.7998 ⇒ k_lo = ⌊7.60⌋ =
    7 → 7.0 and k_hi = ⌈18.40⌉ = 19 → 19.0."""
    con = duckdb.connect()
    _copy(con, tmp_path, "orders", """
        SELECT CAST(i AS BIGINT) o_orderkey, CAST(i AS BIGINT) o_custkey,
               'O' o_orderstatus, CAST(i AS DOUBLE) o_totalprice,
               TIMESTAMP '2024-01-01' o_orderdate, 'x' o_orderpriority
        FROM range(1, 26) t(i)""")
    con.close()
    r = (
        REGISTRY["median_ci_orders"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r["n_rows"], r["median"], r["ci_lo"], r["ci_hi"]) == (
        25, 13.0, 7.0, 19.0,
    )


# ------------------------------------------------ Lorenz deciles


def test_lorenz_deciles_hand_computed(spark, tmp_path):
    """Activities [1,1,1,1,6] (nu=5, ne=10): the bottom 4 users carry
    1/10 each; the top user carries 6/10 — deciles step 0.1/0.2/0.3/
    0.4 then jump to 1.0 when the heavy user enters at kg=5."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' ts, CAST(u AS BIGINT) user_id,
               'view' event_type, CAST(1.0 AS DOUBLE) AS value,
               '' AS props
        FROM (
            SELECT 1 AS u UNION ALL SELECT 2 UNION ALL SELECT 3
            UNION ALL SELECT 4
            UNION ALL SELECT 5 FROM range(6)
        ) t""")
    con.close()
    got = {
        r["decile"]: (r["n_users_in"], r["cum_event_share"])
        for r in REGISTRY["lorenz_user_activity_deciles"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        1: (1, 0.1), 2: (1, 0.1), 3: (2, 0.2), 4: (2, 0.2),
        5: (3, 0.3), 6: (3, 0.3), 7: (4, 0.4), 8: (4, 0.4),
        9: (5, 1.0), 10: (5, 1.0),
    }


# --------------------------------------------- Markov steady state


def test_markov_power_steps_hand_computed(spark, tmp_path):
    """Transitions A→B, B→A (user 1: A,B,A) and A→A (user 2: A,A) give
    P[A]=(.5,.5), P[B]=(1,0); three power steps from uniform:
    (.75,.25) → (.625,.375) → (.6875,.3125)."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (k || ' hours')::INTERVAL AS ts,
               CAST(u AS BIGINT) user_id, et AS event_type,
               CAST(1.0 AS DOUBLE) AS value, '' AS props
        FROM (VALUES (1, 0, 'A'), (1, 1, 'B'), (1, 2, 'A'),
                     (2, 0, 'A'), (2, 1, 'A')) t(u, k, et)""")
    con.close()
    got = {
        r["etype"]: r["steady_p"]
        for r in REGISTRY["markov_steady_state_event_types"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {"A": 0.6875, "B": 0.3125}


def test_markov_sink_state_self_loops(spark, tmp_path):
    """A type that only ever appears as a FINAL event (no outgoing
    transitions) must self-loop, preserving probability mass: with
    A→Z only, all mass drains into Z."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (k || ' hours')::INTERVAL AS ts,
               CAST(u AS BIGINT) user_id, et AS event_type,
               CAST(1.0 AS DOUBLE) AS value, '' AS props
        FROM (VALUES (1, 0, 'A'), (1, 1, 'Z'),
                     (2, 0, 'A'), (2, 1, 'Z')) t(u, k, et)""")
    con.close()
    got = {
        r["etype"]: r["steady_p"]
        for r in REGISTRY["markov_steady_state_event_types"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # pi0 = (.5, .5); A's mass moves to Z in one step and stays
    assert got == {"A": 0.0, "Z": 1.0}
