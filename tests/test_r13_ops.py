"""Behavioral tests for the round-13 operators (expstats3 + the
curation7 langid upgrade): semantics on crafted, hand-computed
fixtures — complementing the oracle hash checks the gate runs (the
r11 chi² lesson: both engines can agree while both are wrong; only a
fixture with a known answer catches it) — plus the r12-style
empty-table and NULL-bearing oracle sweeps over the whole batch."""

from __future__ import annotations

import math

import duckdb

from stream_processing_spark.queries import REGISTRY

from test_r12_ops import _copy, _empty_tables, _oracle_on  # noqa: F401


def _events_values(con, tmp_path, values):
    """events.parquet with one row per value (types/users irrelevant)."""
    rows = ", ".join(f"({i}, {v!r})" for i, v in enumerate(values))
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(i AS BIGINT) event_id, TIMESTAMP '2024-01-01' ts,
               CAST(i AS BIGINT) user_id, 'view' event_type,
               CAST(v AS DOUBLE) AS value, '' AS props
        FROM (VALUES {rows}) t(i, v)""")


# ------------------------------------------------- t-digest quantiles


def _tdigest_expected(cents_counts):
    """Independent python twin of the k1-clustered digest."""
    n = sum(c for _, c in cents_counts)
    cum = 0
    cents = sorted(cents_counts)
    clusters: dict[int, list[int]] = {}
    for c, cnt in cents:
        cum += cnt
        arg = (2 * cum - cnt - n) / n
        k = round(15.915494309189535 * math.asin(arg), 9)
        cid = math.floor(k)
        clusters.setdefault(cid, []).append((c, cnt))
    cent = sorted(
        (cid, sum(ct for _, ct in vs),
         round(sum(c * ct for c, ct in vs)
               / sum(ct for _, ct in vs) / 100, 6))
        for cid, vs in clusters.items()
    )

    def pick(p):
        kp = -(-p * n // 100)  # ceil
        cw = 0
        for _, w, mean in cent:
            cw += w
            if cw >= kp:
                return mean
        return None

    return n, len(cent), max(w for _, w, _ in cent), pick(50), \
        pick(90), pick(99)


def test_tdigest_hand_computed(spark, tmp_path):
    """Ten values 1.00..10.00: the python twin (same k1 math, written
    independently of the Spark expression tree) pins every output."""
    con = duckdb.connect()
    vals = [float(i) for i in range(1, 11)]
    _events_values(con, tmp_path, vals)
    con.close()
    r = (
        REGISTRY["tdigest_value_quantiles"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    n, ncent, maxw, q50, q90, q99 = _tdigest_expected(
        [(int(v * 100), 1) for v in vals]
    )
    assert r["n_values"] == n == 10
    assert r["n_centroids"] == ncent
    assert r["max_centroid_w"] == maxw
    assert (r["q50"], r["q90"], r["q99"]) == (q50, q90, q99)
    # tail centroids of the k1 scale are singletons: the extreme
    # values must sit in their own clusters, so q99 is the exact max
    assert r["q99"] == 10.0


def test_tdigest_order_independent(spark, tmp_path):
    """The digest depends only on the value DISTRIBUTION (the
    mergeability precondition): a shuffled, differently-partitioned
    copy of the same multiset yields the bit-identical sketch."""
    con = duckdb.connect()
    vals = [((i * 37) % 100) / 4.0 for i in range(200)]
    _events_values(con, tmp_path, vals)
    con.close()
    a = sorted(
        map(tuple, REGISTRY["tdigest_value_quantiles"]
            .spark(spark, str(tmp_path)).collect())
    )
    con = duckdb.connect()
    _events_values(con, tmp_path, list(reversed(sorted(vals))))
    con.close()
    b = sorted(
        map(tuple, REGISTRY["tdigest_value_quantiles"]
            .spark(spark, str(tmp_path)).collect())
    )
    assert a == b


def test_tdigest_merge_error_bound(spark, tmp_path):
    """Mergeability: re-clustering the union of two halves' centroid
    sets (each centroid re-entered at its mean with its weight) gives
    quantiles within one centroid span of the direct digest — the
    k1 bound the docstring claims."""
    con = duckdb.connect()
    vals = [((i * 53) % 997) / 10.0 for i in range(500)]
    _events_values(con, tmp_path, vals)
    con.close()
    direct = (
        REGISTRY["tdigest_value_quantiles"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )

    def centroids(half):
        hist: dict[int, int] = {}
        for v in half:
            c = math.floor(v * 100)
            hist[c] = hist.get(c, 0) + 1
        n = sum(hist.values())
        cum, out = 0, []
        for c in sorted(hist):
            cnt = hist[c]
            cum += cnt
            arg = (2 * cum - cnt - n) / n
            cid = math.floor(
                round(15.915494309189535 * math.asin(arg), 9)
            )
            out.append((cid, c, cnt))
        agg: dict[int, list[int]] = {}
        for cid, c, cnt in out:
            w = agg.setdefault(cid, [0, 0])
            w[0] += cnt
            w[1] += c * cnt
        return [(sw / w, w) for w, sw in agg.values()]

    half_a = centroids(vals[: len(vals) // 2])
    half_b = centroids(vals[len(vals) // 2:])
    merged = sorted(half_a + half_b)
    # re-cluster the merged centroid list by cumulative rank midpoint
    n = sum(w for _, w in merged)
    cum, agg = 0, {}
    for mean, w in merged:
        cum += w
        arg = (2 * cum - w - n) / n
        cid = math.floor(round(15.915494309189535 * math.asin(arg), 9))
        a = agg.setdefault(cid, [0, 0.0])
        a[0] += w
        a[1] += mean * w

    def mq(p):
        kp = -(-p * n // 100)
        cw = 0
        for cid in sorted(agg):
            w, sm = agg[cid]
            cw += w
            if cw >= kp:
                return sm / w / 100
        return None

    exact = sorted(vals)
    for p, got in [(50, mq(50)), (90, mq(90)), (99, mq(99))]:
        lo = exact[max(0, math.ceil(p * n / 100) - 1 - n // 20)]
        hi = exact[min(n - 1, math.ceil(p * n / 100) - 1 + n // 20)]
        assert lo <= got <= hi, (p, got, lo, hi)
    # and the direct digest's q50 is inside the same window
    assert abs(direct["q50"] - mq(50)) <= (max(vals) - min(vals)) * 0.1


# --------------------------------------- seasonal Mann-Kendall trend


def _events_daily_counts(con, tmp_path, day_counts):
    """events.parquet with `cnt` rows on each (date, cnt) entry."""
    rows = ", ".join(f"(DATE '{d}', {c})" for d, c in day_counts)
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               CAST(d AS TIMESTAMP) ts, CAST(1 AS BIGINT) user_id,
               'view' event_type, CAST(1.0 AS DOUBLE) AS value,
               '' AS props
        FROM (VALUES {rows}) t(d, c),
             UNNEST(generate_series(1, c)) AS u(k)""")


def test_seasonal_mk_opposing_seasons_cancel(spark, tmp_path):
    """Mondays rise 1→2→3, Tuesdays fall 3→2→1: within-season S are
    +3 and −3, so the seasonal statistic is exactly 0 (the plain MK
    over the interleaved series would NOT be 0)."""
    con = duckdb.connect()
    _events_daily_counts(con, tmp_path, [
        ("2024-03-04", 1), ("2024-03-11", 2), ("2024-03-18", 3),  # Mon
        ("2024-03-05", 3), ("2024-03-12", 2), ("2024-03-19", 1),  # Tue
    ])
    con.close()
    r = (
        REGISTRY["seasonal_mann_kendall_weekday"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_days"] == 6 and r["n_seasons"] == 2
    assert r["s_stat"] == 0
    assert r["z_smk"] == 0.0


def test_seasonal_mk_monotone(spark, tmp_path):
    """Both seasons strictly rising: S = 3+3 = 6, var = 2·3·2·11/18
    = 132/18, z = (6−1)/sqrt(132/18) — hand-computed."""
    con = duckdb.connect()
    _events_daily_counts(con, tmp_path, [
        ("2024-03-04", 1), ("2024-03-11", 2), ("2024-03-18", 3),
        ("2024-03-05", 1), ("2024-03-12", 2), ("2024-03-19", 3),
    ])
    con.close()
    r = (
        REGISTRY["seasonal_mann_kendall_weekday"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["s_stat"] == 6
    assert r["z_smk"] == round(5 / math.sqrt(132 / 18), 6)


def test_seasonal_mk_ties_corrected(spark, tmp_path):
    """One season, counts 2,2,5: S = 2 (two ties), tie correction
    t=2 → 2·1·9 = 18, var = (3·2·11 − 18)/18 = 48/18,
    z = (2−1)/sqrt(48/18)."""
    con = duckdb.connect()
    _events_daily_counts(con, tmp_path, [
        ("2024-03-04", 2), ("2024-03-11", 2), ("2024-03-18", 5),
    ])
    con.close()
    r = (
        REGISTRY["seasonal_mann_kendall_weekday"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_seasons"] == 1 and r["s_stat"] == 2
    assert r["z_smk"] == round(1 / math.sqrt(48 / 18), 6)


# --------------------------------------- median (pinball) regression


def _lineitem_xy(con, tmp_path, xy):
    rows = ", ".join(f"({i}, {x!r}, {y!r})" for i, (x, y) in enumerate(xy))
    _copy(con, tmp_path, "lineitem", f"""
        SELECT CAST(i AS BIGINT) l_orderkey, CAST(i AS BIGINT) l_partkey,
               CAST(i AS BIGINT) l_suppkey, CAST(1 AS INT) l_linenumber,
               CAST(x AS DOUBLE) l_quantity, CAST(y AS DOUBLE)
                   l_extendedprice,
               CAST(0.0 AS DOUBLE) l_discount, CAST(0.0 AS DOUBLE) l_tax,
               'N' l_returnflag, 'O' l_linestatus,
               TIMESTAMP '2024-01-01' l_shipdate
        FROM (VALUES {rows}) t(i, x, y)""")


def test_quantreg_exact_line(spark, tmp_path):
    """y = 10·x exactly: OLS slope = 1000 cents/unit, the grid's
    center candidate (j=5) has zero residuals ⇒ zero pinball loss,
    intercept 0."""
    con = duckdb.connect()
    _lineitem_xy(con, tmp_path, [(x, 10.0 * x) for x in range(1, 6)])
    con.close()
    r = (
        REGISTRY["quantile_regression_pinball"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_rows"] == 5
    assert r["slope_ols"] == 1000.0
    assert r["b_best"] == 1000.0
    assert r["intercept_best"] == 0.0
    assert r["mean_pinball"] == 0.0


def test_quantreg_shifted_line(spark, tmp_path):
    """y = 10·x + 5: same slope, every residual at the true slope is
    exactly 5 dollars ⇒ intercept_best 5, loss 0."""
    con = duckdb.connect()
    _lineitem_xy(
        con, tmp_path, [(x, 10.0 * x + 5.0) for x in range(1, 6)]
    )
    con.close()
    r = (
        REGISTRY["quantile_regression_pinball"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["b_best"] == 1000.0
    assert r["intercept_best"] == 5.0
    assert r["mean_pinball"] == 0.0


def test_quantreg_outlier_robust(spark, tmp_path):
    """Nine on-line points + one high-leverage outlier (9, 300):
    OLS doubles to 2016.13 cents/unit, but the pinball objective
    picks the grid's LOW end (b = rs/2 = 1008.06 — the point closest
    to the true 1000), with the python twin pinning the dollar-floor
    median intercept (−1) and the loss (Σ|r−a| = 210 → 10.5 mean)
    — the robustness pitch of the operator, within the grid's
    honest 0.5×–1.5×-of-OLS reach."""
    con = duckdb.connect()
    pts = [(float(x), 10.0 * x) for x in range(1, 10)]
    pts.append((9.0, 300.0))
    _lineitem_xy(con, tmp_path, pts)
    con.close()
    r = (
        REGISTRY["quantile_regression_pinball"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["slope_ols"] == 2016.129032
    assert r["b_best"] == 1008.064516
    assert r["intercept_best"] == -1.0
    assert r["mean_pinball"] == 10.5
    assert abs(r["b_best"] - 1000.0) < abs(r["slope_ols"] - 1000.0)


# ------------------------------------ HyperLogLog++ sparse-mode twin


def test_hllpp_matches_python_twin(spark, tmp_path):
    """Independent hashlib twin: the 25-bit index set and the linear-
    counting estimate must match bit-for-bit (same md5, same shift,
    same formula)."""
    import hashlib

    con = duckdb.connect()
    users = [i * 7 + 1 for i in range(150)]
    rows = ", ".join(f"({i}, {u})" for i, u in enumerate(users * 2))
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(i AS BIGINT) event_id, TIMESTAMP '2024-01-01' ts,
               CAST(u AS BIGINT) user_id, 'view' event_type,
               CAST(1.0 AS DOUBLE) AS value, '' AS props
        FROM (VALUES {rows}) t(i, u)""")
    con.close()
    r = (
        REGISTRY["hllpp_sparse_distinct_users"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    idxs = {
        int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)
        // 2 ** 23
        for u in users
    }
    m = 2 ** 25
    est = round(m * math.log(m / (m - len(idxs))), 6)
    assert r["p_sparse"] == 25
    assert r["v_distinct_idx"] == len(idxs)
    assert r["mode"] == "sparse"
    assert r["estimate"] == est
    assert r["n_exact"] == len(set(users))
    # sparse-mode linear counting is near-exact at this cardinality
    assert abs(r["estimate"] - r["n_exact"]) / r["n_exact"] < 0.01


# ------------------------------- sessionized funnel (timeout windows)


def _events_funnel(con, tmp_path, rows):
    vals = ", ".join(
        f"({i}, {u}, TIMESTAMP '{t}', '{ty}')"
        for i, (u, t, ty) in enumerate(rows)
    )
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(i AS BIGINT) event_id, t AS ts,
               CAST(u AS BIGINT) user_id, ty AS event_type,
               CAST(1.0 AS DOUBLE) AS value, '' AS props
        FROM (VALUES {vals}) t(i, u, t, ty)""")


def test_funnel_hand_computed(spark, tmp_path):
    """u1 completes all three steps in one session; u2's click lands
    61 min after the view, so the timeout cuts it into a second
    session with no view; u3 clicks BEFORE viewing (order matters).
    Sessions: u1×1, u2×2, u3×1 = 4; view-sessions 3, click 1,
    purchase 1."""
    con = duckdb.connect()
    _events_funnel(con, tmp_path, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:10:00", "click"),
        (1, "2024-01-01 10:20:00", "purchase"),
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 11:01:00", "click"),
        (3, "2024-01-01 10:00:00", "click"),
        (3, "2024-01-01 10:05:00", "view"),
    ])
    con.close()
    r = (
        REGISTRY["sessionized_funnel_timeout"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_sessions"] == 4
    assert r["step_view"] == 3
    assert r["step_click"] == 1
    assert r["step_purchase"] == 1
    assert r["rate_view"] == 0.75
    assert r["conv_click"] == round(1 / 3, 6)
    assert r["conv_purchase"] == 1.0
    assert r["overall"] == 0.25


def test_funnel_timeout_boundary(spark, tmp_path):
    """A gap of exactly 1800s does NOT cut (strict >): view then
    purchase-without-click 1800s later stay one session; 1800.000001s
    would cut. Purchase needs a click first, so step_purchase is 0
    either way — but the session COUNT pins the boundary."""
    con = duckdb.connect()
    _events_funnel(con, tmp_path, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:30:00", "click"),          # exactly 1800s
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:30:00.000001", "click"),   # 1800s + 1µs
    ])
    con.close()
    r = (
        REGISTRY["sessionized_funnel_timeout"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_sessions"] == 3          # u1×1, u2×2
    assert r["step_view"] == 2
    assert r["step_click"] == 1          # only u1's stays in-session


# --------------------------------------- char-trigram cosine lang-ID


def test_langid_trigram_assigns_by_profile(spark, tmp_path):
    """'the thing' carries en-profile trigrams (the/he / th/ing),
    'und ich' carries de trigrams (und/ich) — equal profile norms
    (weights 12..1 in every profile) make the argmax a dot-product
    comparison, hand-checked: en dot 40 vs de dot 16 for doc 1,
    de dot 16 vs en dot 10 for doc 2."""
    con = duckdb.connect()
    _copy(con, tmp_path, "documents", """
        SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), 'the thing', 'en', 's1',
             CAST(9 AS BIGINT)),
            (CAST(2 AS BIGINT), 'und ich', 'de', 's1',
             CAST(7 AS BIGINT))
        ) t(doc_id, text, lang, source, n_chars)""")
    con.close()
    rows = {
        r["language"]: r
        for r in REGISTRY["langid_trigram_cosine_mix"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert rows["en"]["n_docs"] == 1
    assert rows["de"]["n_docs"] == 1
    assert set(rows) == {"en", "de"}
    assert rows["en"]["avg_cos"] > 0
    assert rows["de"]["avg_cos"] > 0


def test_langid_no_match_docs_excluded(spark, tmp_path):
    """A doc sharing no trigram with any profile ('zzzz qqqq') gets
    no score row — it must vanish from the mix, not crash or land
    in a default language."""
    con = duckdb.connect()
    _copy(con, tmp_path, "documents", """
        SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), 'zzzz qqqq', 'xx', 's1',
             CAST(9 AS BIGINT)),
            (CAST(2 AS BIGINT), 'the thing', 'en', 's1',
             CAST(9 AS BIGINT))
        ) t(doc_id, text, lang, source, n_chars)""")
    con.close()
    rows = (
        REGISTRY["langid_trigram_cosine_mix"]
        .spark(spark, str(tmp_path))
        .collect()
    )
    assert len(rows) == 1 and rows[0]["language"] == "en"
    assert rows[0]["n_docs"] == 1


# ------------------------------------------------ oracle edge sweeps

R13_BATCH = [
    "james_stein_type_means",
    "logrank_lifetime_by_cohort",
    "split_assignment_report",
    "ab_minimum_detectable_effect",
    "classifier_calibration_ece",
    "funnel_time_to_convert",
    "dau_wau_mau_daily",
    "did_value_estimate",
    "kmv_distinct_users",
    "weighted_sample_docs_aes",
    "cramer_von_mises_drift",
    "tdigest_value_quantiles",
    "seasonal_mann_kendall_weekday",
    "quantile_regression_pinball",
    "hllpp_sparse_distinct_users",
    "sessionized_funnel_timeout",
    "langid_trigram_cosine_mix",
]


def test_r13_empty_tables_match_oracle(spark, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from oracle_util import compare

    con = duckdb.connect()
    _empty_tables(con, tmp_path)
    con.close()
    ora = _oracle_on(
        tmp_path, ["events", "orders", "lineitem", "documents"]
    )
    for name in R13_BATCH:
        spec = REGISTRY[name]
        compare(
            spec.spark(spark, str(tmp_path)),
            ora.sql(spec.oracle),
            f"empty:{name}",
        )
    ora.close()


def test_r13_null_bearing_rows_match_oracle(spark, tmp_path):
    """Same NULL-bearing fixture family as the r12 sweep (NULL
    ts/value/user/type/price/quantity/text rows mixed with real
    ones) — every r13 query must agree with its oracle exactly."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from oracle_util import compare

    con = duckdb.connect()
    con.execute(f"""COPY (
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               CASE WHEN i % 5 = 0 THEN NULL
                    ELSE TIMESTAMP '2024-01-01'
                         + ((i % 9) || ' days')::INTERVAL
                         + ((i % 47) || ' minutes')::INTERVAL END AS ts,
               CASE WHEN i % 7 = 0 THEN NULL
                    ELSE CAST(i % 6 AS BIGINT) END AS user_id,
               CASE WHEN i % 11 = 0 THEN NULL
                    WHEN i % 3 = 0 THEN 'view'
                    WHEN i % 3 = 1 THEN 'click' ELSE 'purchase' END
                   AS event_type,
               CASE WHEN i % 3 = 0 THEN NULL
                    ELSE CAST((i % 13) + 0.25 AS DOUBLE) END AS value,
               '' AS props
        FROM range(0, 120) t(i))
        TO '{tmp_path}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
        SELECT CAST(i AS BIGINT) l_orderkey,
               CAST(i % 9 AS BIGINT) l_partkey,
               CAST(i AS BIGINT) l_suppkey, CAST(1 AS INT) l_linenumber,
               CASE WHEN i % 5 = 0 THEN NULL
                    ELSE CAST((i % 7) + 1.0 AS DOUBLE) END AS l_quantity,
               CASE WHEN i % 8 = 0 THEN NULL
                    ELSE CAST((i % 11) * 3.5 + 1 AS DOUBLE) END
                   AS l_extendedprice,
               CAST(0.0 AS DOUBLE) l_discount,
               CAST(0.0 AS DOUBLE) l_tax, 'N' l_returnflag,
               'O' l_linestatus, TIMESTAMP '2024-01-01' l_shipdate
        FROM range(0, 90) t(i))
        TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
        SELECT CAST(i AS BIGINT) doc_id,
               CASE WHEN i % 6 = 0 THEN NULL
                    WHEN i % 6 = 1 THEN ''
                    WHEN i % 6 = 2 THEN 'ab'
                    ELSE 'the thing und ich ' || (i % 4) END AS text,
               'en' AS lang,
               CASE WHEN i % 9 = 0 THEN NULL
                    ELSE 's' || (i % 3) END AS source,
               CAST(i % 40 AS BIGINT) n_chars
        FROM range(0, 60) t(i))
        TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT CAST(1 AS BIGINT) o_orderkey,
        CAST(1 AS BIGINT) o_custkey, 'O' o_orderstatus,
        CAST(1.0 AS DOUBLE) o_totalprice,
        TIMESTAMP '2024-01-01' o_orderdate, 'x' o_orderpriority
        WHERE false) TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)""")
    con.close()
    ora = _oracle_on(
        tmp_path, ["events", "orders", "lineitem", "documents"]
    )
    for name in R13_BATCH:
        spec = REGISTRY[name]
        compare(
            spec.spark(spark, str(tmp_path)),
            ora.sql(spec.oracle),
            f"nulls:{name}",
        )
    ora.close()


# ------------------------------------------ KMV bottom-k sketch


def _md5_48(s) -> int:
    import hashlib

    return int(hashlib.md5(str(s).encode()).hexdigest()[:12], 16)


def test_kmv_matches_python_twin(spark, tmp_path):
    """Independent hashlib twin below k: with 150 distinct users the
    sketch holds every hash and reports the count exactly."""
    con = duckdb.connect()
    users = [i * 11 + 3 for i in range(150)]
    rows = ", ".join(f"({i}, {u})" for i, u in enumerate(users * 3))
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(i AS BIGINT) event_id, TIMESTAMP '2024-01-01' ts,
               CAST(u AS BIGINT) user_id, 'view' event_type,
               CAST(1.0 AS DOUBLE) AS value, '' AS props
        FROM (VALUES {rows}) t(i, u)""")
    con.close()
    r = (
        REGISTRY["kmv_distinct_users"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    hashes = {_md5_48(u) for u in users}
    assert r["k_kept"] == len(hashes) == 150
    assert r["theta_hash"] == max(hashes)
    assert r["estimate"] == 150.0
    assert r["rel_error"] == 0.0


def test_kmv_above_k_formula_and_merge_identity(spark, tmp_path):
    """400 distinct users > k=256: estimate = 255·2^48/v_256 from the
    python twin; and the bottom-k of the union of two halves' bottom-k
    lists is IDENTICAL to the direct bottom-k (the mergeability set
    identity the docstring claims)."""
    con = duckdb.connect()
    users = [i * 7 + 1 for i in range(400)]
    rows = ", ".join(f"({i}, {u})" for i, u in enumerate(users))
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(i AS BIGINT) event_id, TIMESTAMP '2024-01-01' ts,
               CAST(u AS BIGINT) user_id, 'view' event_type,
               CAST(1.0 AS DOUBLE) AS value, '' AS props
        FROM (VALUES {rows}) t(i, u)""")
    con.close()
    r = (
        REGISTRY["kmv_distinct_users"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    ordered = sorted(_md5_48(u) for u in users)
    vk = ordered[255]
    assert r["k_kept"] == 256
    assert r["theta_hash"] == vk
    assert r["estimate"] == round(255.0 * 281474976710656 / vk, 6)
    # merge identity: bottom-256 of (bottom-256(A) ∪ bottom-256(B))
    a = sorted(_md5_48(u) for u in users[:200])[:256]
    b = sorted(_md5_48(u) for u in users[200:])[:256]
    assert sorted(a + b)[:256] == ordered[:256]


# ---------------------- A-ES weighted sample without replacement


def test_aes_sample_matches_python_twin(spark, tmp_path):
    """The exact top-20 rows (keys AND order) must match an
    independent hashlib/math twin of ln(u)/w with the documented
    9dp round and doc_id tie-break."""
    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, {(i % 37) + 1})" for i in range(1, 101)
    )
    _copy(con, tmp_path, "documents", f"""
        SELECT CAST(i AS BIGINT) doc_id, 'txt' AS text, 'en' AS lang,
               's1' AS source, CAST(c AS BIGINT) n_chars
        FROM (VALUES {rows}) t(i, c)""")
    con.close()
    got = [
        (r["doc_id"], r["n_chars"], r["aes_key"])
        for r in REGISTRY["weighted_sample_docs_aes"]
        .spark(spark, str(tmp_path))
        .collect()
    ]
    want = []
    for i in range(1, 101):
        w = (i % 37) + 1
        u = max(_md5_48(i), 1) / 281474976710656
        want.append((i, w, round(math.log(u) / w, 9)))
    want.sort(key=lambda t: (-t[2], t[0]))
    assert got == want[:20]
    # heavier docs dominate: well over half the kept docs carry
    # above-median weight (the exact-match assertion above is the
    # correctness check; this pins the weighting DIRECTION)
    assert sum(1 for _, w, _ in got if w > 18) >= 12


# ------------------------------------- Cramér-von Mises drift


def test_cvm_hand_computed(spark, tmp_path):
    """Half A = {1.00, 2.00}, half B = {2.00, 3.00} (midpoint split
    puts day-1 rows in A): pooled cents levels 100/200/300 carry
    F₁ = .5, 1, 1 and F₂ = 0, .5, 1 → squared gaps .25, .25, 0 with
    weights 1, 2, 1 ⇒ Σw·d² = .75, T = (2·2/4²)·.75 = 0.1875."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), TIMESTAMP '2024-01-01',
             CAST(1 AS BIGINT), 'view', CAST(1.0 AS DOUBLE), ''),
            (CAST(2 AS BIGINT), TIMESTAMP '2024-01-01',
             CAST(1 AS BIGINT), 'view', CAST(2.0 AS DOUBLE), ''),
            (CAST(3 AS BIGINT), TIMESTAMP '2024-01-03',
             CAST(1 AS BIGINT), 'view', CAST(2.0 AS DOUBLE), ''),
            (CAST(4 AS BIGINT), TIMESTAMP '2024-01-03',
             CAST(1 AS BIGINT), 'view', CAST(3.0 AS DOUBLE), '')
        ) t(event_id, ts, user_id, event_type, value, props)""")
    con.close()
    r = (
        REGISTRY["cramer_von_mises_drift"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_first"] == 2 and r["n_second"] == 2
    assert r["cvm_t"] == 0.1875


def test_cvm_identical_halves_zero(spark, tmp_path):
    """Identical value multisets in both halves ⇒ every CDF gap is 0
    ⇒ T = 0 exactly."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(i AS BIGINT) event_id,
               CASE WHEN i < 3 THEN TIMESTAMP '2024-01-01'
                    ELSE TIMESTAMP '2024-01-03' END ts,
               CAST(1 AS BIGINT) user_id, 'view' event_type,
               CAST((i % 3) + 1.5 AS DOUBLE) AS value, '' AS props
        FROM range(0, 6) t(i)""")
    con.close()
    r = (
        REGISTRY["cramer_von_mises_drift"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["cvm_t"] == 0.0


# ------------------------------------ funnel time-to-convert


def test_funnel_ttc_hand_computed(spark, tmp_path):
    """u1 converts in 1200s, u2 in 600s: p50 rank pick (ceil(n/2)=1)
    lands on 600, p90 (ceil(1.8)=2) on 1200, mean 900."""
    con = duckdb.connect()
    _events_funnel(con, tmp_path, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:10:00", "click"),
        (1, "2024-01-01 10:20:00", "purchase"),
        (2, "2024-01-01 09:00:00", "view"),
        (2, "2024-01-01 09:05:00", "click"),
        (2, "2024-01-01 09:10:00", "purchase"),
        (3, "2024-01-01 08:00:00", "view"),
    ])
    con.close()
    r = (
        REGISTRY["funnel_time_to_convert"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_converting"] == 2
    assert r["p50_sec"] == 600
    assert r["p90_sec"] == 1200
    assert r["avg_sec"] == 900.0


def test_funnel_ttc_no_conversions(spark, tmp_path):
    """Views only: one row, zero conversions, NULL picks."""
    con = duckdb.connect()
    _events_funnel(con, tmp_path, [
        (1, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 11:00:00", "view"),
    ])
    con.close()
    r = (
        REGISTRY["funnel_time_to_convert"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["n_converting"] == 0
    assert r["p50_sec"] is None and r["avg_sec"] is None


# ------------------------------------------- DAU / WAU / MAU


def test_dau_wau_mau_hand_computed(spark, tmp_path):
    """Users 1,2 active day 0; user 1 again day 3. Day 0: 2/2/2.
    Day 3: DAU 1 (u1), WAU 2 (both day-0 users still inside the
    7-day window), MAU 2, stickiness 0.5. Idle days emit no row."""
    con = duckdb.connect()
    _events_funnel(con, tmp_path, [
        (1, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-04 10:00:00", "view"),
    ])
    con.close()
    rows = {
        str(r["day"]): r
        for r in REGISTRY["dau_wau_mau_daily"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(rows) == {"2024-01-01", "2024-01-04"}
    d0 = rows["2024-01-01"]
    assert (d0["dau"], d0["wau"], d0["mau"]) == (2, 2, 2)
    assert d0["stickiness"] == 1.0
    d3 = rows["2024-01-04"]
    assert (d3["dau"], d3["wau"], d3["mau"]) == (1, 2, 2)
    assert d3["stickiness"] == 0.5


def test_dau_wau_window_expiry(spark, tmp_path):
    """Activity 10 days apart: the second day's WAU no longer sees
    the first (7-day window), but its MAU still does (30-day)."""
    con = duckdb.connect()
    _events_funnel(con, tmp_path, [
        (1, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-11 10:00:00", "view"),
    ])
    con.close()
    rows = {
        str(r["day"]): r
        for r in REGISTRY["dau_wau_mau_daily"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    d10 = rows["2024-01-11"]
    assert (d10["dau"], d10["wau"], d10["mau"]) == (1, 1, 2)


# --------------------------------- difference-in-differences


def test_did_hand_computed(spark, tmp_path):
    """treat (odd user 1): pre 10 → post 30 (+20); ctrl (even user
    2): pre 10 → post 20 (+10) ⇒ DiD = +10. Midpoint of the 2-day
    span puts day-1 rows in pre."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), TIMESTAMP '2024-01-01',
             CAST(1 AS BIGINT), 'view', CAST(10.0 AS DOUBLE), ''),
            (CAST(2 AS BIGINT), TIMESTAMP '2024-01-03',
             CAST(1 AS BIGINT), 'view', CAST(30.0 AS DOUBLE), ''),
            (CAST(3 AS BIGINT), TIMESTAMP '2024-01-01',
             CAST(2 AS BIGINT), 'view', CAST(10.0 AS DOUBLE), ''),
            (CAST(4 AS BIGINT), TIMESTAMP '2024-01-03',
             CAST(2 AS BIGINT), 'view', CAST(20.0 AS DOUBLE), '')
        ) t(event_id, ts, user_id, event_type, value, props)""")
    con.close()
    r = (
        REGISTRY["did_value_estimate"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert (
        r["n_treat_pre"], r["n_treat_post"],
        r["n_ctrl_pre"], r["n_ctrl_post"],
    ) == (1, 1, 1, 1)
    assert r["did_estimate"] == 10.0


def test_did_parallel_shift_cancels(spark, tmp_path):
    """Both cohorts shift by the same +15: DiD must be exactly 0 —
    the level-shift immunity that motivates the design."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(i AS BIGINT) event_id,
               CASE WHEN i < 4 THEN TIMESTAMP '2024-01-01'
                    ELSE TIMESTAMP '2024-01-03' END ts,
               CAST(i % 4 AS BIGINT) user_id, 'view' event_type,
               CAST(CASE WHEN i < 4 THEN 10.0 ELSE 25.0 END
                    AS DOUBLE) AS value, '' AS props
        FROM range(0, 8) t(i)""")
    con.close()
    r = (
        REGISTRY["did_value_estimate"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert r["did_estimate"] == 0.0


# --------------------------------- split manifest / MDE / ECE


def test_split_assignment_python_twin(spark, tmp_path):
    """The split of every doc matches the hashlib twin of
    md5₄₈(doc_id)·100 // 2^48, and splits are disjoint by
    construction (counts sum to the corpus)."""
    con = duckdb.connect()
    rows = ", ".join(f"({i})" for i in range(1, 201))
    _copy(con, tmp_path, "documents", f"""
        SELECT CAST(i AS BIGINT) doc_id, 'txt' AS text, 'en' AS lang,
               's' || (i % 3) AS source, CAST(10 AS BIGINT) n_chars
        FROM (VALUES {rows}) t(i)""")
    con.close()
    got = (
        REGISTRY["split_assignment_report"]
        .spark(spark, str(tmp_path))
        .collect()
    )
    want: dict[tuple, int] = {}
    for i in range(1, 201):
        u = _md5_48(i) * 100 // 281474976710656
        split = "train" if u < 90 else ("val" if u < 95 else "test")
        key = (split, f"s{i % 3}")
        want[key] = want.get(key, 0) + 1
    assert {(r["split"], r["source"]): r["n_docs"] for r in got} == want
    assert sum(r["n_docs"] for r in got) == 200
    # shares within each split sum to ~1
    by_split: dict[str, float] = {}
    for r in got:
        by_split[r["split"]] = by_split.get(r["split"], 0.0) + r[
            "share_in_split"
        ]
    for s, tot in by_split.items():
        assert abs(tot - 1.0) < 1e-4, (s, tot)


def test_mde_hand_computed(spark, tmp_path):
    """Four rows, values 1,2,3,4, users 1,2,3,4 (two per cohort):
    pooled sd = sqrt(5/3), MDE = 2.80158...·sd·sqrt(1/2+1/2),
    relative to mean 2.5."""
    con = duckdb.connect()
    _copy(con, tmp_path, "events", """
        SELECT CAST(i AS BIGINT) event_id, TIMESTAMP '2024-01-01' ts,
               CAST(i AS BIGINT) user_id, 'view' event_type,
               CAST(i AS DOUBLE) AS value, '' AS props
        FROM range(1, 5) t(i)""")
    con.close()
    r = (
        REGISTRY["ab_minimum_detectable_effect"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    sd = math.sqrt(5 / 3)
    assert r["n_treat"] == 2 and r["n_ctrl"] == 2
    assert r["pooled_sd"] == round(sd, 6)
    assert r["mde_abs"] == round(2.8015852181129683 * sd, 6)
    assert r["mde_rel"] == round(2.8015852181129683 * sd / 2.5, 6)


def test_ece_bins_and_bound(spark, tmp_path):
    """ECE structural properties on the real fixture corpus: bins in
    [0, 9], counts sum to the scored corpus, every avg_conf inside
    its bin's confidence range (±rounding), 0 ≤ ece ≤ 1, and ece is
    identical on every row."""
    rows = (
        REGISTRY["classifier_calibration_ece"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows, "fixture corpus must produce at least one bin"
    eces = {r["ece"] for r in rows}
    assert len(eces) == 1
    assert 0.0 <= rows[0]["ece"] <= 1.0
    for r in rows:
        assert 0 <= r["bin"] <= 9
        lo, hi = r["bin"] / 10, (r["bin"] + 1) / 10 + 1e-6
        assert lo - 1e-6 <= r["avg_conf"] <= hi
        assert 0.0 <= r["frac_pos"] <= 1.0


# --------------------------- James-Stein / log-rank (second wave)


def test_james_stein_python_twin(spark, tmp_path):
    """Four types with hand-set means 1/4/2/8: the python twin of the
    positive-part JS formula (9dp rounds included) pins weights and
    shrunk means; the zero-variance types keep weight 1."""
    con = duckdb.connect()
    data = [("a", 1.0), ("a", 1.0), ("b", 3.0), ("b", 5.0),
            ("c", 2.0), ("c", 2.0), ("d", 7.0), ("d", 9.0)]
    rows = ", ".join(
        f"({i}, '{t}', {v!r})" for i, (t, v) in enumerate(data)
    )
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(i AS BIGINT) event_id, TIMESTAMP '2024-01-01' ts,
               CAST(i AS BIGINT) user_id, t AS event_type,
               CAST(v AS DOUBLE) AS value, '' AS props
        FROM (VALUES {rows}) t(i, t, v)""")
    con.close()
    got = {
        r["event_type"]: r
        for r in REGISTRY["james_stein_type_means"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # python twin
    from collections import defaultdict

    vals = defaultdict(list)
    for t, v in data:
        vals[t].append(v)
    m = {}
    for t, vs in vals.items():
        n = len(vs)
        s1, s2 = sum(vs), sum(v * v for v in vs)
        mean_r = round(s1 / n, 9)
        se2 = ((s2 - s1 * s1 / n) / (n - 1)) / n if n > 1 else None
        m[t] = (n, mean_r, se2)
    k = len(m)
    grand = sum(mr for _, mr, _ in m.values()) / k
    ssb = sum(round((mr - grand) ** 2, 9) for _, mr, _ in m.values())
    for t, (n, mr, se2) in m.items():
        c = max(0.0, 1.0 - (k - 3) * se2 / ssb)
        assert got[t]["n"] == n
        assert got[t]["raw_mean"] == round(mr, 6)
        assert got[t]["shrink_weight"] == round(c, 6)
        assert got[t]["shrunk_mean"] == round(grand + c * (mr - grand), 6)
    assert got["a"]["shrink_weight"] == 1.0  # zero-variance type
    assert got["b"]["shrink_weight"] < 1.0


def test_logrank_python_twin(spark, tmp_path):
    """Asymmetric lifetimes (treat dies early): the python twin of
    the Mantel-Cox O−E/V folds (9dp rounds included) pins the
    statistic; the z must be negative (group 1 dies sooner ⇒ fewer
    observed group-1 survivors than expected... sign per d1 − e1)."""
    con = duckdb.connect()
    # users: (id, first_day, last_day) — horizon set by user 8's
    # late event; censored iff hmax − last_day < 3
    spec = [
        (1, 0, 1), (3, 0, 2), (5, 0, 1),      # grp 1: lifetimes 1,2,1
        (2, 0, 5), (4, 0, 6), (6, 0, 5),      # grp 0: lifetimes 5,6,5
        (8, 0, 12),                           # grp 0: censored anchor
    ]
    rows = []
    for uid, d0, d1 in spec:
        rows.append(f"({uid}, {d0})")
        rows.append(f"({uid}, {d1})")
    vals = ", ".join(rows)
    _copy(con, tmp_path, "events", f"""
        SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) event_id,
               TIMESTAMP '2024-01-01' + (d || ' days')::INTERVAL AS ts,
               CAST(u AS BIGINT) user_id, 'view' event_type,
               CAST(1.0 AS DOUBLE) AS value, '' AS props
        FROM (VALUES {vals}) t(u, d)""")
    con.close()
    r = (
        REGISTRY["logrank_lifetime_by_cohort"]
        .spark(spark, str(tmp_path))
        .collect()[0]
    )
    # python twin (hmax = day 12; censored iff 12 - last < 3)
    marked = []
    for uid, d0, d1 in spec:
        marked.append((uid % 2, d1 - d0, 1 if 12 - d1 < 3 else 0))
    lev = {}
    for g, lt, c in marked:
        e = lev.setdefault(lt, [0, 0, 0, 0])  # e1 e0 d1 d0
        e[0 if g == 1 else 1] += 1
        if not c:
            e[2 if g == 1 else 3] += 1
    oe = v = 0.0
    from decimal import Decimal

    oe_d = v_d = Decimal(0)
    lts = sorted(lev)
    for i, lt in enumerate(lts):
        r1 = sum(lev[x][0] for x in lts[i:])
        r0 = sum(lev[x][1] for x in lts[i:])
        d1, d0 = lev[lt][2], lev[lt][3]
        d, rr = d1 + d0, r1 + r0
        if d > 0 and rr > 1:
            p1 = r1 / rr
            oe_d += Decimal(str(round(d1 - p1 * d, 9)))
            v_d += Decimal(
                str(round(d * p1 * (1 - p1) * (rr - d) / (rr - 1), 9))
            )
    oe, v = float(oe_d), float(v_d)
    assert r["n_treat"] == 3 and r["n_ctrl"] == 4
    assert r["o_minus_e"] == round(oe, 6)
    assert r["lr_var"] == round(v, 6)
    assert r["z_logrank"] == round(oe / math.sqrt(v), 6)
    assert r["z_logrank"] > 0  # group 1's deaths cluster early
