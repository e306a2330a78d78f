"""Behavioral tests for the round-10 third-batch operators (mlfeat):
semantics on crafted fixtures and numpy recomputations, complementing
the oracle hash checks the gate runs."""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb

from pyspark.sql import functions as F

from stream_processing_spark.queries import REGISTRY


def _copy(con, tmp_path, table: str, select: str) -> None:
    con.execute(
        f"COPY ({select}) TO '{tmp_path}/{table}.parquet' (FORMAT PARQUET)"
    )


def test_target_encoding_excludes_own_fold(spark, tmp_path):
    """Hand-checked fixture: one nation, three folds with mean prices
    10/20/30 — each fold's encoding is the mean of the OTHER folds."""
    con = duckdb.connect()
    _copy(
        con, tmp_path, "customer",
        "SELECT CAST(1 AS BIGINT) AS c_custkey, 'c' AS c_name, "
        "CAST(7 AS INT) AS c_nationkey, 0.0 AS c_acctbal, "
        "'B' AS c_mktsegment",
    )
    # orderkey i -> fold i % 5; use folds 0,1,2 with 2 orders each
    _copy(
        con, tmp_path, "orders",
        """SELECT CAST(i AS BIGINT) AS o_orderkey,
                  CAST(1 AS BIGINT) AS o_custkey, 'O' AS o_orderstatus,
                  CAST((i % 5 + 1) * 10 AS DOUBLE) AS o_totalprice,
                  TIMESTAMP '2024-01-01' AS o_orderdate,
                  '1-URGENT' AS o_orderpriority
           FROM UNNEST([0, 5, 1, 6, 2, 7]) t(i)""",
    )
    con.close()
    got = {
        r["fold"]: r
        for r in REGISTRY["target_encode_nation_oof"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # fold 0 holds prices {10,10}; fold 1 {20,20}; fold 2 {30,30}
    assert got[0]["oof_mean_price"] == 25.0   # mean of 20,20,30,30
    assert got[1]["oof_mean_price"] == 20.0   # mean of 10,10,30,30
    assert got[2]["oof_mean_price"] == 15.0   # mean of 10,10,20,20
    assert all(r["n_rows"] == 2 for r in got.values())


def test_target_encoding_single_fold_nation_is_null(spark, tmp_path):
    """A nation entirely inside one fold has no out-of-fold rows —
    the encoding must be NULL, not a division error."""
    con = duckdb.connect()
    _copy(
        con, tmp_path, "customer",
        "SELECT CAST(1 AS BIGINT) AS c_custkey, 'c' AS c_name, "
        "CAST(7 AS INT) AS c_nationkey, 0.0 AS c_acctbal, "
        "'B' AS c_mktsegment",
    )
    _copy(
        con, tmp_path, "orders",
        "SELECT CAST(5 AS BIGINT) AS o_orderkey, CAST(1 AS BIGINT) AS "
        "o_custkey, 'O' AS o_orderstatus, CAST(42.0 AS DOUBLE) AS "
        "o_totalprice, TIMESTAMP '2024-01-01' AS o_orderdate, "
        "'1-URGENT' AS o_orderpriority",
    )
    con.close()
    rows = (
        REGISTRY["target_encode_nation_oof"]
        .spark(spark, str(tmp_path))
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["oof_mean_price"] is None


def test_acf_alternating_series_hits_exact_extremes(spark, tmp_path):
    """Daily counts alternating 1,3,1,3,… over 10 days: lag-2 pairs are
    identical series (ACF exactly 1.0), lag-1 pairs are anti-phase
    (ACF exactly −1.0). Integer sufficient statistics make both exact."""
    con = duckdb.connect()
    # day i gets (1 if i even else 3) events
    _copy(
        con, tmp_path, "events",
        """SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS event_id,
                  TIMESTAMP '2024-03-01' + (i || ' days')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id, 'view' AS event_type,
                  1.0 AS value, '{}' AS props
           FROM range(0, 10) t(i), range(0, 3) r(j)
           WHERE j < CASE WHEN i % 2 = 0 THEN 1 ELSE 3 END""",
    )
    con.close()
    got = {
        r["lag"]: r
        for r in REGISTRY["acf_daily_event_counts"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got[1]["acf_r"] == -1.0 and got[1]["n_pairs"] == 9
    assert got[2]["acf_r"] == 1.0 and got[2]["n_pairs"] == 8


def test_acf_constant_series_is_null(spark, tmp_path):
    """Zero variance → undefined correlation → NULL (not inf/error)."""
    con = duckdb.connect()
    _copy(
        con, tmp_path, "events",
        """SELECT CAST(i AS BIGINT) AS event_id,
                  TIMESTAMP '2024-03-01' + (i || ' days')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id, 'view' AS event_type,
                  1.0 AS value, '{}' AS props
           FROM range(0, 9) t(i)""",
    )
    con.close()
    rows = (
        REGISTRY["acf_daily_event_counts"].spark(spark, str(tmp_path)).collect()
    )
    assert len(rows) == 7
    assert all(r["acf_r"] is None for r in rows)


def test_benford_shares_and_chi2_match_python(spark, tmp_path):
    """Crafted digit distribution: shares and chi-square terms equal an
    independent Python recomputation; sub-1 prices are excluded."""
    prices = [1.5, 12.0, 199.99, 2.25, 25.0, 3.1, 9.99, 0.50]  # 0.50 dropped
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, {p})" for i, p in enumerate(prices)
    )
    _copy(
        con, tmp_path, "orders",
        f"""SELECT CAST(c0 AS BIGINT) AS o_orderkey,
                   CAST(1 AS BIGINT) AS o_custkey, 'O' AS o_orderstatus,
                   CAST(c1 AS DOUBLE) AS o_totalprice,
                   TIMESTAMP '2024-01-01' AS o_orderdate,
                   '1-URGENT' AS o_orderpriority
            FROM (VALUES {vals}) t(c0, c1)""",
    )
    con.close()
    got = {
        r["digit"]: r
        for r in REGISTRY["benford_first_digit_audit"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    counts = {1: 3, 2: 2, 3: 1, 9: 1}  # of the 7 kept prices
    total = 7
    assert set(got) == set(counts)
    for d, n in counts.items():
        p = math.log10(1 + 1 / d)
        assert got[d]["n_orders"] == n
        assert abs(got[d]["obs_share"] - n / total) < 1e-6
        assert abs(got[d]["expected_share"] - p) < 1e-6
        chi = (n - total * p) ** 2 / (total * p)
        assert abs(got[d]["chi2_term"] - chi) < 1e-5


def test_snm_pairs_typo_adjacent_but_not_window_distant(spark, tmp_path):
    """Two near-duplicate docs whose keys differ by a typo sort adjacent
    → paired. The same near-dup content placed > w sort positions apart
    (4 filler docs with intervening keys, same 2-char block) → NOT
    paired: exactly the sorted-neighborhood semantics."""
    tail = "quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, f"aa alpha {tail}"),
        (1, f"aa alphb {tail}"),          # typo'd key, same tail -> adjacent
        (2, f"ca aaaa {tail}"),
        (3, "ca bbbb red oak tables hold sturdy planks neatly"),
        (4, "ca cccc blue rivers flow beneath ancient stone bridges"),
        (5, "ca dddd green parrots mimic loud morning market chatter"),
        (6, "ca eeee yellow lanterns light narrow winding alley steps"),
        (7, f"ca zzzz {tail}"),           # 5 positions from doc 2 -> dropped
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in docs)
    _copy(
        con, tmp_path, "documents",
        f"""SELECT CAST(c0 AS BIGINT) AS doc_id, c1 AS text, 'en' AS lang,
                   'web' AS source, CAST(length(c1) AS BIGINT) AS n_chars
            FROM (VALUES {vals}) t(c0, c1)""",
    )
    con.close()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["dedup_sorted_neighborhood_pairs"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert (0, 1) in pairs
    assert (2, 7) not in pairs
    # the filler docs share no 3-gram shingles above threshold with
    # anything — no other cross-content pair may appear
    assert all({a, b} <= {0, 1} or {a, b} <= {2, 7} for a, b in pairs), pairs


def test_lpa_two_cliques_converge_to_min_ids(spark, tmp_path):
    """Two disjoint 3-cliques (parts sharing an order) converge to each
    clique's MIN part id within 3 deterministic rounds; an isolated
    part keeps its own label."""
    rows = []
    for ok, parts in [(1, [1, 2, 3]), (2, [1, 2, 3]),
                      (3, [10, 11, 12]), (4, [99])]:
        for ln, p in enumerate(parts, 1):
            rows.append((ok, p, ln))
    con = duckdb.connect()
    vals = ", ".join(f"({o}, {p}, {ln})" for o, p, ln in rows)
    _copy(
        con, tmp_path, "lineitem",
        f"""SELECT CAST(c0 AS BIGINT) AS l_orderkey,
                   CAST(c1 AS BIGINT) AS l_partkey,
                   CAST(1 AS BIGINT) AS l_suppkey,
                   CAST(c2 AS INT) AS l_linenumber,
                   1.0 AS l_quantity, 10.0 AS l_extendedprice,
                   0.0 AS l_discount, 0.0 AS l_tax,
                   'N' AS l_returnflag, 'O' AS l_linestatus,
                   TIMESTAMP '2024-01-01' AS l_shipdate
            FROM (VALUES {vals}) t(c0, c1, c2)""",
    )
    con.close()
    got = {
        r["part_id"]: r["community"]
        for r in REGISTRY["graph_label_propagation"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_lpa_round1_shortcut_equals_general_form(spark):
    """The shipped round-1 min-neighbor shortcut must be bit-identical
    to the general vote/argmax spelling it replaced (identity labels +
    distinct edges ⇒ every vote has cnt=1 ⇒ argmax(cnt,−lbl) = min
    neighbor) — checked on the real sf0.001 co-purchase graph."""
    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.queries.mlfeat import _LPA_ITERS

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=False
    )
    a, b = op.alias("a"), op.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = li.select(
        F.col("l_partkey").alias("part_id"), F.col("l_partkey").alias("lbl")
    ).distinct()
    for _ in range(_LPA_ITERS):  # general form, no shortcut
        labels = labels.localCheckpoint(eager=False)
        votes = (
            edges.join(labels, edges.u == labels.part_id)
            .select(F.col("v").alias("part_id"), "lbl")
            .groupBy("part_id", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = (
            votes.groupBy("part_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt").alias("c"), (-F.col("lbl")).alias("nl")
                    )
                ).alias("w")
            )
            .select("part_id", (-F.col("w.nl")).alias("w_lbl"))
        )
        labels = labels.join(winner, "part_id", "left").select(
            "part_id", F.coalesce("w_lbl", "lbl").alias("lbl")
        )
    general = labels.select("part_id", F.col("lbl").alias("community"))
    shipped = REGISTRY["graph_label_propagation"].spark(spark, sf)
    assert shipped.exceptAll(general).count() == 0
    assert general.exceptAll(shipped).count() == 0


def test_decontaminate_flags_planted_duplicate(spark, tmp_path):
    """A train vector identical to a pinned-eval vector is contaminated;
    an orthogonal one is clean. vec_id 0 is eval (0 % 23 == 0 and
    ≤ the id cap); 23 would also be eval — avoided in train ids."""
    con = duckdb.connect()
    _copy(
        con, tmp_path, "embeddings",
        """SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), [1.0, 0.0, 0.0]::FLOAT[], CAST(1 AS INT)),
            (CAST(1 AS BIGINT), [1.0, 0.0, 0.0]::FLOAT[], CAST(1 AS INT)),
            (CAST(2 AS BIGINT), [0.0, 1.0, 0.0]::FLOAT[], CAST(2 AS INT)),
            (CAST(3 AS BIGINT), [0.0, 0.0, 1.0]::FLOAT[], CAST(2 AS INT))
        ) t(vec_id, embedding, label)""",
    )
    con.close()
    got = {
        r["label"]: r
        for r in REGISTRY["decontaminate_embedding_neighbors"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got[1]["n_train"] == 1 and got[1]["n_contaminated"] == 1
    assert got[1]["contamination_rate"] == 1.0
    assert got[2]["n_train"] == 2 and got[2]["n_contaminated"] == 0
    assert got[2]["contamination_rate"] == 0.0


def test_conformal_qhat_matches_exact_recomputation(spark):
    """qhat equals an exact-arithmetic recomputation (Fraction sums →
    correctly-rounded doubles → same formula), and the interval covers
    ≥ 90% of calibration residuals — the split-conformal guarantee."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
    ).to_pylist()
    train = [r for r in t if r["l_orderkey"] % 10 != 0]
    cal = [r for r in t if r["l_orderkey"] % 10 == 0]

    def cents(v):  # 2-decimal doubles -> exact integer cents
        return int(round(v * 100))

    sx = float(Fraction(sum(cents(r["l_quantity"]) for r in train), 100))
    sy = float(Fraction(sum(cents(r["l_extendedprice"]) for r in train), 100))
    sxy = float(Fraction(
        sum(cents(r["l_quantity"]) * cents(r["l_extendedprice"])
            for r in train), 10000))
    sxx = float(Fraction(
        sum(cents(r["l_quantity"]) ** 2 for r in train), 10000))
    n = len(train)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    resid_cents = sorted(
        math.floor(
            abs(r["l_extendedprice"] - (intercept + slope * r["l_quantity"]))
            * 100
        )
        for r in cal
    )
    k = min((9 * (len(cal) + 1) + 9) // 10, len(cal))
    qhat = resid_cents[k - 1] / 100

    row = (
        REGISTRY["conformal_linreg_intervals"].spark(spark, sf).collect()[0]
    )
    assert row["n_train"] == n and row["n_cal"] == len(cal)
    assert abs(row["slope"] - round(slope, 6)) < 1e-9
    assert abs(row["intercept"] - round(intercept, 6)) < 1e-9
    assert row["qhat"] == qhat
    covered = sum(1 for c in resid_cents if c / 100 <= qhat)
    assert covered / len(cal) >= 0.9


# ------------------------------------------- round-10 batch 4 (drift/MI)


def _mk_events(con, tmp_path, select: str) -> None:
    _copy(con, tmp_path, "events", select)


def test_ks_disjoint_halves_is_one_and_identical_is_zero(spark, tmp_path):
    """Disjoint value supports across the two halves → D = 1.0 at the
    first half's max value; identical distributions → D = 0.0."""
    con = duckdb.connect()
    # days 0..3 (midpoint day 1): first half values {1.0,2.0},
    # second half {3.0,4.0}
    _mk_events(
        con, tmp_path,
        """SELECT CAST(i AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + ((i % 4) || ' days')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id, 'view' AS event_type,
                  CASE WHEN i % 4 <= 1 THEN 1.0 + i % 2
                       ELSE 3.0 + i % 2 END AS value,
                  '{}' AS props
           FROM range(0, 40) t(i)""",
    )
    con.close()
    row = (
        REGISTRY["ks_value_drift_report"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert row["ks_d"] == 1.0
    assert row["ks_at_value"] == 2.0
    assert row["n_first"] == 20 and row["n_second"] == 20

    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        """SELECT CAST(i AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + ((i % 4) || ' days')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id, 'view' AS event_type,
                  CAST(1.0 + i % 2 AS DOUBLE) AS value, '{}' AS props
           FROM range(0, 40) t(i)""",
    )
    con.close()
    row = (
        REGISTRY["ks_value_drift_report"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert row["ks_d"] == 0.0


def test_psi_identical_halves_is_exactly_zero(spark, tmp_path):
    """Equal per-bucket counts make p == q in every bucket, so every
    smoothed term is exactly 0 — PSI 0.0; a shifted second half > 0."""
    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        """SELECT CAST(i AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + ((i % 4) || ' days')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id, 'view' AS event_type,
                  CAST(1.0 + (i // 4) % 10 AS DOUBLE) AS value, '{}' AS props
           FROM range(0, 80) t(i)""",
    )
    con.close()
    row = REGISTRY["psi_value_drift"].spark(spark, str(tmp_path)).collect()[0]
    assert row["psi"] == 0.0
    assert row["n_first"] == row["n_second"] == 40

    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        """SELECT CAST(i AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + ((i % 4) || ' days')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id, 'view' AS event_type,
                  CASE WHEN i % 4 <= 1 THEN CAST(1.0 + (i // 4) % 10 AS DOUBLE)
                       ELSE CAST(31.0 + (i // 4) % 10 AS DOUBLE) END AS value,
                  '{}' AS props
           FROM range(0, 80) t(i)""",
    )
    con.close()
    row = REGISTRY["psi_value_drift"].spark(spark, str(tmp_path)).collect()[0]
    assert row["psi"] > 1.0   # fully shifted distribution -> large PSI


def test_mi_independent_zero_dependent_ln2(spark, tmp_path):
    """Exactly independent type×hour counts → every term ln(1)=0;
    a perfectly type-determines-hour fixture → 0.5·ln(2) per type."""
    con = duckdb.connect()
    # independent: types a,b × hours 0,1, 5 events each
    _mk_events(
        con, tmp_path,
        """SELECT CAST(i AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + ((i % 2) || ' hours')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id,
                  CASE WHEN (i // 2) % 2 = 0 THEN 'a' ELSE 'b' END AS event_type,
                  1.0 AS value, '{}' AS props
           FROM range(0, 20) t(i)""",
    )
    con.close()
    got = {
        r["event_type"]: r["mi_contribution"]
        for r in REGISTRY["mi_event_type_hour"].spark(spark, str(tmp_path)).collect()
    }
    assert got == {"a": 0.0, "b": 0.0}

    con = duckdb.connect()
    # dependent: type a only hour 0, type b only hour 1
    _mk_events(
        con, tmp_path,
        """SELECT CAST(i AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + ((i % 2) || ' hours')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id,
                  CASE WHEN i % 2 = 0 THEN 'a' ELSE 'b' END AS event_type,
                  1.0 AS value, '{}' AS props
           FROM range(0, 20) t(i)""",
    )
    con.close()
    got = {
        r["event_type"]: r["mi_contribution"]
        for r in REGISTRY["mi_event_type_hour"].spark(spark, str(tmp_path)).collect()
    }
    expect = round(0.5 * math.log(2.0), 9)
    assert got == {"a": expect, "b": expect}


def test_gini_separable_fixture_finds_zero_impurity_split(spark, tmp_path):
    """Quantity ≤ 2 all non-returns, > 2 all returns: the stump at 2.0
    has weighted Gini exactly 0 and carries the is_best flag; the
    interior mixed split matches a hand computation."""
    con = duckdb.connect()
    _copy(
        con, tmp_path, "lineitem",
        """SELECT CAST(i AS BIGINT) AS l_orderkey, CAST(1 AS BIGINT) AS l_partkey,
                  CAST(1 AS BIGINT) AS l_suppkey, CAST(1 AS INT) AS l_linenumber,
                  CAST(1 + i % 4 AS DOUBLE) AS l_quantity,
                  10.0 AS l_extendedprice, 0.0 AS l_discount, 0.0 AS l_tax,
                  CASE WHEN i % 4 >= 2 THEN 'R' ELSE 'N' END AS l_returnflag,
                  'O' AS l_linestatus, TIMESTAMP '2024-01-01' AS l_shipdate
           FROM range(0, 40) t(i)""",
    )
    con.close()
    rows = {
        r["threshold"]: r
        for r in REGISTRY["gini_split_quantity_return"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # thresholds 1,2,3 (4 excluded: empty right side)
    assert set(rows) == {1.0, 2.0, 3.0}
    assert rows[2.0]["gini_weighted"] == 0.0 and rows[2.0]["is_best"]
    assert not rows[1.0]["is_best"] and not rows[3.0]["is_best"]
    # threshold 1: left 10 pure neg (gini 0), right 30 with 20 pos:
    # weighted = (30/40)·(1 − (20/30)² − (10/30)²)
    expect = round((30 / 40) * (1 - (20 / 30) ** 2 - (10 / 30) ** 2), 6)
    assert abs(rows[1.0]["gini_weighted"] - expect) < 1e-9
    assert rows[1.0]["n_left"] == 10 and rows[1.0]["pos_left"] == 0


# --------------------------------------- round-10 batch 5 (fits/forecast)


def test_zipf_fit_matches_python_on_crafted_powerlaw(spark, tmp_path):
    """Token counts 8/4/2/1 → recompute the ln-ln OLS with the same
    6dp-rounded logs; slope/intercept/r² must match exactly."""
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    con = duckdb.connect()
    _copy(
        con, tmp_path, "documents",
        f"SELECT CAST(1 AS BIGINT) AS doc_id, '{text}' AS text, "
        "'en' AS lang, 'web' AS source, "
        f"CAST({len(text)} AS BIGINT) AS n_chars",
    )
    con.close()
    row = REGISTRY["zipf_token_fit"].spark(spark, str(tmp_path)).collect()[0]
    pts = [(math.log(r + 1), math.log(c)) for r, c in
           enumerate([8, 4, 2, 1])]
    pts = [(round(x, 6), round(y, 6)) for x, y in pts]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert row["n_ranks"] == 4
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert abs(row["zipf_intercept"] - intercept) < 1e-5
    assert abs(row["r2"] - r2) < 1e-5
    assert row["zipf_slope"] < 0  # frequencies decay with rank


def test_ewma_weights_and_window_cutoff(spark, tmp_path):
    """Hand-checked EWMA: counts 5 (anchor day), 10 (day−1), 100 (day−20,
    OUTSIDE the 14-day window → excluded). Forecast = (5·w0 + 10·w1)/ΣW."""
    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        """SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS event_id,
                  TIMESTAMP '2024-02-21' - (d || ' days')::INTERVAL AS ts,
                  CAST(1 AS BIGINT) AS user_id, 'view' AS event_type,
                  1.0 AS value, '{}' AS props
           FROM (SELECT 0 AS d, 5 AS c UNION ALL SELECT 1, 10
                 UNION ALL SELECT 20, 100) s,
                range(0, 100) r(i)
           WHERE i < s.c""",
    )
    con.close()
    row = (
        REGISTRY["ewma_daily_forecast"].spark(spark, str(tmp_path)).collect()[0]
    )
    a = 0.3
    w = [a * (1 - a) ** j for j in range(14)]
    expect = round(
        (round(5 * w[0], 6) + round(10 * w[1], 6)) / math.fsum(w), 6
    )
    assert row["n_days_observed"] == 2
    assert abs(row["ewma_forecast"] - expect) < 1e-9


def test_theil_sen_ignores_outlier_group(spark, tmp_path):
    """Five heavy groups on the exact line y = 2x plus one light
    far-outlier group: the weighted median slope stays exactly 2.0
    (the OLS estimate would be dragged far off)."""
    con = duckdb.connect()
    _copy(
        con, tmp_path, "lineitem",
        """SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS l_orderkey,
                  CAST(1 AS BIGINT) AS l_partkey,
                  CAST(1 AS BIGINT) AS l_suppkey, CAST(1 AS INT) AS l_linenumber,
                  CAST(x AS DOUBLE) AS l_quantity,
                  CAST(CASE WHEN x = 6 THEN 1000.0 ELSE 2.0 * x END
                       AS DOUBLE) AS l_extendedprice,
                  0.0 AS l_discount, 0.0 AS l_tax, 'N' AS l_returnflag,
                  'O' AS l_linestatus, TIMESTAMP '2024-01-01' AS l_shipdate
           FROM UNNEST([1, 2, 3, 4, 5]) s(x), range(0, 10) r(i)
           UNION ALL
           SELECT 999, 1, 1, 1, 6.0, 1000.0, 0.0, 0.0, 'N', 'O',
                  TIMESTAMP '2024-01-01'""",
    )
    con.close()
    row = (
        REGISTRY["theil_sen_grouped_slope"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert row["n_pairs"] == 15  # C(6,2)
    assert row["ts_slope"] == 2.0


# ------------------------------------- round-10 batch 6 (integrity/survival)


def test_fk_audit_counts_planted_orphans(spark, tmp_path):
    """One lineitem row references a missing order: exactly that
    relationship reports the orphan; the part/supplier/customer
    relationships stay clean."""
    con = duckdb.connect()
    _copy(con, tmp_path, "orders",
          "SELECT CAST(1 AS BIGINT) AS o_orderkey, CAST(1 AS BIGINT) AS "
          "o_custkey, 'O' AS o_orderstatus, 10.0 AS o_totalprice, "
          "TIMESTAMP '2024-01-01' AS o_orderdate, '1-U' AS o_orderpriority")
    _copy(con, tmp_path, "customer",
          "SELECT CAST(1 AS BIGINT) AS c_custkey, 'c' AS c_name, "
          "CAST(1 AS INT) AS c_nationkey, 0.0 AS c_acctbal, 'B' AS c_mktsegment")
    _copy(con, tmp_path, "part",
          "SELECT CAST(1 AS BIGINT) AS p_partkey, 'p' AS p_name, "
          "'M' AS p_mfgr, 'B' AS p_brand, 't' AS p_type, CAST(1 AS INT) "
          "AS p_size, 'c' AS p_container, 1.0 AS p_retailprice")
    _copy(con, tmp_path, "supplier",
          "SELECT CAST(1 AS BIGINT) AS s_suppkey, 's' AS s_name, "
          "'a' AS s_address, CAST(1 AS INT) AS s_nationkey, 0.0 AS s_acctbal")
    _copy(con, tmp_path, "lineitem",
          """SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
               CAST(1 AS INT), 1.0, 10.0, 0.0, 0.0, 'N', 'O',
               TIMESTAMP '2024-01-01'),
              (CAST(99 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
               CAST(1 AS INT), 1.0, 10.0, 0.0, 0.0, 'N', 'O',
               TIMESTAMP '2024-01-01')
          ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
              l_extendedprice, l_discount, l_tax, l_returnflag,
              l_linestatus, l_shipdate)""")
    con.close()
    got = {
        r["relationship"]: r
        for r in REGISTRY["fk_integrity_audit"].spark(spark, str(tmp_path)).collect()
    }
    assert got["lineitem->orders"]["orphan_rows"] == 1
    assert got["lineitem->orders"]["orphan_keys"] == 1
    assert got["lineitem->orders"]["child_rows"] == 2
    for rel in ["lineitem->part", "lineitem->supplier", "orders->customer"]:
        assert got[rel]["orphan_rows"] == 0, rel


def test_kaplan_meier_hand_computed_curve(spark, tmp_path):
    """Four users (deaths at lifetimes 0 and 5; two censored near the
    horizon): S = 0.75 after t=0, 0.5 after t=5, flat thereafter —
    censored users leave the risk set without dropping the curve."""
    con = duckdb.connect()
    # A: day0 only; B: day0+day5; C: day0+day10; D: day2+day8
    _mk_events(
        con, tmp_path,
        """SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + (d || ' days')::INTERVAL AS ts,
                  CAST(u AS BIGINT) AS user_id, 'view' AS event_type,
                  1.0 AS value, '{}' AS props
           FROM (VALUES (1, 0), (2, 0), (2, 5), (3, 0), (3, 10),
                        (4, 2), (4, 8)) t(u, d)""",
    )
    con.close()
    got = {
        r["lifetime_days"]: r
        for r in REGISTRY["kaplan_meier_user_lifetime"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == {0, 5, 6, 10}
    assert got[0]["n_at_risk"] == 4 and got[0]["n_deaths"] == 1
    assert abs(got[0]["survival"] - 0.75) < 1e-6
    assert got[5]["n_at_risk"] == 3 and got[5]["n_deaths"] == 1
    assert abs(got[5]["survival"] - 0.5) < 1e-6
    assert got[6]["n_deaths"] == 0 and got[6]["n_censored"] == 1
    assert abs(got[6]["survival"] - 0.5) < 1e-6
    assert got[10]["n_censored"] == 1
    assert abs(got[10]["survival"] - 0.5) < 1e-6


def test_kaplan_meier_total_churn_zeroes_curve(spark, tmp_path):
    """If every remaining user churns at the last level, survival is
    exactly 0.0 there (not exp(ln(0)) noise)."""
    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        """SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + (d || ' days')::INTERVAL AS ts,
                  CAST(u AS BIGINT) AS user_id, 'view' AS event_type,
                  1.0 AS value, '{}' AS props
           FROM (VALUES (1, 0), (1, 2), (2, 0), (2, 2),
                        (9, 0), (9, 30)) t(u, d)""",
    )
    con.close()
    got = {
        r["lifetime_days"]: r
        for r in REGISTRY["kaplan_meier_user_lifetime"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # horizon = day30: users 1,2 die at lt=2; user 9 censored at lt=30
    assert abs(got[2]["survival"] - (1 - 2 / 3)) < 1e-6
    assert got[30]["survival"] == got[2]["survival"]  # censoring only
    # now the all-churn shape: drop user 9's horizon event
    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        """SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' + (d || ' days')::INTERVAL AS ts,
                  CAST(u AS BIGINT) AS user_id, 'view' AS event_type,
                  1.0 AS value, '{}' AS props
           FROM (VALUES (1, 0), (1, 2), (2, 0), (2, 2)) t(u, d)""",
    )
    con.close()
    got = {
        r["lifetime_days"]: r
        for r in REGISTRY["kaplan_meier_user_lifetime"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # horizon = day2; both users' last day IS the horizon -> censored,
    # zero deaths: flat curve at 1.0
    assert got[2]["n_deaths"] == 0 and got[2]["survival"] == 1.0


def test_ab_ztest_matches_hand_formula(spark, tmp_path):
    """Variant A (even users): 1 of 2 converts; variant B (odd): 2 of 2.
    z matches the pooled-variance formula computed in Python."""
    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        """SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) AS event_id,
                  TIMESTAMP '2024-01-01' AS ts, CAST(u AS BIGINT) AS user_id,
                  et AS event_type, 1.0 AS value, '{}' AS props
           FROM (VALUES (2, 'purchase'), (4, 'view'), (1, 'purchase'),
                        (3, 'purchase'), (3, 'view')) t(u, et)""",
    )
    con.close()
    row = (
        REGISTRY["ab_conversion_ztest"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert (row["n_a"], row["n_b"]) == (2, 2)
    assert (row["conv_a"], row["conv_b"]) == (1, 2)
    pa, pb, pp = 0.5, 1.0, 0.75
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 2 + 1 / 2))
    assert abs(row["z_score"] - round(z, 6)) < 1e-9


def test_decon_vectorized_twin_bit_equal_to_semijoin(spark):
    """The Arrow twin must reproduce the eval-broadcast cosine semi-join
    EXACTLY (same flags, hence same per-label counts) on real data —
    the dim-sequential accumulation replicates the fold's IEEE order."""
    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.functions import similarity as sim
    from stream_processing_spark.queries.mlfeat import (
        _DECON_EVAL_MAX_ID, _DECON_TAU,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    is_eval = (F.col("vec_id") % 23 == 0) & (
        F.col("vec_id") <= _DECON_EVAL_MAX_ID
    )
    ev = emb.filter(is_eval).select(F.col("embedding").alias("qe"))
    tr = emb.filter(~is_eval)
    semi = tr.join(
        F.broadcast(ev),
        sim.cosine(F.col("embedding"), F.col("qe")) >= _DECON_TAU,
        "left_semi",
    )
    expect = {
        (r["label"], r["n"])
        for r in semi.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        (r["label"], r["n_contaminated"])
        for r in REGISTRY["decontaminate_embedding_neighbors"]
        .spark(spark, sf)
        .collect()
        if r["n_contaminated"] > 0
    }
    assert got == expect


def test_streaming_ks_twin_equals_batch_report(spark):
    """The drained streaming monitor must reproduce the batch KS report
    row exactly (final complete-mode state == batch aggregate)."""
    sf = "/root/testdata/sf0.001"
    batch = REGISTRY["ks_value_drift_report"].spark(spark, sf).collect()
    stream = REGISTRY["streaming_ks_drift_monitor"].spark(spark, sf).collect()
    assert [r.asDict() for r in batch] == [r.asDict() for r in stream]


# ---------------------------------- round-10 batch 7 (bootstrap / HLL)


def test_bootstrap_ci_matches_exact_python_recompute(spark, tmp_path):
    """Full pipeline recomputed exactly in Python (hashlib md5 → uniform
    → Poisson inverse-CDF → Fraction-exact replicate sums → rank pick):
    CI endpoints and full mean must match to the printed 6dp."""
    import hashlib
    from stream_processing_spark.queries.mlfeat import (
        _BOOT_B, _BOOT_CUM, _BOOT_LO_RANK, _BOOT_HI_RANK,
    )

    prices = [(i, 100.0 + 7 * (i % 13) + 0.25 * (i % 4)) for i in range(30)]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {p})" for i, p in prices)
    _copy(
        con, tmp_path, "orders",
        f"""SELECT CAST(c0 AS BIGINT) AS o_orderkey, CAST(1 AS BIGINT) AS
                   o_custkey, 'O' AS o_orderstatus, CAST(c1 AS DOUBLE) AS
                   o_totalprice, TIMESTAMP '2024-01-01' AS o_orderdate,
                   '1-U' AS o_orderpriority
            FROM (VALUES {vals}) t(c0, c1)""",
    )
    con.close()

    def weight(key, b):
        h = hashlib.md5(f"{key}:{b}".encode()).hexdigest()[:12]
        u = int(h, 16) / 2**48
        for k, t in enumerate(_BOOT_CUM):
            if u < t:
                return k
        return 9

    means = []
    for b in range(_BOOT_B):
        sw = sp = 0
        for key, p in prices:
            w = weight(key, b)
            sw += w
            sp += w * int(round(p * 100))
        if sw:
            means.append((float(Fraction(sp, 100)) / sw, b))
    means.sort()
    lo = round(means[_BOOT_LO_RANK - 1][0], 6)
    hi = round(means[_BOOT_HI_RANK - 1][0], 6)
    total = sum(int(round(p * 100)) for _, p in prices)
    mean_full = round(float(Fraction(total, 100)) / len(prices), 6)

    row = (
        REGISTRY["bootstrap_mean_ci_orders"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert row["n_orders"] == 30 and row["b_replicates"] == _BOOT_B
    assert row["mean_price"] == mean_full
    assert row["ci_low"] == lo and row["ci_high"] == hi
    assert row["ci_low"] < row["mean_price"] < row["ci_high"]


def test_hll_estimate_matches_exact_python_recompute(spark, tmp_path):
    """Register construction and estimator recomputed exactly in Python
    over 400 planted distinct users; the report's exact count and
    estimate must agree, and the estimate lands within 3σ ≈ 40%."""
    import hashlib
    from stream_processing_spark.queries.mlfeat import (
        _HLL_ALPHA, _HLL_M, _HLL_SCALE, _HLL_WBITS, _HLL_WMOD,
    )

    n_users = 400
    con = duckdb.connect()
    _mk_events(
        con, tmp_path,
        f"""SELECT CAST(i AS BIGINT) AS event_id,
                   TIMESTAMP '2024-01-01' AS ts,
                   CAST(i % {n_users} AS BIGINT) AS user_id,
                   'view' AS event_type, 1.0 AS value, '{{}}' AS props
            FROM range(0, {3 * n_users}) t(i)""",
    )
    con.close()

    regs = [0] * _HLL_M
    for u in range(n_users):
        v = int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)
        bucket, w = v // _HLL_WMOD, v % _HLL_WMOD
        r = _HLL_WBITS + 1 if w == 0 else _HLL_WBITS - (w.bit_length() - 1)
        regs[bucket] = max(regs[bucket], r)
    s_scaled = sum(2 ** (_HLL_WBITS + 1 - m) for m in regs)
    n_zero = sum(1 for m in regs if m == 0)
    e_raw = _HLL_ALPHA * _HLL_M * _HLL_M * _HLL_SCALE / s_scaled
    e = (
        _HLL_M * math.log(_HLL_M / n_zero)
        if (e_raw <= 2.5 * _HLL_M and n_zero > 0)
        else e_raw
    )
    row = (
        REGISTRY["hll_manual_distinct_users"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert row["n_exact"] == n_users
    assert row["n_zero_registers"] == n_zero
    assert row["hll_estimate"] == round(e, 6)
    assert abs(row["hll_estimate"] - n_users) / n_users < 0.4


def test_cms_exact_python_recompute_and_one_sided(spark, tmp_path):
    """CMS counters recomputed exactly with hashlib on a crafted corpus:
    estimates match bit-for-bit and are never below the exact counts."""
    import hashlib
    from collections import Counter
    from stream_processing_spark.queries.mlfeat import (
        _CMS_D, _CMS_TOPK, _CMS_W,
    )

    text = " ".join(
        ["alpha"] * 30 + ["beta"] * 20 + ["gamma"] * 10 + ["delta"] * 5
        + [f"rare{i}" for i in range(40)]
    )
    con = duckdb.connect()
    _copy(
        con, tmp_path, "documents",
        f"SELECT CAST(1 AS BIGINT) AS doc_id, '{text}' AS text, 'en' AS "
        f"lang, 'web' AS source, CAST({len(text)} AS BIGINT) AS n_chars",
    )
    con.close()

    toks = text.split(" ")
    counters = Counter()
    for t in toks:
        for r in range(_CMS_D):
            h = hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8]
            counters[(r, int(h, 16) % _CMS_W)] += 1
    exact = Counter(toks)
    cand = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOPK]
    expect = {}
    for t, n in cand:
        est = min(
            counters[(r, int(hashlib.md5(f"{r}:{t}".encode())
                             .hexdigest()[:8], 16) % _CMS_W)]
            for r in range(_CMS_D)
        )
        expect[t] = (n, est)

    got = {
        r["token"]: (r["n_exact"], r["cms_estimate"], r["overestimate"])
        for r in REGISTRY["cms_token_frequency_report"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == set(expect)
    for t, (n, est, over) in got.items():
        assert (n, est) == expect[t]
        assert over == est - n and over >= 0


def test_skewness_exact_zero_and_matches_numpy(spark, tmp_path):
    """A symmetric fixture has skewness exactly 0; an asymmetric one
    matches a numpy population-moment recomputation."""
    import numpy as np

    con = duckdb.connect()
    vals = [10.0, 20.0, 30.0, 40.0, 50.0]          # symmetric -> 0
    rvals = [10.0, 10.0, 10.0, 11.0, 100.0]        # right-skewed
    rows = ", ".join(
        f"({i}, {v}, 'S')" for i, v in enumerate(vals)
    ) + ", " + ", ".join(
        f"({i + 10}, {v}, 'R')" for i, v in enumerate(rvals)
    )
    _copy(
        con, tmp_path, "orders",
        f"""SELECT CAST(c0 AS BIGINT) AS o_orderkey, CAST(1 AS BIGINT) AS
                   o_custkey, c2 AS o_orderstatus, CAST(c1 AS DOUBLE) AS
                   o_totalprice, TIMESTAMP '2024-01-01' AS o_orderdate,
                   '1-U' AS o_orderpriority
            FROM (VALUES {rows}) t(c0, c1, c2)""",
    )
    con.close()
    got = {
        r["o_orderstatus"]: r
        for r in REGISTRY["skewness_price_by_status"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got["S"]["skewness"] == 0.0
    assert got["S"]["mean_price"] == 30.0
    x = np.array(rvals)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    assert abs(got["R"]["skewness"] - m3 / m2 ** 1.5) < 1e-6
    assert got["R"]["skewness"] > 1.0
    assert abs(got["R"]["stddev_price"] - math.sqrt(m2)) < 1e-6
