"""Unit tests for the batch-3 curation operators (curation4.py):
PII redaction, blocklist filter, type-token ratio, winsorized stats,
cross-source span overlap, contrastive triplets. Oracle hash-matches
run in test_oracle_queries.py; these cover the boundary behavior the
fixture data cannot (exact thresholds, degenerate groups, planted
overlaps).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_processing_spark.queries import REGISTRY


def _write(spark, tmpdir: str, table: str, rows, schema: str) -> str:
    d = os.path.join(tmpdir, "sf")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(d, f"{table}.parquet"))
    return d


def _docs(spark, tmpdir, rows):
    return _write(
        spark,
        tmpdir,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


# ------------------------------------------------------- PII redaction


def test_pii_redacts_only_tagged_docs(spark, tmp_path):
    # doc_id 0 (0%7<3 → tagged) gets contacts planted; doc_id 3 stays
    # clean and must come through with zero matches and zero chars removed
    d = _docs(
        spark,
        str(tmp_path),
        [(0, "alpha beta", "en", "s0", 10), (3, "gamma delta", "en", "s0", 11)],
    )
    row = REGISTRY["pii_redact_stats"].spark(spark, d).collect()[0]
    assert row["n_docs"] == 2
    assert row["n_docs_redacted"] == 1
    assert row["n_emails"] == 1 and row["n_phones"] == 1
    # email 'user0@example.com' (17) → '<EMAIL>' (7): 10 removed;
    # phone '415-555-0000' (12) → '<PHONE>' (7): 5 removed
    assert row["chars_removed"] == 15


def test_pii_multiple_matches_in_one_doc(spark, tmp_path):
    # an untagged doc whose ORIGINAL text already contains two emails:
    # the redactor counts both (it scrubs found PII, not just planted)
    d = _docs(
        spark,
        str(tmp_path),
        [(3, "write a@b.com and c@d.org now", "en", "s0", 29)],
    )
    row = REGISTRY["pii_redact_stats"].spark(spark, d).collect()[0]
    assert row["n_emails"] == 2 and row["n_phones"] == 0
    assert row["n_docs_redacted"] == 1


# -------------------------------------------------- blocklist filtering


def test_blocklist_threshold_is_strict(spark, tmp_path):
    # exactly 6% blocked (3 of 50): rule is hits*100 < n*6, so equality
    # means NOT kept — the boundary doc lands in keep=false
    boundary = " ".join(["slow"] * 3 + ["ok"] * 47)
    under = " ".join(["slow"] * 2 + ["ok"] * 48)  # 4% → kept
    d = _docs(
        spark,
        str(tmp_path),
        [(0, boundary, "en", "s0", 1), (1, under, "en", "s0", 1)],
    )
    got = {
        r["keep"]: r["n_docs"]
        for r in REGISTRY["quality_blocklist_filter"].spark(spark, d).collect()
    }
    assert got == {False: 1, True: 1}


# --------------------------------------------- type-token ratio quality


def test_ttr_degenerate_docs(spark, tmp_path):
    # all-identical tokens → TTR 1/4 (low diversity); all-distinct → 1.0
    d = _docs(
        spark,
        str(tmp_path),
        [
            (0, "x x x x", "en", "s0", 7),
            (1, "a b c d", "en", "s1", 7),
        ],
    )
    rows = {
        r["source"]: r
        for r in REGISTRY["text_type_token_ratio"].spark(spark, d).collect()
    }
    assert rows["s0"]["n_low_diversity"] == 1
    assert rows["s0"]["pooled_ttr"] == 0.25
    assert rows["s1"]["n_low_diversity"] == 0
    assert rows["s1"]["pooled_ttr"] == 1.0


# ------------------------------------------------- winsorized statistics


def test_winsorize_constant_group_is_identity(spark, tmp_path):
    # constant prices: q05 == q95 == value → nothing clamps, means equal
    d = _write(
        spark,
        str(tmp_path),
        "orders",
        [(i, "F", 100.0) for i in range(20)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    row = REGISTRY["winsorized_price_stats"].spark(spark, d).collect()[0]
    assert row["n_clamped_low"] == 0 and row["n_clamped_high"] == 0
    assert row["avg_winsorized"] == row["avg_raw"] == 100.0


def test_winsorize_bounds_the_outlier(spark, tmp_path):
    # one fat-finger order: raw mean moves, winsorized mean stays near
    # the bulk — the whole point of the operator
    prices = [(i, "F", 100.0) for i in range(99)] + [(99, "F", 1_000_000.0)]
    d = _write(
        spark,
        str(tmp_path),
        "orders",
        prices,
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    row = REGISTRY["winsorized_price_stats"].spark(spark, d).collect()[0]
    assert row["n_clamped_high"] == 1
    assert row["avg_raw"] > 10_000
    assert row["avg_winsorized"] < row["avg_raw"]


# ------------------------------------- cross-source span overlap matrix


def test_cross_source_overlap_planted_span(spark, tmp_path):
    shared = "one two three four five six seven eight"  # exactly 1 span
    d = _docs(
        spark,
        str(tmp_path),
        [
            (0, shared + " tail0 tail1", "en", "sa", 1),
            (1, "lead0 lead1 " + shared, "en", "sb", 1),
            (2, "totally different words here with no overlap at all", "en", "sc", 1),
        ],
    )
    rows = REGISTRY["cross_source_span_overlap"].spark(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("sa", "sb")
    assert r["shared_spans"] == 1
    # sa has 3 spans (10 tokens), sb has 3 → coef = 1/3
    assert r["overlap_coef"] == round(1 / 3, 6)


# ------------------------------------------- contrastive triplet mining


def _emb(spark, tmpdir, n, n_labels):
    rows = [
        (i, [float(i % 3) + 0.1, float(i % 5) - 0.2, 1.0], i % n_labels)
        for i in range(n)
    ]
    return _write(
        spark,
        tmpdir,
        "embeddings",
        rows,
        "vec_id bigint, embedding array<float>, label int",
    )


def test_triplets_invariants(spark, tmp_path):
    d = _emb(spark, str(tmp_path), 20, 4)
    rows = REGISTRY["contrastive_triplets"].spark(spark, d).collect()
    assert rows, "multi-member labels must produce triplets"
    anchors = [r["anchor_id"] for r in rows]
    assert len(anchors) == len(set(anchors)), "one triplet per anchor"
    emb = {i: i % 4 for i in range(20)}  # vec_id -> label
    for r in rows:
        assert emb[r["pos_id"]] == emb[r["anchor_id"]]
        assert emb[r["neg_id"]] != emb[r["anchor_id"]]
        assert r["pos_id"] != r["anchor_id"]
        # margin consistent with its parts (same rounding grid)
        assert abs(r["margin"] - (r["cos_pos"] - r["cos_neg"])) < 2e-6


def test_triplets_skip_singleton_labels(spark, tmp_path):
    # one label has a single member: it can't form a positive and must
    # be absent from the anchors
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 1),  # singleton label
    ]
    d = _write(
        spark,
        str(tmp_path),
        "embeddings",
        rows,
        "vec_id bigint, embedding array<float>, label int",
    )
    got = REGISTRY["contrastive_triplets"].spark(spark, d).collect()
    assert all(r["anchor_id"] != 2 for r in got)


# ------------------------------------------------ dataset pairing audit


def test_pairing_audit_all_three_branches(spark, tmp_path):
    d = _docs(
        spark,
        str(tmp_path),
        [(0, "a b", "en", "s0", 3), (1, "c d", "en", "s0", 3)],
    )
    # vec 1 pairs with doc 1; vec 99 is an orphan; doc 0 is un-embedded
    _write(
        spark,
        str(tmp_path),
        "embeddings",
        [(1, [1.0, 0.0], 0), (99, [0.0, 1.0], 1)],
        "vec_id bigint, embedding array<float>, label int",
    )
    got = {
        r["pair_status"]: (r["n_rows"], r["total_chars"])
        for r in REGISTRY["dataset_pairing_audit"].spark(spark, d).collect()
    }
    assert got == {
        "paired": (1, 3),
        "doc_only": (1, 3),
        "embedding_only": (1, 0),
    }


# -------------------------------------------- length-bucketed batching


def test_length_bucketed_batches_slicing_and_padding(spark, tmp_path):
    # 70 docs of identical length: one bucket, batches of 32 → 32+32+6,
    # padding_efficiency exactly 1.0 (max == every len)
    rows = [(i, "x", "en", "s0", 100) for i in range(70)]
    d = _docs(spark, str(tmp_path), rows)
    got = sorted(
        (r["batch_id"], r["n_docs"], r["padding_efficiency"])
        for r in REGISTRY["length_bucketed_batches"].spark(spark, d).collect()
    )
    assert got == [(0, 32, 1.0), (1, 32, 1.0), (2, 6, 1.0)]


# --------------------------------------- cross-query invariant checks

SF001 = "/root/testdata/sf0.001"


def test_pivot_row_sums_match_daily_totals(spark):
    """The pivoted wide table must conserve mass: summing the five type
    columns per day equals the plain daily count."""
    piv = REGISTRY["pivot_daily_event_counts"].spark(spark, SF001)
    type_cols = [c for c in piv.columns if c != "d"]
    wide = {
        r["d"]: sum(r[c] for c in type_cols) for r in piv.collect()
    }
    from stream_processing_spark.catalog import load_table

    plain = {
        r["d"]: r["n"]
        for r in load_table(spark, SF001, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert wide == plain


def test_epoch_shuffle_is_balanced_and_epoch_dependent(spark):
    """Shards must be near-uniform within an epoch (md5 uniformity) and
    the per-shard doc counts must differ across epochs (the whole point
    of reshuffling per epoch)."""
    rows = REGISTRY["epoch_shuffle_assignment"].spark(spark, SF001).collect()
    by_epoch: dict[int, dict[int, int]] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["shard"]] = r["n_docs"]
    assert set(by_epoch) == {0, 1, 2}
    for epoch, shards in by_epoch.items():
        n = sum(shards.values())
        assert len(shards) == 16
        # every shard within 3x of the uniform share (loose: n=500)
        for cnt in shards.values():
            assert cnt < 3 * n / 16, (epoch, cnt)
    assert by_epoch[0] != by_epoch[1] != by_epoch[2]


def test_daily_growth_first_day_null_and_telescoping(spark):
    rows = REGISTRY["daily_event_growth"].spark(spark, SF001).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        assert rs[0]["delta"] is None and rs[0]["pct_change"] is None
        # deltas telescope: sum of deltas == last count - first count
        deltas = [r["delta"] for r in rs[1:]]
        assert sum(deltas) == rs[-1]["cnt"] - rs[0]["cnt"], t
