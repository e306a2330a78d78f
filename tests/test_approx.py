"""Accuracy gate for approximate aggregates: no exact VALUE oracle
exists by design (HLL/KLL sketches are engine-specific), so two
independent checks stand in (VERDICT r2 item 8):

1. bounded relative error against the EXACT answer (Spark-side);
2. a cross-ENGINE loose-bound oracle — DuckDB's own
   approx_count_distinct / approx_quantile over the same parquet must
   land in the same neighborhood, so a busted sketch config on either
   side trips the gate even if the exact path regressed with it.
"""

from __future__ import annotations

from stream_processing_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_within_tolerance(spark):
    row = REGISTRY["agg_approx_distinct_users"].spark(spark, SF_DIR).head()
    from stream_processing_spark.catalog import load_table

    events = load_table(spark, SF_DIR, "events")
    exact_users = events.select("user_id").distinct().count()
    exact_events = events.select("event_id").distinct().count()

    assert abs(row.approx_users - exact_users) / exact_users < 0.10
    assert abs(row.approx_events - exact_events) / exact_events < 0.10
    assert row.n_rows == events.count()


def test_approx_percentiles_within_rank_tolerance(spark):
    """Each approx_percentile estimate must sit within a small rank
    neighborhood of the true quantile (the sketch's contract), checked
    per status group against the exact percentile."""
    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table

    rows = {
        r["o_orderstatus"]: r["approx_p"]
        for r in REGISTRY["agg_approx_price_percentiles"]
        .spark(spark, SF_DIR)
        .collect()
    }
    exact = {
        r["o_orderstatus"]: r["ex"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile(
                "o_totalprice", F.array(F.lit(0.05), F.lit(0.5), F.lit(0.95))
            ).alias("ex")
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for status, approx in rows.items():
        for a, e in zip(approx, exact[status]):
            assert abs(a - e) / e < 0.05, (status, a, e)


def test_approx_distinct_cross_engine_bound(spark, duck):
    """Independent-engine oracle: DuckDB's own HLL estimate over the
    SAME parquet must agree with Spark's within the combined sketch
    error (both run rsd≈5%-class sketches; 15% headroom covers two
    independent error draws)."""
    row = REGISTRY["agg_approx_distinct_users"].spark(spark, SF_DIR).head()
    d = duck.execute(
        "SELECT approx_count_distinct(user_id) AS u, "
        "approx_count_distinct(event_id) AS e, COUNT(*) AS n FROM events"
    ).fetchone()
    assert abs(row.approx_users - d[0]) / d[0] < 0.15
    assert abs(row.approx_events - d[1]) / d[1] < 0.15
    assert row.n_rows == d[2]


def test_approx_percentiles_cross_engine_bound(spark, duck):
    """Independent-engine oracle: DuckDB approx_quantile per status must
    sit within a small relative band of Spark's approx_percentile (both
    sketches target the same quantiles of the same data; 5% relative
    band ≫ either sketch's rank error at sf0.01)."""
    rows = {
        r["o_orderstatus"]: r["approx_p"]
        for r in REGISTRY["agg_approx_price_percentiles"]
        .spark(spark, SF_DIR)
        .collect()
    }
    d = {
        status: (p05, p50, p95)
        for status, p05, p50, p95 in duck.execute(
            "SELECT o_orderstatus, "
            "approx_quantile(o_totalprice, 0.05), "
            "approx_quantile(o_totalprice, 0.5), "
            "approx_quantile(o_totalprice, 0.95) "
            "FROM orders GROUP BY o_orderstatus"
        ).fetchall()
    }
    assert set(rows) == set(d)
    for status, approx in rows.items():
        for a, e in zip(approx, d[status]):
            assert abs(a - float(e)) / float(e) < 0.05, (status, a, e)


def test_hll_sketch_rollup_bound_and_mergeability(spark):
    # the union-of-daily-sketches estimate must (a) sit within HLL's
    # error envelope of the exact distinct count (lgK=12 -> ~1.6% rse;
    # 3% is ~2 sigma) and (b) equal the direct one-pass sketch estimate
    # — the re-aggregation property the architecture rests on
    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    got = {
        r.event_type: r.est_users
        for r in REGISTRY["hll_sketch_rollup_users"].spark(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    exact = {
        r.event_type: r.x
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    direct = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            .cast("bigint")
            .alias("d")
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, est in got.items():
        assert abs(est - exact[et]) <= max(2, 0.03 * exact[et]), (
            et, est, exact[et],
        )
        assert est == direct[et], (et, est, direct[et])
