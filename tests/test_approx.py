"""Accuracy gate for approximate aggregates: no exact oracle exists by
design (HLL sketches are engine-specific), so assert bounded relative
error against the exact answer instead."""

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
