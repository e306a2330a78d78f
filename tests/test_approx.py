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
