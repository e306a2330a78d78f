"""Manifest-based file skipping over a z-ordered layout: pruning must
be a safe over-approximation (identical results to the full scan) while
actually skipping files on either clustered dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.operators import zorder
from stream_processing_spark.sources import manifest as mf

SF = "/root/testdata/sf0.001"
N_FILES = 16


def _zordered_events(spark, tmp_path):
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", day.alias("day")
    )
    path = str(tmp_path / "z")
    zorder.write_zordered(
        ev, path, zorder.morton2(F.col("user_id"), F.col("day"), bits=10),
        n_files=N_FILES,
    )
    return ev, path


def test_pruned_read_equals_full_scan(spark, tmp_path):
    ev, path = _zordered_events(spark, tmp_path)
    man = mf.build_manifest(spark, path, ["user_id", "day"])
    assert man.select("file").distinct().count() == N_FILES

    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).head().user_id
    for intervals, pred in [
        ({"user_id": (uid, uid)}, F.col("user_id") == uid),
        ({"day": (9, 10)}, F.col("day").between(9, 10)),
        (
            {"user_id": (uid, uid), "day": (9, 10)},
            (F.col("user_id") == uid) & F.col("day").between(9, 10),
        ),
    ]:
        kept = mf.prune_files(man, intervals)
        # real skipping: both single-dimension point/range queries must
        # drop at least half the z-ordered files
        assert 0 < len(kept) <= N_FILES // 2, (intervals, len(kept))
        got = sorted(
            tuple(r)
            for r in mf.read_pruned(spark, path, man, intervals)
            .filter(pred)
            .collect()
        )
        want = sorted(tuple(r) for r in ev.filter(pred).collect())
        assert got == want and want, intervals


def test_prune_keeps_file_without_stats(spark, tmp_path):
    _, path = _zordered_events(spark, tmp_path)
    man = mf.build_manifest(spark, path, ["user_id"])
    # a predicate on a column absent from the manifest prunes nothing
    assert len(mf.prune_files(man, {"day": (9, 10)})) == N_FILES


def test_empty_intersection_reads_zero_files(spark, tmp_path):
    ev, path = _zordered_events(spark, tmp_path)
    man = mf.build_manifest(spark, path, ["user_id"])
    out = mf.read_pruned(spark, path, man, {"user_id": (10**9, None)})
    assert out.count() == 0
