"""Z-order layout: the Morton code matches a Python bit-interleave
reference, and — the actual point — a z-ordered parquet layout lets
footer min/max stats prune files for point queries on EITHER dimension,
where a single-key sort only ever prunes its own dimension."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.operators import zorder

SF = "/root/testdata/sf0.001"
N_FILES = 16


def _py_morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton2_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 200, 1023) for b in (0, 3, 29, 512)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = df.select(
        "a", "b", zorder.morton2(F.col("a"), F.col("b"), bits=10).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton(r.a, r.b, 10), (r.a, r.b, r.z)


def _file_stats(path: str) -> list[dict]:
    """Per-file min/max of user_id and day from real parquet footers.
    (day is materialized as an int column: timestamp stats are not
    guaranteed across writer configs — INT96 has none — and a derived
    pruning column is how layout tools ship this anyway.)"""
    import glob

    out = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        lo_u, hi_u, lo_d, hi_d = None, None, None, None
        for g in range(md.num_row_groups):
            su = md.row_group(g).column(cols["user_id"]).statistics
            sd = md.row_group(g).column(cols["day"]).statistics
            lo_u = su.min if lo_u is None else min(lo_u, su.min)
            hi_u = su.max if hi_u is None else max(hi_u, su.max)
            lo_d = sd.min if lo_d is None else min(lo_d, sd.min)
            hi_d = sd.max if hi_d is None else max(hi_d, sd.max)
        out.append({"u": (lo_u, hi_u), "d": (lo_d, hi_d)})
    return out


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", day.alias("day")
    )

    zpath = str(tmp_path / "zordered")
    zorder.write_zordered(
        ev,
        zpath,
        zorder.morton2(F.col("user_id"), F.col("day"), bits=10),
        n_files=N_FILES,
    )
    tpath = str(tmp_path / "day_sorted")  # the single-key baseline
    ev.repartitionByRange(N_FILES, "day").sortWithinPartitions("day").write.mode(
        "overwrite"
    ).parquet(tpath)

    zstats, tstats = _file_stats(zpath), _file_stats(tpath)
    assert len(zstats) == N_FILES and len(tstats) == N_FILES

    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).head().user_id

    def files_for_user(stats):
        return sum(1 for s in stats if s["u"][0] <= uid <= s["u"][1])

    def files_for_day(stats, lo, hi):
        return sum(1 for s in stats if not (s["d"][1] < lo or s["d"][0] > hi))

    lo, hi = 9, 10

    # single-key day sort: perfect on time, useless on user
    assert files_for_day(tstats, lo, hi) <= 3
    assert files_for_user(tstats) >= N_FILES - 2

    # z-order: meaningful pruning on BOTH dimensions
    zu, zd = files_for_user(zstats), files_for_day(zstats, lo, hi)
    assert zu <= N_FILES // 2, (zu, [s["u"] for s in zstats])
    assert zd <= N_FILES // 2, (zd, [s["d"] for s in zstats])
