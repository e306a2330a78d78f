"""transformWithState surface (streaming/tws.py): the Spark-4 successor
stateful API, run on RocksDB (required by the API), asserted against the
same contracts as the applyInPandasWithState tier — running-count
continuation across restart, once-per-key dedup with TTL'd state, and
event-time session timers reproducing the batch gaps-and-islands shape.

ENVIRONMENT GATE: executing a transformWithState query requires the
python ``protobuf`` runtime (>= the version Spark's StateMessage proto
was generated with) for the state-server protocol. conftest.py calls
``compat.ensure_protobuf_runtime()`` before the session exists; in
this container that activates the cloud-sdk's vendored pure-python
protobuf 6.32 under the official version-check override (gencode is
6.33 — one minor of skew, roundtrip-verified), so these tests RUN
here. The ``needs_tws_runtime`` skip remains for containers where no
runtime can be found at all."""

from __future__ import annotations

import os
import time
import uuid as _uuid
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from stream_processing_spark.streaming import StreamJob
from stream_processing_spark.streaming.tws import (
    tws_event_sessions,
    tws_first_seen,
    tws_running_count,
)


def _tws_runtime_available() -> bool:
    """True iff the state-server protocol can actually run: the
    generated proto module imports only under a compatible protobuf."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False


_TWS_RUNTIME = _tws_runtime_available()
needs_tws_runtime = pytest.mark.skipif(
    not _TWS_RUNTIME,
    reason="python protobuf runtime (>= Spark's gencode) not installed",
)


def test_tws_plan_construction_no_runtime_needed(spark, tmp_path):
    """The operator wires into a streaming plan (TransformWithState
    node present, correct output schema) regardless of the protobuf
    runtime — catches API drift even where execution is env-blocked."""
    ind = str(tmp_path / "in")
    os.makedirs(ind, exist_ok=True)
    src = spark.readStream.format("text").load(ind).selectExpr("value as key")
    out = tws_running_count(src)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["key", "cnt"]
    plan = out._jdf.queryExecution().logical().toString()
    assert "TransformWithState" in plan, plan

    sess = tws_event_sessions(
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(ind)
        .withWatermark("ts", "0 seconds")
        .select(F.col("user_id").cast("string").alias("key"), "ts"),
        gap_sec=60,
    )
    assert [f.name for f in sess.schema.fields] == [
        "key", "start_ms", "end_ms", "n_events",
    ]

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def _rocksdb(spark):
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)


def _write_input(d: str, name: str, lines: list[str]) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, os.path.join(d, name))


def _split_kv(df):
    p = F.split(F.col("value"), ",")
    return df.select(p.getItem(0).alias("key"), p.getItem(1).alias("value"))


@needs_tws_runtime
def test_tws_running_count_and_restart_continuation(spark, tmp_path):
    ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
    _write_input(ind, "b1.txt", ["a,1"] * 8 + ["b,1"] * 7)
    ops = [_split_kv, lambda df: tws_running_count(df)]
    job = StreamJob(
        spark, ind, outd, ops=ops, stateful=True, value_col="cnt",
        state_store="rocksdb",
    )
    job.run_to_completion()
    out = {r.value for r in job.read_output().collect()}
    assert "a:8" in out and "b:7" in out

    # restart with the same checkpoint: ValueState recovers, totals
    # CONTINUE (the reference's recover_log contract, worker.py:327-368)
    _write_input(ind, "b2.txt", ["a,2", "b,1"])
    StreamJob(
        spark, ind, outd, ops=ops, stateful=True, value_col="cnt",
        state_store="rocksdb",
    ).run_to_completion()
    out = {r.value for r in job.read_output().collect()}
    assert "a:9" in out and "b:8" in out

    # the RocksDB provider actually engaged
    import glob

    assert glob.glob(
        os.path.join(job.checkpoint_dir, "state", "**", "*.zip"),
        recursive=True,
    ) or glob.glob(
        os.path.join(job.checkpoint_dir, "state", "**", "*.changelog"),
        recursive=True,
    ), "no RocksDB snapshot/changelog artifacts in checkpoint"


@needs_tws_runtime
def test_tws_first_seen_dedup_across_batches(spark, tmp_path):
    ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
    _write_input(ind, "b1.txt", ["k1,first", "k1,second", "k2,x"])
    ops = [_split_kv, lambda df: tws_first_seen(df)]
    job = StreamJob(
        spark, ind, outd, ops=ops, stateful=True, state_store="rocksdb"
    )
    job.run_to_completion()
    # a later batch re-sends k1: the 'seen' ValueState suppresses it
    _write_input(ind, "b2.txt", ["k1,third", "k3,y"])
    StreamJob(
        spark, ind, outd, ops=ops, stateful=True, state_store="rocksdb"
    ).run_to_completion()
    out = sorted(r.value for r in job.read_output().collect())
    assert out == ["k1:first", "k2:x", "k3:y"], out


@needs_tws_runtime
def test_tws_first_seen_state_ttl_expires(spark, tmp_path):
    # finite TTL bounds dedup state to the ACTIVE key set: after the
    # TTL elapses (processing time), the same key re-emits.
    # TTL requires TimeMode.ProcessingTime, and under that mode an
    # availableNow drain keeps scheduling state-maintenance batches
    # long past the data (observed: 170+ empty micro-batches), so the
    # operational spelling is a processing-time trigger stopped on
    # quiescence — which is also how a TTL'd dedup runs in production.
    def _run_until(job, want: set[str], deadline_sec: int = 120):
        q = job.start(processing_time="500 milliseconds")
        try:
            t0 = time.time()
            while time.time() - t0 < deadline_sec:
                try:
                    got = {r.value for r in job.read_output().collect()}
                except Exception:  # output dir not created yet
                    got = set()
                if want <= got:
                    return got
                time.sleep(0.5)
            raise TimeoutError(f"never saw {want}, have {got}")
        finally:
            q.stop()

    ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
    ops = [_split_kv, lambda df: tws_first_seen(df, ttl_ms=1500)]

    _write_input(ind, "b1.txt", ["k,alpha"])
    job = StreamJob(
        spark, ind, outd, ops=ops, stateful=True, state_store="rocksdb"
    )
    _run_until(job, {"k:alpha"})
    time.sleep(2.0)  # let the state variable's TTL lapse
    _write_input(ind, "b2.txt", ["k,beta"])
    job2 = StreamJob(
        spark, ind, outd, ops=ops, stateful=True, state_store="rocksdb"
    )
    out = _run_until(job2, {"k:alpha", "k:beta"})
    assert out == {"k:alpha", "k:beta"}, out


@needs_tws_runtime
def test_tws_event_sessions_matches_applyinpandas_tier(spark, tmp_path):
    # identical fixture + expectations as
    # test_stateful_sessions_timeout_strictness: in-batch gap breaks
    # emit immediately; the open tail emits via the EVENT-TIME TIMER
    # only when the watermark strictly passes last+gap
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),  # s1
        (1, "2024-01-01 12:00:00"),              # s2: end 12:30 < wm
        (4, "2024-01-01 22:30:00"),              # end 23:00 == wm: held
        (3, "2024-01-01 23:00:00"),              # anchor; end > wm: held
    ]
    d = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    ).coalesce(1).write.mode("overwrite").parquet(d)

    src = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(d)
        .withWatermark("ts", "0 seconds")
        .select(F.col("user_id").cast("string").alias("key"), "ts")
    )
    sess = tws_event_sessions(src, gap_sec=1800)
    name = f"t{_uuid.uuid4().hex[:8]}"
    with _rocksdb(spark):
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    assert not q.isActive
    got = {
        (r.key, r.start_ms, r.end_ms, r.n_events)
        for r in spark.table(name).collect()
    }
    base = 1704103200000  # 2024-01-01 10:00:00 UTC in epoch ms
    m = 60_000
    assert got == {
        ("1", base, base + 10 * m + 30 * m, 2),       # closed in-batch
        ("1", base + 120 * m, base + 150 * m, 1),     # closed by timer
    }, got


@needs_tws_runtime
def test_tws_sessions_out_of_order_across_batches(spark, tmp_path):
    # same regression fixture as the applyInPandasWithState tier: a
    # later-batch event earlier than the open session's start (above
    # the watermark) must pull start_ms down to min(ts)
    d = tmp_path / "sess_ooo"
    d.mkdir()

    def _write(name, rows):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.to_timestamp("ts").alias("ts")
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        import glob
        import shutil

        src = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.copy(src, str(d / f"{name}.parquet"))

    _write("b1", [(1, "2024-01-01 12:00:00")])
    time.sleep(1.1)  # distinct mtimes → deterministic batch order
    _write("b2", [(1, "2024-01-01 11:50:00"), (9, "2024-01-01 15:00:00")])

    src = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withWatermark("ts", "2 hours")
        .select(F.col("user_id").cast("string").alias("key"), "ts")
    )
    sess = tws_event_sessions(src, gap_sec=1800)
    name = f"t{_uuid.uuid4().hex[:8]}"
    with _rocksdb(spark):
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    assert not q.isActive
    got = {
        (r.key, r.start_ms, r.end_ms, r.n_events)
        for r in spark.table(name).collect()
    }
    m = 60_000
    noon = 1704110400000  # 2024-01-01 12:00:00 UTC epoch ms
    assert got == {("1", noon - 10 * m, noon + 30 * m, 2)}, got


@needs_tws_runtime
def test_tws_sessions_late_event_merges_into_held_session(spark, tmp_path):
    # mirror of test_stateful_sessions_late_event_merges_into_held_session
    # on the transformWithState tier: closed-in-batch blocks are HELD
    # until the watermark passes their end, so an admissible late event
    # merges instead of producing overlapping sessions
    d = tmp_path / "sess_hold"
    d.mkdir()

    def _write(name, rows):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.to_timestamp("ts").alias("ts")
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        import glob
        import shutil

        src = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.copy(src, str(d / f"{name}.parquet"))

    _write("b1", [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")])
    time.sleep(1.1)
    _write("b2", [(1, "2024-01-01 10:20:00"), (9, "2024-01-01 16:00:00")])

    src = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withWatermark("ts", "2 hours")
        .select(F.col("user_id").cast("string").alias("key"), "ts")
    )
    sess = tws_event_sessions(src, gap_sec=1800)
    name = f"t{_uuid.uuid4().hex[:8]}"
    with _rocksdb(spark):
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        (r.key, r.start_ms, r.end_ms, r.n_events)
        for r in spark.table(name).collect()
    }
    m = 60_000
    t10 = 1704103200000
    noon = t10 + 120 * m
    assert got == {
        ("1", t10, t10 + 50 * m, 2),
        ("1", noon, noon + 30 * m, 1),
    }, got


@needs_tws_runtime
def test_tws_timer_flush_emits_only_on_expiry_and_clears(spark, tmp_path):
    """Buffer-and-flush on processing-time timers: nothing emits from
    handleInputRows — output appears only after the per-key timer
    matures — and a flush CLEARS the buffer, so a later arrival flushes
    only its own delta."""
    from stream_processing_spark.streaming.tws import tws_timer_flush_counts

    def _run_until(job, want: set[str], deadline_sec: int = 120):
        q = job.start(processing_time="300 milliseconds")
        try:
            t0 = time.time()
            got: set[str] = set()
            while time.time() - t0 < deadline_sec:
                try:
                    got = {r.value for r in job.read_output().collect()}
                except Exception:  # output dir not created yet
                    got = set()
                if want <= got:
                    return got
                time.sleep(0.3)
            raise TimeoutError(f"never saw {want}, have {got}")
        finally:
            q.stop()

    ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
    ops = [_split_kv, lambda df: tws_timer_flush_counts(df, flush_ms=300)]
    _write_input(ind, "b1.txt", ["a,1"] * 3 + ["b,1"])
    job = StreamJob(
        spark, ind, outd, ops=ops, stateful=True, value_col="flushed",
        state_store="rocksdb",
    )
    got = _run_until(job, {"a:3", "b:1"})
    # emission happened via the timer (the only output path) and the
    # buffer emptied: no partial counts other than the full ones
    assert got == {"a:3", "b:1"}, got

    # a later arrival for a flushed key re-buffers and re-flushes ONLY
    # the delta — state was cleared, not carried
    _write_input(ind, "b2.txt", ["a,1"])
    job2 = StreamJob(
        spark, ind, outd, ops=ops, stateful=True, value_col="flushed",
        state_store="rocksdb",
    )
    got = _run_until(job2, {"a:3", "b:1", "a:1"})
    assert got == {"a:3", "b:1", "a:1"}, got
