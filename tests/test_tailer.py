"""Single-file tail-append bridge: the reference's tail-one-growing-file
operating mode (worker.py:503-511) end-to-end on Structured Streaming —
partial-line holdback, offset persistence across restarts, idempotent
crash-window replay, rotation reset, and a live StreamJob consuming the
spool while the file grows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_processing_spark.streaming import StreamJob
from stream_processing_spark.streaming.tailer import FileTailer


def _append(path: str, data: str) -> None:
    with open(path, "a") as f:
        f.write(data)


def test_partial_lines_held_back(tmp_path):
    src, spool = str(tmp_path / "app.log"), str(tmp_path / "spool")
    _append(src, "l1\nl2\npart")
    t = FileTailer(src, spool)
    assert t.poll_once() == 6  # "l1\nl2\n"
    files = [f for f in os.listdir(spool) if f.startswith("part-")]
    assert files == ["part-0000-0000000000000000.txt"]
    assert open(os.path.join(spool, files[0])).read() == "l1\nl2\n"
    # the partial line ships only once its newline arrives
    assert t.poll_once() == 0
    _append(src, "ial\n")
    assert t.poll_once() == 8  # "partial\n"
    assert (
        open(os.path.join(spool, "part-0000-0000000000000006.txt")).read() == "partial\n"
    )


def test_offset_survives_restart_and_replay_is_idempotent(tmp_path):
    src, spool = str(tmp_path / "app.log"), str(tmp_path / "spool")
    _append(src, "a\nb\n")
    t1 = FileTailer(src, spool)
    t1.poll_once()

    # fresh instance resumes from the persisted offset: nothing re-ships
    t2 = FileTailer(src, spool)
    assert t2.offset == 4
    assert t2.poll_once() == 0

    # crash window: offset file lost AFTER the micro-file rename — the
    # repoll rewrites byte-identical files (same names), no duplication
    os.remove(os.path.join(spool, "_tail_offset"))
    t3 = FileTailer(src, spool)
    assert t3.offset == 0
    t3.poll_once()
    parts = sorted(f for f in os.listdir(spool) if f.startswith("part-"))
    assert parts == ["part-0000-0000000000000000.txt"]
    assert open(os.path.join(spool, parts[0])).read() == "a\nb\n"


def test_rotation_resets_like_tail_F(tmp_path):
    src, spool = str(tmp_path / "app.log"), str(tmp_path / "spool")
    _append(src, "old1\nold2\n")
    t = FileTailer(src, spool)
    t.poll_once()
    os.remove(src)  # rotate
    _append(src, "new\n")
    assert t.poll_once() == 4
    names = sorted(f for f in os.listdir(spool) if f.startswith("part-"))
    # post-rotation content restarts at offset 0 under a NEW epoch, so
    # it cannot collide with the already-consumed epoch-0 offset-0 file
    assert names == [
        "part-0000-0000000000000000.txt",
        "part-0001-0000000000000000.txt",
    ]
    assert open(os.path.join(spool, names[1])).read() == "new\n"


def test_tail_into_streamjob_end_to_end(spark, tmp_path):
    src = str(tmp_path / "app.log")
    spool = str(tmp_path / "spool")
    outd = str(tmp_path / "out")
    _append(src, "alpha\nbeta\n")
    t = FileTailer(src, spool)
    t.poll_once()

    ops = [lambda df: df.select("key", F.upper("value").alias("value"))]
    StreamJob(spark, spool, outd, ops=ops).run_to_completion()
    job = StreamJob(spark, spool, outd, ops=ops)
    got = {r.value.split(":")[-1] for r in job.read_output().collect()}
    assert got == {"ALPHA", "BETA"}

    # the file grows; the tailer ships the delta; a restarted job emits
    # ONLY the delta (file-source offsets + deterministic micro-files)
    _append(src, "gamma\n")
    t.poll_once()
    StreamJob(spark, spool, outd, ops=ops).run_to_completion()
    got = [r.value.split(":")[-1] for r in job.read_output().collect()]
    assert sorted(got) == ["ALPHA", "BETA", "GAMMA"]
