"""Streaming SCD2 history table (streaming/scd2.py): cross-batch
interval stitching, duplicate collapse across batch boundaries,
out-of-order guards, exactly-once under replay and injected crashes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_processing_spark.streaming.scd2 import Scd2Table


def _apply_batches(spark, t, batches):
    schema = "uid long, ts long, seq long, value double"
    for i, rows in enumerate(batches):
        t.apply(spark.createDataFrame(rows, schema), i)


def _history(t):
    return sorted(
        (r["uid"], r["version"], r["value"], r["__vf"], r["__vt"],
         r["is_current"])
        for r in t.history().collect()
    )


def test_scd2_cross_batch_stitching(spark, tmp_path):
    """Batch 2 must CLOSE batch 1's open versions, continue version
    numbers densely, and collapse a repeat of the open value across
    the batch boundary."""
    t = Scd2Table(spark, str(tmp_path / "t"), key_col="uid",
                  value_col="value")
    _apply_batches(spark, t, [
        # batch 0: uid1 a->b (two versions), uid2 one version
        [(1, 100, 1, 1.0), (1, 200, 2, 2.0), (2, 150, 3, 5.0)],
        # batch 1: uid1 repeats open value (collapse: no-op) then
        # changes; uid2 repeat only (pure no-op); uid3 brand new
        [(1, 300, 4, 2.0), (1, 400, 5, 3.0), (2, 350, 6, 5.0),
         (3, 500, 7, 9.0)],
    ])
    assert _history(t) == [
        (1, 1, 1.0, 100, 200, 0),
        (1, 2, 2.0, 200, 400, 0),   # closed BY BATCH 1's change
        (1, 3, 3.0, 400, None, 1),
        (2, 1, 5.0, 150, None, 1),  # repeat collapsed, stays open
        (3, 1, 9.0, 500, None, 1),
    ]
    cur = {(r["uid"], r["value"]) for r in t.current().collect()}
    assert cur == {(1, 3.0), (2, 5.0), (3, 9.0)}


def test_scd2_in_batch_collapse_and_nulls(spark, tmp_path):
    """Null-safe collapse: null==null collapses, null->value and
    value->null open versions; first-ever change may be null."""
    t = Scd2Table(spark, str(tmp_path / "t"), key_col="uid",
                  value_col="value")
    _apply_batches(spark, t, [
        [(1, 100, 1, None), (1, 200, 2, None), (1, 300, 3, 4.0),
         (1, 400, 4, 4.0), (1, 500, 5, None)],
    ])
    assert _history(t) == [
        (1, 1, None, 100, 300, 0),
        (1, 2, 4.0, 300, 500, 0),
        (1, 3, None, 500, None, 1),
    ]


def test_scd2_out_of_order_changes_ignored(spark, tmp_path):
    """A later batch's change at or before the open version's (ts, seq)
    is dropped (history is append-only in event time)."""
    t = Scd2Table(spark, str(tmp_path / "t"), key_col="uid",
                  value_col="value")
    _apply_batches(spark, t, [
        [(1, 100, 1, 1.0), (1, 300, 2, 2.0)],
        [(1, 250, 3, 7.0),   # older than open (300, 2): ignored
         (1, 300, 2, 7.0),   # equal (ts, seq): ignored
         (1, 400, 4, 7.0)],  # fresh: applies
    ])
    assert _history(t) == [
        (1, 1, 1.0, 100, 300, 0),
        (1, 2, 2.0, 300, 400, 0),
        (1, 3, 7.0, 400, None, 1),
    ]


def test_scd2_replay_skips_applied_batch(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "t"), key_col="uid",
                  value_col="value")
    b0 = [(1, 100, 1, 1.0)]
    b1 = [(1, 200, 2, 2.0)]
    _apply_batches(spark, t, [b0, b1])
    want = _history(t)
    v = t.version()
    # crash-window re-delivery of the LAST batch: must be a no-op
    t.apply(spark.createDataFrame(b1, "uid long, ts long, seq long, "
                                      "value double"), 1)
    assert t.version() == v and _history(t) == want


def test_scd2_untouched_buckets_not_rewritten(spark, tmp_path):
    """A batch touching one key must not rewrite other buckets' leaves
    (the O(touched buckets) contract inherited from UpsertTable)."""
    t = Scd2Table(spark, str(tmp_path / "t"), key_col="uid",
                  value_col="value", num_buckets=8)
    _apply_batches(spark, t, [
        [(k, 100, k, float(k)) for k in range(1, 9)],
        [(1, 200, 100, 42.0)],  # touches uid 1's bucket only
    ])
    m0 = t._load_manifest(0)
    m1 = t._load_manifest(1)
    changed = [b for b in m0 if m1[b] != m0[b]]
    assert len(changed) <= 2  # uid 1's bucket (hash may collide once)
    assert {(r["uid"], r["value"]) for r in t.current().collect()} == (
        {(k, float(k)) for k in range(2, 9)} | {(1, 42.0)}
    )


def test_scd2_crash_loop_matches_uninterrupted(spark, tmp_path):
    """The upsert crash schedule against the SCD2 sink: kills before
    apply, with the pointer rolled back post-apply, and post-apply
    pre-commit — final history equals an uninterrupted run."""
    import pyspark.errors

    rows_by_batch = [
        [(1, 100, 1, 1.0), (2, 100, 2, 5.0)],
        [(1, 200, 3, 2.0), (2, 200, 4, 5.0), (3, 200, 5, 7.0)],
        [(1, 300, 6, 2.0), (3, 300, 7, 8.0)],
    ]

    def stage(d):
        os.makedirs(d, exist_ok=True)
        for i, rows in enumerate(rows_by_batch):
            import glob
            import shutil
            import tempfile
            import time as _time

            tmp = tempfile.mkdtemp()
            spark.createDataFrame(
                rows, "uid long, ts long, seq long, value double"
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            dst = os.path.join(d, f"b{i}.parquet")
            shutil.copy(glob.glob(os.path.join(tmp, "part-*"))[0], dst)
            now = _time.time()
            os.utime(dst, (now - 100 + i * 10, now - 100 + i * 10))

    def drain(ind, ck, writer):
        return (
            spark.readStream.schema(
                "uid long, ts long, seq long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(ind)
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    ref_in = str(tmp_path / "ref_in")
    stage(ref_in)
    ref = Scd2Table(spark, str(tmp_path / "ref_t"), key_col="uid",
                    value_col="value")
    q = drain(ref_in, str(tmp_path / "ref_ck"), ref.writer())
    q.awaitTermination(120)
    want = _history(ref)

    ind = str(tmp_path / "in")
    stage(ind)
    t = Scd2Table(spark, str(tmp_path / "t"), key_col="uid",
                  value_col="value")
    inner = t.writer()
    crash_plan = {0: ["before"], 1: ["rolled_pointer"], 2: ["after"]}

    def crashy(batch_df, batch_id):
        modes = crash_plan.get(batch_id)
        if not modes:
            inner(batch_df, batch_id)
            return
        mode = modes.pop(0)
        if mode == "before":
            raise RuntimeError("injected: before apply")
        prev = open(t._pointer).read() if t.version() >= 0 else None
        inner(batch_df, batch_id)
        if mode == "rolled_pointer":
            with open(t._pointer, "w") as f:
                f.write(prev)
        raise RuntimeError(f"injected: {mode} (pre-commit)")

    ck = str(tmp_path / "ck")
    crashes = 0
    for _ in range(8):
        q = drain(ind, ck, crashy)
        try:
            q.awaitTermination(300)
            assert not q.isActive
            break
        except pyspark.errors.exceptions.captured.StreamingQueryException:
            crashes += 1
    else:  # pragma: no cover
        raise AssertionError("stream never drained")
    assert crashes == 3, crashes
    assert not any(crash_plan.values())
    assert _history(t) == want == [
        (1, 1, 1.0, 100, 200, 0),
        (1, 2, 2.0, 200, None, 1),   # batch-2 repeat collapsed
        (2, 1, 5.0, 100, None, 1),
        (3, 1, 7.0, 200, 300, 0),
        (3, 2, 8.0, 300, None, 1),
    ]


def test_scd2_apply_property_random_time_ordered_splits(spark, tmp_path):
    """Property: for ANY change sequence and ANY time-ordered batch
    partitioning (the stream contract — event time does not rewind
    across micro-batches), the applied history equals a pure-Python
    SCD2 reference over the whole sequence: same change points, dense
    versions, intervals tiling per key, null-safe collapse."""
    import random

    for seed in (0, 7, 42):
      rng = random.Random(seed)
      for case in range(8):
        n_keys = rng.randint(1, 3)
        changes = []
        for seq in range(rng.randint(1, 14)):
            changes.append((
                rng.randint(1, n_keys),
                rng.randint(1, 6) * 100,
                seq,
                rng.choice([1.0, 2.0, 2.0, None]),
            ))
        changes.sort(key=lambda c: (c[1], c[2]))
        ncuts = rng.randint(0, min(3, len(changes) - 1)) \
            if len(changes) > 1 else 0
        cuts = sorted(rng.sample(range(1, len(changes)), ncuts)) \
            if ncuts else []
        batches, prev = [], 0
        for c in cuts + [len(changes)]:
            if c > prev:
                batches.append(changes[prev:c])
                prev = c

        t = Scd2Table(spark, str(tmp_path / f"p{seed}c{case}"),
                      key_col="uid", value_col="value")
        _apply_batches(spark, t, batches)

        # pure-Python reference over the whole ordered sequence
        want = []
        by_key: dict[int, list] = {}
        for uid, ts, seq, v in changes:
            chain = by_key.setdefault(uid, [])
            if not chain or not (
                (chain[-1][2] is None and v is None)
                or (chain[-1][2] == v)
            ):
                chain.append((ts, seq, v))
        for uid, chain in by_key.items():
            for i, (ts, seq, v) in enumerate(chain):
                vt = chain[i + 1][0] if i + 1 < len(chain) else None
                want.append((uid, i + 1, v, ts, vt,
                             1 if vt is None else 0))
        assert _history(t) == sorted(want), (seed, case, changes, cuts)


def test_scd2_merge_never_broadcasts_stored_bucket(spark, tmp_path):
    """Scale-discipline lint for the SCD2 merge plan (r9 verdict item 2):
    a touched bucket holds ~1/num_buckets of ALL the table's keys, so
    the stored OPEN set must never be broadcast raw — it must be
    semi-joined down to the batch's key set first. Mechanically: every
    BroadcastExchange subtree that scans the stored parquet leaves must
    contain the LeftSemi prune; broadcasts of purely batch-derived
    frames (bkeys, firsts) are fine."""
    t = Scd2Table(spark, str(tmp_path / "t"), key_col="uid",
                  value_col="value")
    schema = "uid long, ts long, seq long, value double"
    t.apply(spark.createDataFrame(
        [(1, 100, 1, 1.0), (2, 150, 2, 5.0)], schema), 0)

    captured = []
    orig_commit = Scd2Table._commit

    def spy(self, merged, batch_id, prev, touched):
        # capture the plan STRING here, while the no-AQE conf is
        # still in force — queryExecution() materializes lazily at
        # first access, reading the conf of THAT moment
        captured.append(
            merged._jdf.queryExecution().executedPlan().toString()
        )
        return orig_commit(self, merged, batch_id, prev, touched)

    # the changepts half of the merge (the 'out-of-order guard' join)
    # hides behind a localCheckpoint in the merged plan — wrap
    # materialize to capture ITS pre-checkpoint plan too
    from stream_processing_spark import runtime as rt

    orig_mat = rt.materialize

    def mat_spy(df, *a, **kw):
        captured.append(
            df._jdf.queryExecution().executedPlan().toString()
        )
        return orig_mat(df, *a, **kw)

    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        Scd2Table._commit = spy
        rt.materialize = mat_spy
        t.apply(spark.createDataFrame(
            [(1, 200, 3, 2.0), (3, 250, 4, 9.0)], schema), 1)
    finally:
        Scd2Table._commit = orig_commit
        rt.materialize = orig_mat
        spark.conf.set("spark.sql.adaptive.enabled", aqe)

    assert len(captured) >= 2, "merge path not exercised (cur was None?)"
    lines = [ln for cap in captured for ln in cap.splitlines()]

    def indent(ln: str) -> int:
        for m in ("+- ", ":- "):
            i = ln.find(m)
            if i >= 0:
                return i
        return -1  # root / section header

    def subtree(i: int) -> str:
        d = indent(lines[i])
        out = [lines[i]]
        for ln in lines[i + 1:]:
            if indent(ln) <= d:
                break
            out.append(ln)
        return "\n".join(out)

    assert any("LeftSemi" in cap for cap in captured), (
        "opens must be LeftSemi-pruned to the batch key set:\n"
        + "\n----\n".join(captured)
    )
    leafy = [
        subtree(i)
        for i, ln in enumerate(lines)
        if "BroadcastExchange" in ln
        and "parquet" in subtree(i).lower()
    ]
    assert leafy, "expected at least one broadcast over the pruned opens"
    for sub in leafy:
        assert "LeftSemi" in sub, (
            "bucket-sized stored-side broadcast (no LeftSemi prune):\n"
            + sub
        )
