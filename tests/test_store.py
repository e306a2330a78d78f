"""Behavioral tests for the dataset store — the three §4.2 invariants
from SURVEY.md plus lifecycle checks mirroring the reference's
fs_test.sh scenarios."""

from __future__ import annotations

import pytest

from stream_processing_spark.store import (
    DatasetExistsError,
    DatasetNotFoundError,
    Store,
)


@pytest.fixture()
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


def test_create_once(store):
    store.create("f1", ["hello", "world"])
    with pytest.raises(DatasetExistsError):
        store.create("f1", ["again"])


def test_per_writer_append_order_survives_merge(store):
    # SURVEY.md §4.2: two sequential appends from one writer appear in
    # order after merge (reference: same client → same replica)
    store.create("f2", ["a1", "a2"], writer="w1")
    store.append("f2", ["b1", "b2"], writer="w1")
    store.append("f2", ["c1"], writer="w1")
    assert store.get_lines("f2") == ["a1", "a2", "b1", "b2", "c1"]
    store.merge("f2")
    assert store.get_lines("f2") == ["a1", "a2", "b1", "b2", "c1"]


def test_merge_invariance_multiset(store):
    # merge (compaction) must not change query results
    store.create("f3", [f"x{i}" for i in range(100)])
    store.append("f3", [f"y{i}" for i in range(50)])
    before = sorted(store.get_lines("f3"))
    parts_before = len(store.ls("f3")["parts"])
    store.merge("f3")
    assert sorted(store.get_lines("f3")) == before
    assert len(store.ls("f3")["parts"]) == 1 < parts_before


def test_multiappend_concurrent(store):
    store.create("f4")
    store.multiappend(
        "f4", {f"w{i}": [f"w{i}-line{j}" for j in range(20)] for i in range(4)}
    )
    lines = store.get_lines("f4")
    assert len(lines) == 80
    # per-writer order holds even under concurrency
    for i in range(4):
        mine = [ln for ln in lines if ln.startswith(f"w{i}-")]
        assert mine == [f"w{i}-line{j}" for j in range(20)]
    store.merge("f4")
    assert len(store.get_lines("f4")) == 80


def test_versioned_get_caching(store):
    store.create("f5", ["v0"])
    v1 = store.version("f5")
    df_a = store.get("f5")
    df_b = store.get("f5")
    assert df_a is df_b  # unchanged version ⇒ cached object
    store.append("f5", ["v1"])
    assert store.version("f5") > v1
    df_c = store.get("f5")
    assert df_c is not df_a


def test_ls_store_delete(store):
    store.create("d1", ["x"])
    store.create("d2", ["y"])
    assert store.datasets() == ["d1", "d2"]
    info = store.ls("d1")
    assert info["version"] >= 1 and info["parts"] and info["bytes"] > 0
    store.delete("d1")
    assert store.datasets() == ["d2"]
    with pytest.raises(DatasetNotFoundError):
        store.ls("d1")


def test_append_df_scale_path(store, spark):
    store.create("big")
    df = spark.range(1000).selectExpr("concat('row-', id) AS value")
    store.append_df("big", df)
    assert store.get("big").count() == 1000
    store.merge("big", target_parts=2)
    assert store.get("big").count() == 1000
    assert len(store.ls("big")["parts"]) == 1  # one merged part dir


def test_merge_concurrent_append_not_lost(store):
    # ADVICE r1: an append landing between merge's snapshot and its
    # directory swap must survive (late parts are moved into the merged
    # dir under the lock, and meta is re-read so wseq never rolls back)
    import threading

    store.create("f6", [f"base{i}" for i in range(20)], writer="w0")

    done = threading.Event()
    errs: list[Exception] = []

    def appender() -> None:
        try:
            for i in range(15):
                store.append("f6", [f"late{i}a", f"late{i}b"], writer="wlate")
                if done.is_set():
                    break
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=appender)
    t.start()
    for _ in range(3):
        store.merge("f6")
    done.set()
    t.join()
    assert not errs
    lines = store.get_lines("f6")
    # every append the writer issued is fully present, in order
    n_late = sum(1 for ln in lines if ln.startswith("late")) // 2
    late = [ln for ln in lines if ln.startswith("late")]
    assert late == [f"late{i}{s}" for i in range(n_late) for s in "ab"]
    assert [ln for ln in lines if ln.startswith("base")] == [
        f"base{i}" for i in range(20)
    ]
    # wseq not rolled back: one more append lands after everything
    store.append("f6", ["tail"], writer="wlate")
    assert store.get_lines("f6")[-1] == "tail"


def test_merge_cleans_stale_tmp_and_trash(store, tmp_path):
    import os

    store.create("f7", ["a", "b"])
    root = store.root
    os.makedirs(os.path.join(root, "f7.__merge_tmp"))
    os.makedirs(os.path.join(root, "f7.__trash"))
    # stale crash leftovers are not datasets
    assert store.datasets() == ["f7"]
    # and do not break the next merge
    store.merge("f7")
    assert store.get_lines("f7") == ["a", "b"]
    assert not os.path.exists(os.path.join(root, "f7.__merge_tmp"))
    assert not os.path.exists(os.path.join(root, "f7.__trash"))


def test_concurrent_merges_serialize(store):
    # two merges of one dataset must not destroy each other's tmp dirs
    import threading

    store.create("f8", [f"m{i}" for i in range(30)])
    store.append("f8", ["extra1", "extra2"])
    errs: list[Exception] = []

    def do_merge() -> None:
        try:
            store.merge("f8")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=do_merge) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    lines = store.get_lines("f8")
    assert lines == [f"m{i}" for i in range(30)] + ["extra1", "extra2"]
