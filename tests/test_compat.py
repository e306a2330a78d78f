"""compat.ensure_protobuf_runtime: idempotence and no-mutation
guarantees (the full execution proof is tests/test_tws.py, which runs
the state-server protocol end-to-end under the activated runtime)."""

from __future__ import annotations

import os

from stream_processing_spark.compat import ensure_protobuf_runtime
from tests.conftest import TWS_RUNTIME


def test_probe_idempotent_and_env_clean():
    again = ensure_protobuf_runtime()
    # Re-probe stays ACTIVATED but may legitimately re-classify: once
    # the vendored shim is live, google.protobuf imports normally and
    # the probe short-circuits to "native". The contract is "a working
    # runtime stays working", not label stability.
    if TWS_RUNTIME is None:
        assert again is None
    else:
        assert again in ("native", "vendored")
        import google.protobuf  # noqa: F401  (still importable)
    # never leaves PYTHONPATH set-but-empty (empty entry = cwd on
    # sys.path — the mutation the rollback contract forbids)
    assert os.environ.get("PYTHONPATH", None) != ""


def test_failed_candidate_rolls_back_exactly(tmp_path, monkeypatch):
    """A candidate whose roundtrip fails must leave sys.path and the
    env exactly as found."""
    import sys

    from stream_processing_spark import compat

    # a fake vendored tree: google/protobuf exists but is empty, so the
    # roundtrip import fails
    fake = tmp_path / "vendor"
    (fake / "google" / "protobuf").mkdir(parents=True)
    monkeypatch.setattr(compat, "_VENDORED_CANDIDATES", [str(fake)])
    # force the native branch to miss: pretend google.protobuf is not
    # importable by making the roundtrip the only gate
    monkeypatch.setattr(compat, "_gencode_roundtrips", lambda: False)
    monkeypatch.delenv("PYTHONPATH", raising=False)
    monkeypatch.delenv(compat._SENTINEL, raising=False)
    path_before = list(sys.path)
    assert compat.ensure_protobuf_runtime(
        shim_root=str(tmp_path / "shim")
    ) is None
    assert sys.path == path_before
    assert "PYTHONPATH" not in os.environ
    assert compat._SENTINEL not in os.environ


def _plant_stale(monkeypatch, tmp_path, shim: str):
    """Put a fake STALE google.protobuf (import origin outside the
    shim) plus a cached Spark gencode module into sys.modules, the way
    a failed native probe leaves them."""
    import sys
    import types

    stale_pb = types.ModuleType("google.protobuf")
    stale_pb.__file__ = str(tmp_path / "stale" / "protobuf" / "__init__.py")
    stale_gen = types.ModuleType("pyspark.sql.streaming.proto.StateMessage_pb2")
    for name, mod in [
        ("google.protobuf", stale_pb),
        ("pyspark.sql.streaming.proto.StateMessage_pb2", stale_gen),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return stale_pb, stale_gen


def test_purge_evicts_stale_runtime_and_frozen_regular_parent(tmp_path):
    """_purge_stale_protobuf drops a cached out-of-shim runtime, the
    cached Spark gencode, and a REGULAR (frozen-__path__) google
    parent, but keeps shim-origin modules and a namespace parent."""
    import sys
    import types

    from stream_processing_spark import compat

    shim = str(tmp_path / "shim")
    saved = {
        k: sys.modules.get(k)
        for k in ("google", "google.protobuf", "google.protobuf.descriptor")
    }
    removed2: dict = {}
    try:
        ns_google = types.ModuleType("google")  # no __file__: namespace
        stale = types.ModuleType("google.protobuf")
        stale.__file__ = str(tmp_path / "site" / "protobuf" / "__init__.py")
        shimmed = types.ModuleType("google.protobuf.descriptor")
        shimmed.__file__ = os.path.join(
            shim, "google", "protobuf", "descriptor.py"
        )
        sys.modules["google"] = ns_google
        sys.modules["google.protobuf"] = stale
        sys.modules["google.protobuf.descriptor"] = shimmed
        removed = compat._purge_stale_protobuf(shim)
        assert "google.protobuf" in removed
        assert removed["google.protobuf"] is stale
        assert "google" not in removed  # namespace parent left alone
        # shim-origin submodule survives the purge
        assert sys.modules["google.protobuf.descriptor"] is shimmed
        # now a regular parent (has __file__): must be evicted too
        sys.modules.update(removed)
        reg_google = types.ModuleType("google")
        reg_google.__file__ = str(tmp_path / "site" / "google" / "__init__.py")
        sys.modules["google"] = reg_google
        removed2 = compat._purge_stale_protobuf(shim)
        assert removed2.get("google") is reg_google
    finally:
        # put back everything the last purge evicted (real shim modules
        # ride along), THEN pin the three keys we overwrote to their
        # pre-test values
        sys.modules.update(removed2)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_failed_candidate_restores_purged_modules(tmp_path, monkeypatch):
    """When the vendored probe fails AFTER evicting a cached stale
    runtime, the stale modules are restored exactly and probe-time
    imports are dropped (the pre-fix bug: the stale cache was never
    evicted at all, so the shim could not take effect)."""
    import sys
    import types

    from stream_processing_spark import compat

    fake = tmp_path / "vendor"
    (fake / "google" / "protobuf").mkdir(parents=True)
    monkeypatch.setattr(compat, "_VENDORED_CANDIDATES", [str(fake)])

    purged_during_probe = {}

    def failing_probe():
        # stale modules must be GONE while the probe runs
        purged_during_probe["pb"] = "google.protobuf" in sys.modules
        purged_during_probe["gen"] = (
            "pyspark.sql.streaming.proto.StateMessage_pb2" in sys.modules
        )
        # simulate the probe importing something fresh, then failing
        sys.modules["google.protobuf._probe_junk"] = types.ModuleType(
            "google.protobuf._probe_junk"
        )
        return False

    calls = iter([lambda: False, failing_probe])
    monkeypatch.setattr(
        compat, "_gencode_roundtrips", lambda: next(calls)()
    )
    monkeypatch.delenv("PYTHONPATH", raising=False)
    monkeypatch.delenv(compat._SENTINEL, raising=False)
    stale_pb, stale_gen = _plant_stale(
        monkeypatch, tmp_path, str(tmp_path / "shim")
    )
    assert compat.ensure_protobuf_runtime(
        shim_root=str(tmp_path / "shim")
    ) is None
    assert purged_during_probe == {"pb": False, "gen": False}
    assert sys.modules["google.protobuf"] is stale_pb
    assert (
        sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"]
        is stale_gen
    )
    assert "google.protobuf._probe_junk" not in sys.modules
