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
