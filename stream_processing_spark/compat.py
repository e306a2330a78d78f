"""Environment compatibility probes (no installs, no site mutation).

``ensure_protobuf_runtime`` unblocks transformWithState execution in
containers that ship no ``protobuf`` pip package but DO carry a
vendored pure-python protobuf runtime (e.g. the google-cloud-sdk
appengine platform tree). Spark's state-server protocol gencode
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``, protoc 6.33.0)
refuses to import under a runtime older than its own version; protobuf
provides the official escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` for exactly this
one-minor-version skew (the 6.32 runtime executes the 6.33 builder
calls — verified by a serialize/parse roundtrip before we claim
success).

The probe NEVER adds the whole vendored tree to ``sys.path`` (it
carries ``google.appengine``/``google.auth``/top-level modules that
would shadow real packages); it builds a shim directory containing ONLY
``google/protobuf`` as a symlink, so the namespace-package machinery
resolves exactly one package out of the tree.

Call this BEFORE the first SparkSession is created: the env vars must
be in the driver's environment when the JVM launches so python workers
(which run the state-server client during transformWithStateInPandas)
inherit both the path and the version-check override.
"""

from __future__ import annotations

import os
import sys

_VENDORED_CANDIDATES = [
    # pure-python runtime vendored by the cloud SDK's appengine platform
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_SENTINEL = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"


def _purge_stale_protobuf(shim: str) -> dict[str, object]:
    """Drop sys.modules entries that would shadow a freshly-shimmed
    ``google.protobuf`` and return them so a failed candidate can be
    restored exactly.

    Why: a native-but-too-old protobuf install imports fine, fails the
    gencode roundtrip, and stays CACHED in sys.modules — after the shim
    is prepended, ``import google.protobuf`` would still resolve the
    cached stale runtime and the probe would report failure even though
    freshly-launched python workers (no cache) would use the shim.
    Three cache layers matter:

    * ``google.protobuf`` / ``google.protobuf.*`` modules whose import
      origin is outside the shim;
    * Spark's gencode (``pyspark.sql.streaming.proto.*``) — its module
      body binds the runtime's builder at import time, so it pins
      whichever runtime was active when it was first imported;
    * a REGULAR (``__init__.py``-bearing) ``google`` parent package —
      its ``__path__`` is frozen at import and won't include the shim;
      PEP-420 namespace parents recompute and are left alone;
    * cached ``google._upb`` native extension modules — a stale upb
      C runtime pins the old implementation even after the pure-python
      shim is prepended (protobuf's api_implementation prefers upb when
      importable), so the probe would fail safe and the shim would
      never take effect: exactly the configuration the shim targets.
    """
    removed: dict[str, object] = {}
    for name, mod in list(sys.modules.items()):
        if name == "google.protobuf" or name.startswith("google.protobuf."):
            origin = getattr(mod, "__file__", None) or ""
            if origin.startswith(shim + os.sep):
                continue
        elif name == "google":
            if getattr(mod, "__file__", None) is None:
                continue  # namespace package: __path__ recomputes
        elif name != "google._upb" and not name.startswith(
            "google._upb."
        ) and not name.startswith("pyspark.sql.streaming.proto"):
            continue
        removed[name] = sys.modules.pop(name)
    return removed


def _gencode_roundtrips() -> bool:
    """True iff Spark's state-protocol gencode imports AND a message
    survives a serialize/parse roundtrip under the active runtime."""
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as M

        m = M.StateRequest()
        m.version = 2
        m2 = M.StateRequest()
        m2.ParseFromString(m.SerializeToString())
        return m2.version == 2
    except Exception:
        return False


def ensure_protobuf_runtime(shim_root: str | None = None) -> str | None:
    """Make ``google.protobuf`` importable if at all possible.

    Returns "native" (a real protobuf install works), "vendored" (the
    shim + version-check override works, env vars exported for worker
    inheritance), or None (container genuinely can't run the state
    protocol — callers keep their conditional skips).
    """
    try:
        import google.protobuf  # noqa: F401

        if _gencode_roundtrips():
            return "native"
    except ImportError:
        pass

    for root in _VENDORED_CANDIDATES:
        pb = os.path.join(root, "google", "protobuf")
        if not os.path.isdir(pb):
            continue
        shim = shim_root or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".pb_shim",
        )
        link = os.path.join(shim, "google", "protobuf")
        try:
            os.makedirs(os.path.dirname(link), exist_ok=True)
            if not os.path.islink(link):
                try:
                    os.symlink(pb, link)
                except FileExistsError:
                    # two processes bootstrapping simultaneously (e.g.
                    # a gate and a test run launched together) race on
                    # the first-ever symlink creation; the loser must
                    # still export the env vars below, or its JVM
                    # starts without them and transformWithState's
                    # state-server worker can't import google.protobuf
                    if not os.path.islink(link):
                        raise
        except OSError:
            continue
        # env BEFORE import: the gencode validates at import time, and
        # the JVM must inherit both vars for python workers
        prev_sentinel = os.environ.get(_SENTINEL)
        os.environ[_SENTINEL] = "true"
        prev = os.environ.get("PYTHONPATH")
        added_env = shim not in (prev or "").split(os.pathsep)
        if added_env:
            os.environ["PYTHONPATH"] = (
                shim + (os.pathsep + prev if prev else "")
            )
        added_path = shim not in sys.path
        if added_path:
            sys.path.insert(0, shim)
        purged = _purge_stale_protobuf(shim)
        before_probe = set(sys.modules)
        if _gencode_roundtrips():
            # NOTE: the sentinel stays exported on success, and it is
            # process-wide — it silences the version check for ALL
            # protobuf gencode in this interpreter (and in workers that
            # inherit the env), not just Spark's state protocol. That
            # is the cost of the official escape hatch; acceptable here
            # because the only gencode this engine loads is Spark's.
            return "vendored"
        # roll back a failed candidate EXACTLY: only remove what this
        # call added, and never leave PYTHONPATH set-but-empty (an
        # empty entry means cwd on sys.path — a mutation we promised
        # not to make). Drop modules the failed probe imported, then
        # restore the purged originals.
        for name in set(sys.modules) - before_probe:
            sys.modules.pop(name, None)
        sys.modules.update(purged)
        if added_path:
            sys.path.remove(shim)
        if added_env:
            if prev is None:
                os.environ.pop("PYTHONPATH", None)
            else:
                os.environ["PYTHONPATH"] = prev
        if prev_sentinel is None:
            os.environ.pop(_SENTINEL, None)
        else:
            os.environ[_SENTINEL] = prev_sentinel
    return None


def tws_worker_env_ok(spark) -> bool:
    """True iff THIS session's JVM inherited the vendored-shim env, so
    transformWithState's state-server python workers (launched by the
    JVM with the JVM's start-time env, NOT the current os.environ) can
    import google.protobuf.

    A plain mapInPandas worker probe is NOT equivalent: regular python
    workers inherit updated env through the daemon while the TWS
    driver worker is launched with the JVM snapshot, so a session
    built before ensure_protobuf_runtime() passes the probe and still
    crashes mid-stream. Only the JVM's own System.getenv tells the
    truth. Returns True when it can't look (Spark Connect has no
    _jvm): better to attempt the stream than to refuse blindly.
    """
    try:
        getenv = spark._jvm.java.lang.System.getenv
    except Exception:
        return True
    if getenv(_SENTINEL) != "true":
        return False
    pp = getenv("PYTHONPATH") or ""
    return any(
        os.path.isfile(os.path.join(p, "google", "protobuf", "__init__.py"))
        for p in pp.split(os.pathsep)
        if p
    )
