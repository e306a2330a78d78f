"""Capture .explain("formatted") for bench headliners into plans/r14/.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt for each named query (default: every
bench.py headliner). Uses the same session shape as bench.py so the plans
match what the bench actually runs. Queries whose DataFrame construction
itself executes jobs (streaming drains, iterative drivers) still produce
the FINAL returned frame's plan — that is what the noop sink times.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    suffix = sys.argv[1]
    from stream_processing_spark.compat import ensure_protobuf_runtime

    ensure_protobuf_runtime()

    from stream_processing_spark.queries import REGISTRY
    from stream_processing_spark.session import get_spark

    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.BENCH_QUERIES)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record, keep going
            text = f"EXPLAIN FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(name, "ok", len(text))
    return 0


if __name__ == "__main__":
    sys.exit(main())
