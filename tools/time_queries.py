"""Time individual registry queries with the noop sink (bench-shaped).

Usage: python tools/time_queries.py <runs> <query> [query ...]

Prints every run's wall (not just the min) so warm-up vs steady-state is
visible, using the same session/config/gc discipline as bench.py.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    runs = int(sys.argv[1])
    names = sys.argv[2:]

    from stream_processing_spark.compat import ensure_protobuf_runtime

    ensure_protobuf_runtime()

    from stream_processing_spark.queries import REGISTRY
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    for name in names:
        spec = REGISTRY[name]
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        print(f"{name}: {walls} min={min(walls)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
