"""Same-session interleaved A/B: rcte ranked checkpoint eager vs lazy.

Usage: python tools/ab_rcte.py [rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.queries.rcte import (
        _CAP_SQL_BATCHED,
        _RANKED_SQL,
    )
    from stream_processing_spark.runtime import materialize
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-rcte")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "rcte_events"
    )

    def run(eager: bool) -> float:
        t0 = time.perf_counter()
        ranked = (
            spark.sql(_RANKED_SQL.format(events="rcte_events"))
            .filter(F.col("rn") <= 20)
        )
        materialize(ranked, eager=eager).createOrReplaceTempView(
            "rcte_ranked"
        )
        df = spark.sql(_CAP_SQL_BATCHED.format(ranked="rcte_ranked"))
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    run(True)  # warm-up, discarded
    eg, lz = [], []
    for _ in range(rounds):
        eg.append(run(True))
        lz.append(run(False))
    print(f"eager: {eg} min={min(eg)}")
    print(f"lazy : {lz} min={min(lz)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
