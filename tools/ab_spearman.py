"""Same-session interleaved A/B for spearman_quantity_price:

  old (r13): both marginal scans checkpoint their input
             (range_prefix_sum materialize=True) — two serial barrier
             jobs — and the moment join shuffles joint and pr on p
  new (r14): materialize=False (the marginals are cheap aggregations
             OF the already-checkpointed joint histogram, so the scan's
             count probe + window re-aggregate materialized rows
             instead of paying a barrier each) and F.broadcast(pr)
             (the price marginal is bounded by the cents DOMAIN —
             ~10M rows ≈ 160 MB at saturation, far under the broadcast
             cap — and it replaces a two-sided shuffle of the joint)

Results asserted equal before timing.

Usage: python tools/ab_spearman.py [rounds]
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
    from stream_processing_spark.operators.prefixsum import (
        range_prefix_sum,
    )
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-spearman")
    spark.sparkContext.setLogLevel("ERROR")

    def build(mat: bool, bcast: bool):
        li = load_table(spark, sf_dir, "lineitem")
        joint = (
            li.filter(
                F.col("l_quantity").isNotNull()
                & F.col("l_extendedprice").isNotNull()
            )
            .select(
                F.floor(F.col("l_quantity")).cast("bigint").alias("q"),
                F.floor(F.col("l_extendedprice") * 100)
                .cast("bigint")
                .alias("p"),
            )
            .groupBy("q", "p")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
        qh = joint.groupBy("q").agg(F.sum("cnt").alias("cq"))
        qr = range_prefix_sum(
            qh, "q", {"cumq": "cq"}, materialize=mat
        ).select(
            "q",
            (2 * (F.col("cumq") - F.col("cq")) + F.col("cq") + 1).alias(
                "u2"
            ),
        )
        ph = joint.groupBy("p").agg(F.sum("cnt").alias("cp"))
        pr = range_prefix_sum(
            ph, "p", {"cump": "cp"}, materialize=mat
        ).select(
            "p",
            (2 * (F.col("cump") - F.col("cp")) + F.col("cp") + 1).alias(
                "v2"
            ),
        )
        if bcast:
            pr = F.broadcast(pr)
        cnt38 = F.col("cnt").cast("decimal(38,0)")
        s = (
            joint.join(F.broadcast(qr), "q")
            .join(pr, "p")
            .agg(
                F.sum("cnt").cast("bigint").alias("n"),
                F.sum(cnt38 * F.col("u2")).cast("decimal(38,0)").alias("su"),
                F.sum(cnt38 * F.col("v2")).cast("decimal(38,0)").alias("sv"),
                F.sum(cnt38 * F.col("u2") * F.col("u2"))
                .cast("decimal(38,0)")
                .alias("suu"),
                F.sum(cnt38 * F.col("v2") * F.col("v2"))
                .cast("decimal(38,0)")
                .alias("svv"),
                F.sum(cnt38 * F.col("u2") * F.col("v2"))
                .cast("decimal(38,0)")
                .alias("suv"),
            )
        )
        n = F.col("n").cast("double")
        su, sv = F.col("su").cast("double"), F.col("sv").cast("double")
        return s.select(
            F.col("n").alias("n_rows"),
            F.round(
                (n * F.col("suv").cast("double") - su * sv)
                / F.nullif(
                    F.sqrt(
                        (n * F.col("suu").cast("double") - su * su)
                        * (n * F.col("svv").cast("double") - sv * sv)
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("spearman_rho"),
        )

    def run(mat, bcast) -> float:
        t0 = time.perf_counter()
        build(mat, bcast).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    o = build(True, False).collect()
    n = build(True, True).collect()
    assert [tuple(r) for r in o] == [tuple(r) for r in n], (o, n)
    print("results identical:", o)

    old, new = [], []
    for _ in range(rounds):
        old.append(run(True, False))
        new.append(run(True, True))
    print(f"old(ckpt+shuffle): {old} min={min(old)}")
    print(f"new(ckpt+bcast)  : {new} min={min(new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
