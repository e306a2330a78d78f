"""Same-session interleaved A/B harness for graph_label_propagation.

Two experiments were run with it (r14):

1. Edge construction — per-order collect_set + in-array u<v pair
   generation (one fewer corpus exchange, no self-join) vs the shipped
   distinct + self-join. The per-order build LOST: old [7.99, 7.77,
   6.18] vs new [9.48, 10.44, 8.92] — the ObjectHashAggregate
   collect_set buffer costs more than the SMJ self-join at local
   scale. Not landed (the _PAIRS expression is kept below for the
   record).

2. Round-0 labels checkpoint — round 0 uses the min-neighbor shortcut
   whose winner never reads labels, so the identity labels frame feeds
   only one branch and its eager checkpoint is a pure barrier job.
   Skipping it WON every interleaved pair: old [13.11, 7.34, 8.14] vs
   new [9.10, 6.70, 7.25]. Landed in mlfeat.py (current shape: this
   tool's old() keeps the r13 spelling for comparison).

Results asserted equal before timing.

Usage: python tools/ab_lpa.py [rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PAIRS = (
    "flatten(transform(ps, x -> "
    "transform(filter(ps, y -> y > x), y -> struct(x AS u, y AS v))))"
)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.queries.mlfeat import _LPA_ITERS
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-lpa")
    spark.sparkContext.setLogLevel("ERROR")

    def lpa(edges, labels, skip_r0_ckpt=False):
        for i in range(_LPA_ITERS):
            if i or not skip_r0_ckpt:
                labels = labels.localCheckpoint(eager=True)
            if i == 0:
                winner = edges.groupBy(F.col("v").alias("part_id")).agg(
                    F.min("u").alias("w_lbl")
                )
            else:
                votes = (
                    edges.join(labels, edges.u == labels.part_id)
                    .select(F.col("v").alias("part_id"), "lbl")
                    .groupBy("part_id", "lbl")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                )
                winner = (
                    votes.groupBy("part_id")
                    .agg(
                        F.max(
                            F.struct(
                                F.col("cnt").alias("c"),
                                (-F.col("lbl")).alias("nl"),
                            )
                        ).alias("w")
                    )
                    .select("part_id", (-F.col("w.nl")).alias("w_lbl"))
                )
            labels = labels.join(winner, "part_id", "left").select(
                "part_id", F.coalesce("w_lbl", "lbl").alias("lbl")
            )
        return labels.select("part_id", F.col("lbl").alias("community"))

    def build_old():
        li = load_table(spark, sf_dir, "lineitem")
        op = (
            li.select("l_orderkey", "l_partkey")
            .distinct()
            .localCheckpoint(eager=True)
        )
        a, b = op.alias("a"), op.alias("b")
        half = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = half.unionByName(
            half.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        labels = op.select(
            F.col("l_partkey").alias("part_id"),
            F.col("l_partkey").alias("lbl"),
        ).distinct()
        return lpa(edges, labels)

    def build_new():
        li = load_table(spark, sf_dir, "lineitem")
        op = (
            li.select("l_orderkey", "l_partkey")
            .distinct()
            .localCheckpoint(eager=True)
        )
        a, b = op.alias("a"), op.alias("b")
        half = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = half.unionByName(
            half.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        labels = op.select(
            F.col("l_partkey").alias("part_id"),
            F.col("l_partkey").alias("lbl"),
        ).distinct()
        return lpa(edges, labels, skip_r0_ckpt=True)

    def run(builder) -> float:
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    o = sorted(map(tuple, build_old().collect()))
    n = sorted(map(tuple, build_new().collect()))
    assert o == n, (len(o), len(n), o[:3], n[:3])
    print("results identical:", len(o), "rows")

    old, new = [], []
    for _ in range(rounds):
        old.append(run(build_old))
        new.append(run(build_new))
    print(f"old(self-join): {old} min={min(old)}")
    print(f"new(no-r0ckpt): {new} min={min(new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
