"""Same-session interleaved A/B for spearman_quantity_price's moment
fold (r14 session 2):

  old: joint ⋈ broadcast(qr) ⋈ pr  → six-moment aggregation — the
       p-join SHUFFLES the joint histogram (corpus-domain frame) a
       second time after the ph marginal aggregation already did.
  new: attach u2 map-side BEFORE the p-marginal aggregation and carry
       w1 = Σ cnt·u2, w2 = Σ cnt·u2² per p through the prefix scan;
       the final fold is then a total aggregation of the p-marginal
       frame alone — the joint histogram is shuffled ONCE (guide
       §2.3/§2.4: fold the q dimension while the p shuffle is already
       being paid; decimal sums regroup exactly, so every output
       double is bit-identical).

Results are asserted equal on the first round.

Usage: python tools/ab_spearman_fold.py [rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.operators.prefixsum import range_prefix_sum
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-spearman-fold")
    spark.sparkContext.setLogLevel("ERROR")

    def joint_and_qr():
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
        qr = range_prefix_sum(qh, "q", {"cumq": "cq"}).select(
            "q",
            (2 * (F.col("cumq") - F.col("cq")) + F.col("cq") + 1).alias("u2"),
        )
        return joint, qr

    def finish(s):
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

    def build_old():
        joint, qr = joint_and_qr()
        ph = joint.groupBy("p").agg(F.sum("cnt").alias("cp"))
        pr = range_prefix_sum(ph, "p", {"cump": "cp"}).select(
            "p",
            (2 * (F.col("cump") - F.col("cp")) + F.col("cp") + 1).alias("v2"),
        )
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
        return finish(s)

    def build_new():
        joint, qr = joint_and_qr()
        cnt38 = F.col("cnt").cast("decimal(38,0)")
        ph = (
            joint.join(F.broadcast(qr), "q")
            .groupBy("p")
            .agg(
                F.sum("cnt").alias("cp"),
                F.sum(cnt38 * F.col("u2")).cast("decimal(38,0)").alias("w1"),
                F.sum(cnt38 * F.col("u2") * F.col("u2"))
                .cast("decimal(38,0)")
                .alias("w2"),
            )
        )
        pr = range_prefix_sum(ph, "p", {"cump": "cp"}).select(
            "p",
            "cp",
            "w1",
            "w2",
            (2 * (F.col("cump") - F.col("cp")) + F.col("cp") + 1).alias("v2"),
        )
        cp38 = F.col("cp").cast("decimal(38,0)")
        s = pr.agg(
            F.sum("cp").cast("bigint").alias("n"),
            F.sum("w1").cast("decimal(38,0)").alias("su"),
            F.sum(cp38 * F.col("v2")).cast("decimal(38,0)").alias("sv"),
            F.sum("w2").cast("decimal(38,0)").alias("suu"),
            F.sum(cp38 * F.col("v2") * F.col("v2"))
            .cast("decimal(38,0)")
            .alias("svv"),
            F.sum(F.col("w1") * F.col("v2"))
            .cast("decimal(38,0)")
            .alias("suv"),
        )
        return finish(s)

    ra = [tuple(r) for r in build_old().collect()]
    rb = [tuple(r) for r in build_new().collect()]
    assert ra == rb, f"results differ:\nold={ra}\nnew={rb}"
    print("results identical:", ra)

    def t(build):
        gc.collect()
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    olds, news = [], []
    for i in range(rounds):
        olds.append(t(build_old))
        news.append(t(build_new))
        print(f"round {i}: old={olds[-1]:.2f}s new={news[-1]:.2f}s")
    print("old:", [round(x, 2) for x in olds])
    print("new:", [round(x, 2) for x in news])
    print("new wins", sum(n < o for o, n in zip(olds, news)), "/", rounds)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
