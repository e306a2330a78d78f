"""Same-session interleaved A/B for corpus_js_divergence_sources:
totals eagerly checkpointed (r13 shape) vs totals recomputed from the
hist checkpoint (r14 shape). The hist checkpoint is common to both.

Usage: python tools/ab_jsdiv.py [rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir, checkpoint_totals: bool):
    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    hist = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    totals = hist.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    if checkpoint_totals:
        totals = totals.localCheckpoint(eager=True)
    pairs = (
        totals.alias("a")
        .join(totals.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
    )
    cand = (
        hist.join(F.broadcast(pairs), hist["source"] == pairs["s1"])
        .select("s1", "s2", "tok")
        .union(
            hist.join(F.broadcast(pairs), hist["source"] == pairs["s2"])
            .select("s1", "s2", "tok")
        )
        .distinct()
    )
    h1 = hist.select(
        F.col("source").alias("s1"), "tok", F.col("cnt").alias("ca")
    )
    h2 = hist.select(
        F.col("source").alias("s2"), "tok", F.col("cnt").alias("cb")
    )
    t1 = totals.select(
        F.col("source").alias("s1"), F.col("total").alias("na")
    )
    t2 = totals.select(
        F.col("source").alias("s2"), F.col("total").alias("nb")
    )
    joined = (
        cand.join(h1, ["s1", "tok"], "left")
        .join(h2, ["s2", "tok"], "left")
        .join(F.broadcast(t1), "s1")
        .join(F.broadcast(t2), "s2")
        .select(
            "s1",
            "s2",
            "tok",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
            "na",
            "nb",
        )
    )
    p = F.col("ca").cast("double") / F.col("na")
    q = F.col("cb").cast("double") / F.col("nb")
    m = (p + q) / 2
    dec0 = F.lit(0).cast("decimal(18,9)")
    terms = joined.select(
        "s1",
        "s2",
        "na",
        "nb",
        F.when(
            F.col("ca") > 0, F.round(p * F.log(p / m), 9).cast("decimal(18,9)")
        ).otherwise(dec0).alias("tp"),
        F.when(
            F.col("cb") > 0, F.round(q * F.log(q / m), 9).cast("decimal(18,9)")
        ).otherwise(dec0).alias("tq"),
    )
    return terms.groupBy("s1", "s2").agg(
        F.max("na").cast("bigint").alias("n_tokens_a"),
        F.max("nb").cast("bigint").alias("n_tokens_b"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_union"),
        ((F.sum("tp") + F.sum("tq")).cast("double") / 2).alias("jsd_nats"),
    )


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-jsdiv")
    spark.sparkContext.setLogLevel("ERROR")

    def run(flag: bool) -> float:
        t0 = time.perf_counter()
        build(spark, sf_dir, flag).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    run(True)  # warm-up, discarded
    ck, nk = [], []
    for _ in range(rounds):
        ck.append(run(True))
        nk.append(run(False))
    print(f"totals-checkpointed: {ck} min={min(ck)}")
    print(f"totals-recomputed  : {nk} min={min(nk)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
