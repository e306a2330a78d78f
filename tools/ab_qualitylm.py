"""Same-session interleaved A/B for quality_lm_avg_bigram_prob:

  old (r13): O(corpus) bigram-STRING frame eagerly checkpointed, bg
             count aggregation, first-word window, then a corpus-sized
             join back on the bigram string, doc aggregation
  new (r14): same SHAPE, but bigram/first-word keys travel as 64-bit
             xxhash64 integers (all shuffles narrow to fixed-width
             rows) and the O(corpus) checkpoint is dropped — the
             explode streams twice instead (heaps precedent). The
             LM-build window stays on the vocab-bounded bg-level frame
             so no window partition scales with the corpus. An earlier
             candidate that moved the w1 aggregation onto doc-bearing
             rows (two windows, no join) only split pairs 2/2 AND
             unbounds the hot-first-word window partition at scale —
             rejected. This variant wins every pair:
             old [2.17, 1.96, 2.09, 2.01] vs new [1.49, 1.74, 1.70,
             1.44].

Results asserted equal before timing.

Usage: python tools/ab_qualitylm.py [rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-qualitylm")
    spark.sparkContext.setLogLevel("ERROR")

    def build_old():
        docs = load_table(spark, sf_dir, "documents")
        docs = docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
        toks = F.split(F.col("text"), " ")
        length = F.size(toks)
        zipped = F.arrays_zip(
            F.slice(toks, 1, length - 1), F.slice(toks, 2, length - 1)
        )
        doc_bigrams = (
            docs.filter(length >= 2)
            .select("doc_id", F.explode(zipped).alias("__z"))
            .select(
                "doc_id", F.concat_ws(" ", "__z.0", "__z.1").alias("bg")
            )
        )
        doc_bigrams = doc_bigrams.localCheckpoint(eager=True)
        counted = doc_bigrams.groupBy("bg").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w1 = F.split(F.col("bg"), " ").getItem(0)
        wsum = Window.partitionBy(w1)
        probs = counted.select(
            "bg",
            (
                F.col("cnt").cast("double")
                / F.sum("cnt").over(wsum).cast("double")
            ).alias("p"),
        )
        dec_p = F.round(F.col("p"), 6).cast("decimal(18,6)")
        return (
            doc_bigrams.join(probs, "bg")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                (F.sum(dec_p).cast("double") / F.count(F.lit(1))).alias(
                    "avg_bigram_p"
                ),
            )
        )

    def build_new():
        # variant C: old SHAPE (bg-level window stays vocab-bounded, the
        # prob lookup stays a join) but integer keys everywhere and NO
        # O(corpus) checkpoint — the explode streams twice instead
        # (heaps precedent, r13 verdict item 1)
        docs = load_table(spark, sf_dir, "documents")
        docs = docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
        toks = F.split(F.col("text"), " ")
        length = F.size(toks)
        zipped = F.arrays_zip(
            F.slice(toks, 1, length - 1), F.slice(toks, 2, length - 1)
        )
        db = (
            docs.filter(length >= 2)
            .select("doc_id", F.explode(zipped).alias("__z"))
            .select(
                "doc_id",
                F.xxhash64(
                    F.concat_ws(" ", "__z.0", "__z.1")
                ).alias("bgh"),
                F.xxhash64("__z.0").alias("w1h"),
            )
        )
        counted = db.groupBy("bgh", "w1h").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        wsum = Window.partitionBy("w1h")
        probs = counted.select(
            "bgh",
            (
                F.col("cnt").cast("double")
                / F.sum("cnt").over(wsum).cast("double")
            ).alias("p"),
        )
        dec_p = F.round(F.col("p"), 6).cast("decimal(18,6)")
        return (
            db.join(probs, "bgh")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                (F.sum(dec_p).cast("double") / F.count(F.lit(1))).alias(
                    "avg_bigram_p"
                ),
            )
        )

    def run(builder) -> float:
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    key = lambda r: (r["doc_id"],)  # noqa: E731
    o = sorted(map(tuple, build_old().collect()))
    n = sorted(map(tuple, build_new().collect()))
    assert o == n, (len(o), len(n), o[:2], n[:2])
    print("results identical:", len(o), "rows")

    old, new = [], []
    for _ in range(rounds):
        old.append(run(build_old))
        new.append(run(build_new))
    print(f"old(ckpt+join): {old} min={min(old)}")
    print(f"new(hash-keys): {new} min={min(new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
