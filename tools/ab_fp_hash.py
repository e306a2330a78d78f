"""Same-session interleaved A/B for internal span-fingerprint hashing:

  dedup_exact_substring_spans: fp = md5(span) is equality-only (hot
  set + join-back; outputs are counts/positions), so xxhash64 gives
  the same result up to the standard 64-bit collision class while
  cutting the per-token hash cost and shrinking the fingerprint
  column 32-hex -> 8 bytes. Variants: old (md5 + eager checkpoint),
  xh+ckpt (xxhash64, keep the checkpoint), xh+2pass (xxhash64, no
  checkpoint — the fingerprint map streams twice, heaps-style).

  cross_source_span_overlap: same md5 -> xxhash64 swap on the span
  fingerprint feeding the one groupBy (no checkpoint in either shape).

  decontaminate_ngram_overlap: md5 -> xxhash64 on the n-gram key (the
  split rule's md5(text) stays — it is value-bearing and mirrored by
  the oracle). The checkpoint STAYS here: it dedupes the corpus
  DISTINCT shuffle across the train/eval branches (not just a map
  pass), and with 8-byte keys it is ~60% smaller.

Results asserted equal before timing.

Usage: python tools/ab_fp_hash.py [rounds]
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
    from stream_processing_spark.runtime import rebalance_for_expansion
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-fp-hash")
    spark.sparkContext.setLogLevel("ERROR")
    k = 8

    def ess(hash_fn: str, ckpt: bool):
        docs = rebalance_for_expansion(
            load_table(spark, sf_dir, "documents")
        )
        wins_arr = F.expr(
            f"transform(sequence(1, size(t) - {k - 1}), "
            f"i -> struct(i AS s, i + {k - 1} AS e, "
            f"{hash_fn}(concat_ws(' ', slice(t, i, {k}))) AS fp))"
        )
        wins = (
            docs.select("doc_id", F.split("text", " ").alias("t"))
            .where(F.size("t") >= k)
            .select(
                "doc_id",
                F.size("t").cast("bigint").alias("n_tokens"),
                F.explode(wins_arr).alias("w"),
            )
            .select(
                "doc_id",
                "n_tokens",
                F.col("w.s").cast("bigint").alias("s"),
                F.col("w.e").cast("bigint").alias("e"),
                F.col("w.fp").alias("fp"),
            )
        )
        if ckpt:
            wins = wins.localCheckpoint(eager=True)
        hot = (
            wins.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") >= 2)
            .select("fp")
        )
        dup = wins.join(hot, "fp").select("doc_id", "n_tokens", "s", "e")
        w_prev = (
            Window.partitionBy("doc_id")
            .orderBy("s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = (
            Window.partitionBy("doc_id")
            .orderBy("s")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        brk = F.when(
            F.col("prev_e").isNull() | (F.col("s") > F.col("prev_e") + 1),
            1,
        ).otherwise(0)
        islands = (
            dup.withColumn("prev_e", F.max("e").over(w_prev))
            .withColumn("grp", F.sum(brk).over(w_run))
            .groupBy("doc_id", "n_tokens", "grp")
            .agg(
                (F.max("e") - F.min("s") + 1).cast("bigint").alias("len")
            )
        )
        return islands.groupBy("doc_id", "n_tokens").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum("len").cast("bigint").alias("dup_tokens"),
        )

    def xsrc(hash_fn: str):
        w = 8
        docs = rebalance_for_expansion(
            load_table(spark, sf_dir, "documents")
        )
        spans = (
            docs.select("source", F.split(F.col("text"), " ").alias("t"))
            .where(F.size("t") >= w)
            .select(
                "source",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, size(t) - {w}), "
                        f"i -> {hash_fn}(concat_ws(' ', slice(t, i + 1, {w}))))"
                    )
                ).alias("fp"),
            )
        )
        grouped = spans.groupBy("fp").agg(
            F.array_sort(F.collect_set("source")).alias("srcs")
        )
        items = F.expr(
            "concat("
            "flatten(transform(srcs, (x, i) -> "
            "transform(slice(srcs, i + 2, size(srcs)), "
            "y -> struct(x AS source_a, y AS source_b)))), "
            "transform(srcs, x -> "
            "struct(x AS source_a, CAST(NULL AS STRING) AS source_b)))"
        )
        return (
            grouped.select(F.explode(items).alias("p"))
            .groupBy(
                F.col("p.source_a").alias("source_a"),
                F.col("p.source_b").alias("source_b"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def dec(hash_fn: str):
        n = 5
        docs = load_table(spark, sf_dir, "documents")
        docs = docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
        split = F.when(
            F.md5(F.col("text").cast("binary")) < "cc", "train"
        ).otherwise("eval")
        toks = F.split(F.col("text"), " ")
        length = F.size(toks)
        zipped = F.arrays_zip(
            *[F.slice(toks, j + 1, length - (n - 1)) for j in range(n)]
        )
        hf = F.md5 if hash_fn == "md5" else F.xxhash64
        grams = (
            docs.filter(length >= n)
            .select(
                "doc_id", split.alias("split"), F.explode(zipped).alias("__z")
            )
            .select(
                "doc_id",
                "split",
                hf(
                    F.concat_ws(" ", *[f"__z.{j}" for j in range(n)])
                ).alias("g"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        train_grams = (
            grams.filter(F.col("split") == "train").select("g").distinct()
        )
        eval_grams = grams.filter(F.col("split") == "eval").select(
            "doc_id", "g"
        )
        return (
            eval_grams.join(train_grams, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
        )

    def run(builder) -> float:
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    o = sorted(map(tuple, ess("md5", True).collect()))
    assert o == sorted(map(tuple, ess("xxhash64", True).collect()))
    assert o == sorted(map(tuple, ess("xxhash64", False).collect()))
    print("ess results identical:", len(o), "rows")
    keyf = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    xo = sorted(map(tuple, xsrc("md5").collect()), key=keyf)
    assert xo == sorted(
        map(tuple, xsrc("xxhash64").collect()), key=keyf
    )
    print("xsrc results identical:", len(xo), "rows")

    do = sorted(map(tuple, dec("md5").collect()))
    assert do == sorted(map(tuple, dec("xxhash64").collect()))
    print("dec results identical:", len(do), "rows")

    a, b, c, d, e = [], [], [], [], []
    f_, g_ = [], []
    for _ in range(rounds):
        a.append(run(lambda: ess("md5", True)))
        b.append(run(lambda: ess("xxhash64", True)))
        c.append(run(lambda: ess("xxhash64", False)))
        d.append(run(lambda: xsrc("md5")))
        e.append(run(lambda: xsrc("xxhash64")))
        f_.append(run(lambda: dec("md5")))
        g_.append(run(lambda: dec("xxhash64")))
    print(f"ess  md5+ckpt : {a} min={min(a)}")
    print(f"ess  xh +ckpt : {b} min={min(b)}")
    print(f"ess  xh 2pass : {c} min={min(c)}")
    print(f"xsrc md5      : {d} min={min(d)}")
    print(f"xsrc xxhash64 : {e} min={min(e)}")
    print(f"dec  md5      : {f_} min={min(f_)}")
    print(f"dec  xxhash64 : {g_} min={min(g_)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
