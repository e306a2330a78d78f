"""Same-session interleaved A/Bs for the remaining r13 driver
regressions whose code changed that round (VERDICT r13 item 7):

  q18   : r12 semi-join + re-aggregation  vs  r13 carry-the-HAVING-sum
  uenc  : r12 two corpus tokenize passes  vs  r13 (source, w) histogram
          checkpoint feeding the trainer and the accounting

Results asserted equal before timing.

Usage: python tools/ab_misc.py [rounds] [q18|uenc ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    which = set(sys.argv[2:]) or {"q18", "uenc"}

    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.queries import REGISTRY
    from stream_processing_spark.queries._util import dec, dsum
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-misc")
    spark.sparkContext.setLogLevel("ERROR")

    def run(builder) -> float:
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    def ab(name, old_builder, new_builder):
        o = sorted(map(tuple, old_builder().collect()))
        n = sorted(map(tuple, new_builder().collect()))
        assert o == n, (name, len(o), len(n))
        print(f"{name}: results identical ({len(o)} rows)")
        old, new = [], []
        for _ in range(rounds):
            old.append(run(old_builder))
            new.append(run(new_builder))
        print(f"{name} old(r12): {old} min={min(old)}")
        print(f"{name} new(r13): {new} min={min(new)}")

    if "q18" in which:

        def q18_old():
            cust = load_table(spark, sf_dir, "customer")
            orders = load_table(spark, sf_dir, "orders")
            li = load_table(spark, sf_dir, "lineitem")
            big = (
                li.groupBy("l_orderkey")
                .agg(F.sum(dec("l_quantity")).alias("sq"))
                .filter(F.col("sq") > 250)
                .select(F.col("l_orderkey").alias("big_ok"))
            )
            return (
                li.join(big, li.l_orderkey == F.col("big_ok"), "left_semi")
                .join(orders, li.l_orderkey == orders.o_orderkey)
                .join(cust, orders.o_custkey == cust.c_custkey)
                .groupBy(
                    "c_name",
                    "c_custkey",
                    "o_orderkey",
                    "o_orderdate",
                    "o_totalprice",
                )
                .agg(dsum("l_quantity", "total_qty"))
                .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
                .limit(100)
            )

        ab(
            "q18",
            q18_old,
            lambda: REGISTRY["q18_large_volume_customers"].spark(
                spark, sf_dir
            ),
        )

    if "uenc" in which:
        from stream_processing_spark.functions import unigram_lm
        from stream_processing_spark.queries.curation6 import (
            _ULM_MAX_PIECE,
            _ULM_MAX_WORD,
            _ULM_ROUNDS,
        )

        def uenc_old():
            docs = load_table(spark, sf_dir, "documents")
            wmap = unigram_lm.unigram_encode_word_tokens(
                docs,
                rounds=_ULM_ROUNDS,
                max_piece=_ULM_MAX_PIECE,
                max_word=_ULM_MAX_WORD,
            )
            corpus = docs.select(
                "source", F.explode(F.split("text", " ")).alias("w")
            ).filter(
                (F.col("w") != "") & (F.length("w") <= _ULM_MAX_WORD)
            )
            return (
                corpus.join(F.broadcast(wmap), "w")
                .groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("n_words"),
                    F.sum("n_tok").alias("n_tokens"),
                    F.sum(F.length("w").cast("bigint")).alias("n_chars"),
                )
                .orderBy("source")
            )

        ab(
            "uenc",
            uenc_old,
            lambda: REGISTRY["unigram_encode_source_stats"].spark(
                spark, sf_dir
            ),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
