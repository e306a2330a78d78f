"""Same-session interleaved A/B for the SimHash per-token bit
extraction (r14 session 2):

  old: 15 hex digits each extracted with instr('0123456789abcdef',
       substring(h, d, 1)) — 30 string ops per token — then 60
       CASE-based ±1 sums per doc.
  new: ONE conv(substring(md5, 1, 15), 16, 10) cast to LONG per token
       (bit b of that long IS the old digit-decomposed bit b, by
       construction: digit 14-b//4 shifted b%4 ≡ bit b of the 60-bit
       value), then 60 plain bit sums + one count; the fingerprint bit
       flips when 2·Σbit > n — the identical sign test, since the old
       ±1 sum equals 2·Σbit − n.

md5 itself stays (value-bearing: the DuckDB oracle mirrors it); only
the digit plumbing changes. Fingerprints are asserted equal for every
doc on the first round; timing runs the full dedup_simhash_pairs
pipeline (fp + banding + checkpoint + self-join) through the noop sink.

Usage: python tools/ab_simhash.py [rounds]
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

    import stream_processing_spark.functions.dedup as dd
    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.runtime import rebalance_for_expansion
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-simhash")
    spark.sparkContext.setLogLevel("ERROR")

    def fp_old():
        return dd.simhash60(load_table(spark, sf_dir, "documents"))

    def fp_new():
        df = rebalance_for_expansion(load_table(spark, sf_dir, "documents"))
        tok = df.select(
            F.col("doc_id"),
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        ).select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
            .cast("long")
            .alias("v"),
        )
        bit_sums = [
            F.sum(
                F.shiftright(F.col("v"), b).bitwiseAND(F.lit(1))
            ).alias(f"s{b}")
            for b in range(60)
        ]
        per_doc = tok.groupBy("doc_id").agg(
            *bit_sums, F.count(F.lit(1)).alias("ntok")
        )
        fp = None
        for b in range(60):
            term = F.when(
                2 * F.col(f"s{b}") > F.col("ntok"),
                F.lit(1 << b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            fp = term if fp is None else fp + term
        return per_doc.select(F.col("doc_id"), fp.alias("simhash"))

    ra = sorted(tuple(r) for r in fp_old().collect())
    rb = sorted(tuple(r) for r in fp_new().collect())
    assert ra == rb, f"fingerprints differ: {len(ra)} vs {len(rb)} rows"
    print(f"fingerprints identical over {len(ra)} docs")

    def t(fp_build):
        gc.collect()
        t0 = time.monotonic()
        dd.simhash_pairs(fp_build(), max_hamming=3, fp_bits=60).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.monotonic() - t0

    olds, news = [], []
    for i in range(rounds):
        olds.append(t(fp_old))
        news.append(t(fp_new))
        print(f"round {i}: old={olds[-1]:.2f}s new={news[-1]:.2f}s")
    print("old:", [round(x, 2) for x in olds])
    print("new:", [round(x, 2) for x in news])
    print("new wins", sum(n < o for o, n in zip(olds, news)), "/", rounds)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
