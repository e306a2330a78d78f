"""Same-session interleaved A/B for langid_trigram_cosine_mix's
per-doc profile statistics:

  old: JVM trigram explode -> (doc, tri) count shuffle -> broadcast
       profile join -> per-doc fold (two corpus-sized exchanges)
  new: one mapInArrow pass emitting (doc_id, ss, d1..d4) with exact
       integer arithmetic (no corpus shuffle) — the shape shipped in
       stream_processing_spark/queries/curation7.py.

Both variants end with the same language rollup; results are asserted
equal on the first round.

Usage: python tools/ab_langid.py [rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.queries.curation7 import (
        _LANGID3_PROFILES,
        langid_trigram_cosine_mix,
    )
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-langid")
    spark.sparkContext.setLogLevel("ERROR")

    import math as _math

    piv: dict[str, dict[int, int]] = defaultdict(dict)
    langs: dict[int, str] = {}
    for lid, lang, tri, w in _LANGID3_PROFILES:
        piv[tri][lid] = w
        langs[lid] = lang
    lids = sorted(langs)
    pn = {
        lid: _math.sqrt(
            sum(w * w for (l2, _, _, w) in _LANGID3_PROFILES if l2 == lid)
        )
        for lid in lids
    }

    def finish(per_doc):
        cols = {
            lid: F.round(
                F.col(f"d{lid}").cast("double")
                / (F.col("dn") * F.lit(pn[lid])),
                6,
            )
            for lid in lids
        }
        winner_lang = None
        winner_cos = None
        for lid in lids:
            cond = None
            for other in lids:
                if other == lid:
                    continue
                c = cols[lid] >= cols[other]
                cond = c if cond is None else (cond & c)
            winner_lang = (
                F.when(cond, langs[lid])
                if winner_lang is None
                else winner_lang.when(cond, langs[lid])
            )
            winner_cos = (
                F.when(cond, cols[lid])
                if winner_cos is None
                else winner_cos.when(cond, cols[lid])
            )
        assigned = per_doc.filter(
            F.greatest(*[F.col(f"d{lid}") for lid in lids]) > 0
        ).select(winner_lang.alias("lang"), winner_cos.alias("cos_r"))
        return assigned.groupBy(F.col("lang").alias("language")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("cos_r").cast("decimal(9,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cos"),
        )

    def build_old():
        profp = spark.createDataFrame(
            [
                (tri,) + tuple(d.get(lid, 0) for lid in lids)
                for tri, d in sorted(piv.items())
            ],
            "tri string, " + ", ".join(f"w{lid} int" for lid in lids),
        )
        d = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull() & (F.length("text") >= 3))
            .select("doc_id", F.lower("text").alias("t"))
        )
        tf = (
            d.select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias(
                    "i"
                ),
                "t",
            )
            .select(
                "doc_id",
                F.expr("substr(t, CAST(i AS INT), 3)").alias("tri"),
            )
            .groupBy("doc_id", "tri")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        )
        per_doc = (
            tf.join(F.broadcast(profp), "tri", "left")
            .groupBy("doc_id")
            .agg(
                F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias(
                    "dn"
                ),
                *[
                    F.sum(
                        F.coalesce(F.col(f"w{lid}"), F.lit(0)) * F.col("tf")
                    )
                    .cast("bigint")
                    .alias(f"d{lid}")
                    for lid in lids
                ],
            )
        )
        return finish(per_doc)

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 3)

    old_rows = sorted(map(tuple, build_old().collect()))
    new_rows = sorted(
        map(tuple, langid_trigram_cosine_mix(spark, sf_dir).collect())
    )
    assert old_rows == new_rows, (old_rows, new_rows)
    print("results identical:", len(old_rows), "rows")

    old, new = [], []
    for _ in range(rounds):
        old.append(run(build_old()))
        new.append(run(langid_trigram_cosine_mix(spark, sf_dir)))
    print(f"old(jvm-explode): {old} min={min(old)}")
    print(f"new(mapInArrow) : {new} min={min(new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
