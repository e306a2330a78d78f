"""Same-session interleaved A/B for connected_components' round-1
shortcut (r14 session 2):

  old: seed labels = sym.select(a).distinct() (a shuffle), then round 1
       joins sym against the IDENTITY labels before the grouped min.
  new: round 1 = sym.groupBy(a).agg(min(b)) -> least(a, min_b) — the
       identity join and the seed distinct are both gone (bit-identical
       by construction; the same class as LPA's round-0 min-neighbor
       shortcut).

Both variants run the full dedup_connected_components pipeline (jaccard
edges + closure + docs join); results asserted equal on the first round.

Usage: python tools/ab_cc_round1.py [rounds]
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
    from stream_processing_spark.operators import graph
    from stream_processing_spark.queries.llmops import _JACCARD_MAX_DF
    from stream_processing_spark.runtime import materialize
    from stream_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-cc-round1")
    spark.sparkContext.setLogLevel("ERROR")

    def edges():
        docs = load_table(spark, sf_dir, "documents")
        return dd.jaccard_pairs(
            dd.shingles(docs, n=3), threshold=0.8, max_df=_JACCARD_MAX_DF
        ).select("doc_a", "doc_b")

    def cc_old(pairs):
        """r13 shape: seed distinct + identity join in round 1."""

        def _cut(df):
            return materialize(df, eager=True)

        fwd = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        sym = _cut(
            fwd.union(
                fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).distinct()
        )
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
        labels, rounds_, converged = graph._propagate(
            sym, labels, _cut, graph._AUTO_SWITCH_AFTER
        )
        if not converged:
            la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
            lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
            contracted = (
                sym.join(la, "a")
                .join(lb, "b")
                .filter(F.col("la") != F.col("lb"))
                .select(F.col("la").alias("a"), F.col("lb").alias("b"))
                .distinct()
            )
            reps = graph._star_cc(
                contracted, _cut, 50 - rounds_, {}
            ).withColumnRenamed("node", "rep")
            labels = labels.join(reps, labels.label == reps.rep, "left").select(
                "node", F.coalesce("component", "label").alias("label")
            )
        return labels.select("node", F.col("label").alias("component"))

    def q_old():
        docs = load_table(spark, sf_dir, "documents")
        cc = cc_old(edges())
        return (
            docs.select("doc_id")
            .join(cc, docs.doc_id == cc.node, "left")
            .select(
                "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
            )
        )

    def q_new():
        docs = load_table(spark, sf_dir, "documents")
        cc = graph.connected_components(edges(), src="doc_a", dst="doc_b")
        return (
            docs.select("doc_id")
            .join(cc, docs.doc_id == cc.node, "left")
            .select(
                "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
            )
        )

    ra = sorted(map(tuple, q_old().collect()))
    rb = sorted(map(tuple, q_new().collect()))
    assert ra == rb, f"results differ: {len(ra)} vs {len(rb)} rows"
    print(f"results identical over {len(ra)} docs")

    def t(build):
        gc.collect()
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    olds, news = [], []
    for i in range(rounds):
        olds.append(t(q_old))
        news.append(t(q_new))
        print(f"round {i}: old={olds[-1]:.2f}s new={news[-1]:.2f}s")
    print("old:", [round(x, 2) for x in olds])
    print("new:", [round(x, 2) for x in news])
    print("new wins", sum(n < o for o, n in zip(olds, news)), "/", rounds)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
