"""Connected components over near-duplicate pairs → dedup clusters.

The training-data use case: near-dup detection (MinHash-LSH / Jaccard /
cosine) yields PAIRS, but dedup policy needs CLUSTERS — if A~B and B~C,
all three are one duplicate group even when A~C was never scored. That
closure is a connected-components problem.

Implementation: iterative min-label propagation (the Pregel/GraphX
pattern, on DataFrames):

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until a fixpoint. Converges in O(diameter) rounds; dup-cluster
diameters are tiny (chains of near-identical docs), so typically 2-4
rounds. Each round is one shuffle-join + one grouped min — all JVM-side.

Scale notes:
- ``localCheckpoint(eager=True)`` every round truncates the lineage —
  without it the plan doubles per iteration and round 10 recompiles a
  2^10-deep DAG.
- The convergence check is a driver-side scalar count per round —
  deliberate: iterative algorithms need a driver loop (same as MLlib);
  the per-round data never leaves the cluster.
- Labels are node ids (bigint) — the shuffle key is fixed-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processing_spark.runtime import materialize


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected input (one row per pair, either orientation);
    isolated nodes are NOT emitted — union the full node set afterwards
    if singletons matter (dedup_connected_components does).

    ``reliable=True`` swaps every per-round ``localCheckpoint`` for a
    reliable ``checkpoint`` to the context checkpoint directory (shared
    storage on a cluster) — executor loss mid-iteration then recovers
    from the checkpoint instead of killing the query.
    """

    def _cut(df: DataFrame) -> DataFrame:
        return materialize(
            df, eager=True, reliable=reliable, checkpoint_dir=checkpoint_dir
        )

    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = _cut(
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    )

    labels = _cut(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the previous label through the checkpoint so the
        # convergence check is a filter over the already-materialized
        # RDD — no new-vs-old JOIN (and its shuffle) per round
        delta = _cut(
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
            )
        )
        changed = (
            delta.filter(F.col("label") < F.col("__old")).limit(1).count()
        )
        labels = delta.select("node", "label")
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))
