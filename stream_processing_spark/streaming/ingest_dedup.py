"""Streaming incremental near-dup ingest: a running MinHash-LSH corpus.

The batch flagships cover near-dup detection over a static corpus
(functions/dedup.py) and one day-slice against a static corpus
(llmops.dedup_incremental_new_vs_corpus). This module is the RUNNING
form — the shape a production ingest pipeline actually operates:

  new documents stream in → each micro-batch computes shingle MinHash
  signatures and banded LSH buckets for ITS docs only → candidate
  pairs = (within-batch self-join) ∪ (batch × the accumulated corpus
  bands) → both the pairs and the batch's bands are written
  idempotently → the corpus grows by exactly the batch's bands.

Cost model per batch (the reason this scales): signatures/buckets are
computed ONLY for new docs; the corpus side is an append-only parquet
table joined by (band, sig) — O(new × collisions) work per batch, the
corpus never re-self-joins (same asymmetry as the batch incremental
query, now with the corpus maintained by the stream itself).

Exactly-once under replay: both outputs are partitioned by
``__batch_id`` and written with dynamic partition overwrite (the
sinks.py idempotent pattern), and the corpus side of the cross join
reads only partitions ``__batch_id < current`` — so a replayed batch
neither duplicates pairs nor joins against its own half-written bands.

Discovery invariant (tested): every unordered candidate pair is
emitted in EXACTLY one batch — the batch in which its later member
arrived (same-batch pairs in the self-join branch, cross-batch pairs
in the corpus branch) — and the union over batches equals the batch
``lsh_candidate_pairs`` over the full corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.functions import dedup as dd
from stream_processing_spark.functions.dedup import band_buckets  # noqa: F401
# band_buckets lives in functions/dedup.py (single source of truth for
# the band/sig spelling — lsh_candidate_pairs builds its buckets from
# the same helper, so stream/batch pair parity is by construction)


class StreamingIngestDedup:
    """foreachBatch driver for the running corpus. Outputs under
    ``state_dir``: ``bands/`` (the corpus, partitioned by __batch_id)
    and ``pairs/`` (candidate pairs, partitioned by __batch_id)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        shingle_n: int = 3,
        k: int = 8,
        bands: int = 4,
        rows_per_band: int = 2,
        min_agree: int = 0,
    ):
        self.spark = spark
        self.bands_path = os.path.join(state_dir, "bands")
        self.sigs_path = os.path.join(state_dir, "sigs")
        self.pairs_path = os.path.join(state_dir, "pairs")
        self.shingle_n = shingle_n
        self.k = k
        self.bands = bands
        self.rows_per_band = rows_per_band
        # >= min_agree of k signature positions must match for a pair
        # to be emitted (the batch flagship verifies at 6/8); 0 keeps
        # every candidate, scored
        self.min_agree = min_agree

    def _read_before(self, path: str, batch_id: int) -> DataFrame | None:
        """Rows of all FULLY COMMITTED earlier batches (partition
        pruning keeps a replayed batch from seeing its own leftovers).
        Only a genuinely ABSENT table means "first batch" — any real
        read error must propagate and fail the batch (Spark retries),
        or every cross-batch pair of this batch would be silently and
        permanently lost."""
        if not os.path.isdir(path):
            return None  # first batch: no corpus yet
        c = self.spark.read.parquet(path)
        return c.where(F.col("__batch_id") < batch_id)

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        sh = dd.shingles(
            batch_df.select("doc_id", "text"), n=self.shingle_n
        )
        sigs = dd.minhash_signatures(sh, k=self.k).localCheckpoint(
            eager=True
        )  # bands + verification + persistence
        new_b = band_buckets(
            sigs, bands=self.bands, rows_per_band=self.rows_per_band
        ).localCheckpoint(eager=True)  # feeds 3 branches below

        # within-batch pairs (doc_a < doc_b, like the batch path)
        a = new_b.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        b = new_b.select(F.col("doc_id").alias("doc_b"), "band", "sig")
        within = (
            a.join(b, ["band", "sig"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        corpus = self._read_before(self.bands_path, batch_id)
        if corpus is not None:
            cross = (
                corpus.select(
                    F.col("doc_id").alias("doc_a"), "band", "sig"
                )
                .join(
                    new_b.select(
                        F.col("doc_id").alias("doc_b"), "band", "sig"
                    ),
                    ["band", "sig"],
                )
                .select("doc_a", "doc_b")
            )
            pairs = within.unionByName(cross)
        else:
            pairs = within
        # canonical unordered orientation + distinct across bands
        pairs = (
            pairs.select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .distinct()
        )
        # VERIFY: score each candidate by signature agreement (the
        # batch flagship's estimator). Signatures come from this batch
        # plus the persisted corpus sigs — both sides of every pair are
        # guaranteed present (a pair's members arrived in this batch or
        # an earlier committed one)
        corpus_sigs = self._read_before(self.sigs_path, batch_id)
        if corpus is not None and corpus_sigs is None:
            # bands without sigs = a state dir from an older layout;
            # joining candidates to an incomplete signature table would
            # SILENTLY drop every cross-batch pair (the loss mode
            # _read_before's contract forbids) — refuse instead
            raise RuntimeError(
                f"{self.sigs_path} is missing but {self.bands_path} "
                "exists: this state dir predates signature persistence;"
                " re-ingest into a fresh state_dir"
            )
        if corpus_sigs is not None:
            # doc ids are immutable corpus members: re-ingesting an id
            # would leave stale bands that cannot be retracted from the
            # append-only corpus AND fan out the verification join —
            # refuse loudly (one ids-only semi-join per batch)
            n_dup = (
                sigs.select("doc_id")
                .join(corpus_sigs.select("doc_id"), "doc_id", "left_semi")
                .count()
            )
            if n_dup:
                raise RuntimeError(
                    f"{n_dup} doc_id(s) in this batch were already "
                    "ingested; the running corpus is append-only — "
                    "dedupe ids upstream or use a fresh state_dir"
                )
        all_sigs = (
            sigs if corpus_sigs is None
            else sigs.unionByName(corpus_sigs.drop("__batch_id"))
        )
        sa = all_sigs.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f"h{s}").alias(f"a{s}") for s in range(self.k)],
        )
        sb = all_sigs.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(f"h{s}").alias(f"b{s}") for s in range(self.k)],
        )
        agree = None
        for s_ in range(self.k):
            t = F.when(F.col(f"a{s_}") == F.col(f"b{s_}"), 1).otherwise(0)
            agree = t if agree is None else agree + t
        pairs = (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("n_agree", agree.cast("bigint"))
            .where(F.col("n_agree") >= self.min_agree)
            .withColumn(
                "est_jaccard", F.round(F.col("n_agree") / self.k, 6)
            )
            .select("doc_a", "doc_b", "n_agree", "est_jaccard")
        )
        for df, path in (
            (pairs, self.pairs_path),
            (new_b, self.bands_path),
            (sigs, self.sigs_path),
        ):
            (
                df.withColumn("__batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch_id")
                .parquet(path)
            )

    def writer(self):
        def write(batch_df: DataFrame, batch_id: int) -> None:
            self.apply(batch_df, batch_id)

        return write

    # -- readbacks ----------------------------------------------------
    def corpus_bands(self) -> DataFrame:
        return self.spark.read.parquet(self.bands_path).drop("__batch_id")

    def candidate_pairs(self) -> DataFrame:
        return self.spark.read.parquet(self.pairs_path).drop("__batch_id")
