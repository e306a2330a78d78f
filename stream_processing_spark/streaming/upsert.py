"""Exactly-once streaming UPSERT into a versioned keyed table.

``sinks.idempotent_batch_writer`` solves append-shaped output; CDC
output is MERGE-shaped — each micro-batch carries upserts/deletes that
must be applied to the CURRENT table state. The batch core (collapse to
latest-change-per-key, one full-outer join) is
``queries/curation3.cdc_apply_latest_changes``; this module is the
streaming shell around the same merge.

Exactly-once under replay needs more than idempotent content here,
because a replayed batch N must merge against version N-1, not against
its own output. The table is therefore VERSIONED:

- every applied batch writes a complete new snapshot at
  ``<path>/v-<batch_id>`` (parquet, atomic via Spark's commit
  protocol);
- ``<path>/_VERSION`` is a tiny pointer file (``<batch_id>``) moved
  into place with an atomic rename AFTER the snapshot commit;
- ``apply`` SKIPS a re-delivered batch_id == the pointer (Spark's
  crash window re-delivers at most the LAST batch; a crash between
  snapshot write and pointer rename simply rewrites the same
  snapshot), and REFUSES batch ids below the pointer — that shape
  means a fresh checkpoint was pointed at an existing table, where
  silently skipping would discard new data (``allow_full_replay=True``
  opts into deliberate full re-drains);
- deletes persist as TOMBSTONES (``__deleted`` rows keeping their
  (ts, seq)) so stale out-of-order upserts cannot resurrect deleted
  keys.

Full-snapshot-per-batch is the local-parquet spelling; on a lakehouse
table format the same ``apply`` body becomes a transactional MERGE and
the version pointer is the table's own log. The merge itself stays one
shuffle of the change batch + one join against the current snapshot —
no driver-side state (reference analogue: the leader's dedup dict +
HyDFS flush, leader.py:241-284, collapsed into the checkpoint +
pointer)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class UpsertTable:
    """A keyed table materialized as versioned parquet snapshots.

    Change-row contract (the CDC shape of curation3): ``key_col``,
    ``op`` ('upsert' | 'delete'), ``ts`` + ``seq`` ordering columns
    (latest change per key wins; ``seq`` breaks ts ties), and the
    payload columns."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        allow_full_replay: bool = False,
    ):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.allow_full_replay = allow_full_replay
        os.makedirs(path, exist_ok=True)
        self._pointer = os.path.join(path, "_VERSION")

    # -- version bookkeeping ------------------------------------------
    def version(self) -> int:
        """batch_id of the current snapshot, -1 if none applied yet."""
        try:
            with open(self._pointer) as f:
                raw = f.read()
        except FileNotFoundError:
            return -1  # fresh table
        try:
            return int(raw.strip())
        except ValueError:
            # a corrupted/truncated pointer must NOT read as "no
            # table": the next apply would rebuild from one batch and
            # flip the pointer forward, silently discarding all prior
            # state — surface it so the operator can repair the file
            raise RuntimeError(
                f"corrupted version pointer {self._pointer!r} "
                f"(contents {raw!r}); restore it to the newest "
                "committed v-<batch_id> snapshot id"
            ) from None

    def _snapshot_dir(self, batch_id: int) -> str:
        return os.path.join(self.path, f"v-{batch_id:010d}")

    def _raw(self) -> DataFrame | None:
        """Full snapshot INCLUDING tombstones (merge input)."""
        v = self.version()
        if v < 0:
            return None
        return self.spark.read.parquet(self._snapshot_dir(v))

    def current(self) -> DataFrame | None:
        """Live rows of the current snapshot (tombstones filtered)."""
        raw = self._raw()
        if raw is None:
            return None
        return raw.where(~F.col("__deleted"))

    # -- the merge ----------------------------------------------------
    def apply(self, changes: DataFrame, batch_id: int) -> None:
        """Merge one micro-batch of changes; exactly-once under replay.

        Order-aware: each stored row carries the (ts, seq) of the
        change that produced it, and an incoming change only applies if
        STRICTLY newer — a stale cross-batch straggler (or a replayed
        older change) can never overwrite fresher state, the invariant
        a CDC applier must keep once batches can interleave with
        out-of-order capture. Deletes leave TOMBSTONES (the row stays
        with __deleted=true and its (ts, seq)): without them, a stale
        upsert arriving after the delete would see no stored row and
        resurrect the key — caught by the multi-seed property test.
        Tombstones persist; compacting them after a retention window is
        a vacuum-level policy deliberately out of scope here."""
        applied = self.version()
        if batch_id == applied:
            return  # Spark's crash window re-delivers the LAST batch
        if batch_id < applied:
            # a batch id far below the pointer is NOT normal re-delivery
            # — it means a fresh checkpoint (new query numbering from 0)
            # was pointed at an existing table; silently skipping would
            # discard genuinely new change data (the Delta txn pattern
            # keys idempotence on (appId, batchId) for this reason)
            if not self.allow_full_replay:
                raise RuntimeError(
                    f"batch {batch_id} is below the applied version "
                    f"{applied}: this table was built by another query/"
                    "checkpoint. Re-point the new query at a fresh "
                    "table path, or pass allow_full_replay=True if you "
                    "are deliberately re-draining the SAME source into "
                    "the same table (e.g. after wiping the commit log)."
                )
            return
        w = Window.partitionBy(self.key_col).orderBy(
            F.desc("ts"), F.desc("seq")
        )
        latest = (
            changes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        cur = self._raw()
        if cur is None:
            merged = (
                latest.withColumn("__deleted", F.col("op") == "delete")
                .drop("op")
                .withColumnRenamed("ts", "__ts")
                .withColumnRenamed("seq", "__seq")
            )
        else:
            payload = [
                c
                for c in cur.columns
                if c not in (self.key_col, "__ts", "__seq", "__deleted")
            ]
            ch = latest.select(
                F.col(self.key_col).alias("__k"),
                "op",
                F.col("ts").alias("__cts"),
                F.col("seq").alias("__cseq"),
                *[F.col(c).alias(f"__new_{c}") for c in payload],
            )
            j = cur.join(ch, cur[self.key_col] == ch["__k"], "full_outer")
            # newer ⇔ no stored row/tombstone yet, or change (ts, seq) >
            # stored — tombstones participate, so a stale upsert loses
            # to a fresher delete
            newer = (
                F.col("__ts").isNull()
                | (F.col("__cts") > F.col("__ts"))
                | (
                    (F.col("__cts") == F.col("__ts"))
                    & (F.col("__cseq") > F.col("__seq"))
                )
            )
            take = F.coalesce(newer, F.lit(False))  # op rows only below
            merged = j.select(
                F.coalesce(self.key_col, "__k").alias(self.key_col),
                *[
                    F.when(take & (F.col("op") == "upsert"),
                           F.col(f"__new_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                    for c in payload
                ],
                F.when(take, F.col("__cts"))
                .otherwise(F.col("__ts"))
                .alias("__ts"),
                F.when(take, F.col("__cseq"))
                .otherwise(F.col("__seq"))
                .alias("__seq"),
                F.when(take, F.col("op") == "delete")
                .otherwise(F.coalesce("__deleted", F.lit(False)))
                .alias("__deleted"),
            )
        merged.write.mode("overwrite").parquet(self._snapshot_dir(batch_id))
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._pointer)  # atomic version flip

    def writer(self):
        """foreachBatch callback: ``writeStream.foreachBatch(t.writer())``."""

        def write(batch_df: DataFrame, batch_id: int) -> None:
            self.apply(batch_df, batch_id)

        return write

    # -- retention / time travel --------------------------------------
    def versions(self) -> list[int]:
        """All retained snapshot batch ids, ascending."""
        out = []
        for d in os.listdir(self.path):
            if d.startswith("v-"):
                try:
                    out.append(int(d[2:]))
                except ValueError:  # pragma: no cover - foreign dir
                    pass
        return sorted(out)

    def read_version(self, batch_id: int) -> DataFrame:
        """Time-travel read of a retained snapshot (live rows only)."""
        d = self._snapshot_dir(batch_id)
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"snapshot v-{batch_id} not retained (have "
                f"{self.versions()}); raise vacuum keep_last"
            )
        return self.spark.read.parquet(d).where(~F.col("__deleted"))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (never the
        current one); returns the batch ids removed. Old snapshots are
        pure storage once the pointer moved — retention is a time-travel
        window, not a correctness need."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        cur = self.version()
        drop = [v for v in vs[:-keep_last] if v != cur]
        for v in drop:
            shutil.rmtree(self._snapshot_dir(v))
        return drop
