"""Exactly-once streaming SCD2 (type-2 dimension) history table.

``UpsertTable`` maintains the LATEST state per key; this table
maintains the full Kimball type-2 VERSION HISTORY — one row per value
change per key, carrying a ``[__vf, __vt)`` validity interval (micros),
a dense ``version`` number, and an open (``__vt IS NULL``) current
version per key. It reuses UpsertTable's storage machinery unchanged —
hash-bucketed parquet leaves shared across versioned JSON manifests,
O(touched buckets) per-batch I/O, atomic pointer flip, the same
exactly-once replay policy, vacuum — and replaces only the merge:

- a micro-batch's changes are ordered per key by (ts, seq);
- changes at or before the stored OPEN version's (ts, seq) are ignored
  (out-of-order CDC guard — history is append-only in event time);
- consecutive null-safe-EQUAL values open no version (the collapse is
  computed over the stored open value ++ the batch's changes via one
  lag window, so a batch whose first change repeats the current value
  is a no-op for that key);
- each surviving change point closes the previous version (sets its
  ``__vt``) and opens a new one; version numbers continue densely from
  the stored maximum (the open version is always the maximum).

The batch twin is ``queries/analytics_queries.scd2_user_value_history``
— draining a time-ordered CDC stream through this sink yields exactly
the batch operator's output, which is what the registry oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stream_processing_spark.streaming.upsert import UpsertTable


class Scd2Table(UpsertTable):
    """Change-row contract: ``key_col``, ``ts`` + ``seq`` (bigint event
    time + unique-per-key tie-break), and ``value_col`` — the tracked
    attribute. Stored rows: (key, value, version, __vf, __vt, __seq)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        value_col: str,
        **kw,
    ):
        super().__init__(spark, path, key_col, **kw)
        self.value_col = value_col

    # -- reads ---------------------------------------------------------
    def current(self) -> DataFrame | None:
        """Open (live) version per key."""
        raw = self._raw()
        if raw is None:
            return None
        return raw.where(F.col("__vt").isNull())

    def history(self) -> DataFrame | None:
        """Every version with its validity interval + is_current."""
        raw = self._raw()
        if raw is None:
            return None
        return raw.select(
            "*",
            F.when(F.col("__vt").isNull(), 1).otherwise(0).alias(
                "is_current"
            ),
        )

    # -- the merge ------------------------------------------------------
    def apply(self, changes: DataFrame, batch_id: int) -> None:
        from stream_processing_spark.runtime import materialize

        applied = self.version()
        if self._should_skip(batch_id, applied):
            return
        K, V = self.key_col, self.value_col
        b = changes.select(
            K,
            F.col("ts").cast("long").alias("ts"),
            F.col("seq").cast("long").alias("seq"),
            V,
        )
        prev = self._load_manifest(applied) if applied >= 0 else {}
        touched = sorted(
            r[0]
            for r in b.select(self._bucket_expr().alias("b"))
            .distinct()
            .collect()
        )
        cur_leaves = [prev[bk] for bk in touched if bk in prev]
        cur = self._read_leaves(cur_leaves) if cur_leaves else None

        if cur is not None:
            # A touched bucket holds ~1/num_buckets of ALL the table's
            # keys, so the raw OPEN set is bucket-sized — never
            # broadcastable at scale. The batch's key set IS the small
            # side: semi-join opens down to it first, after which every
            # opens-derived frame below is batch-key-bounded (same size
            # class as the `firsts` broadcasts) and safe to broadcast.
            # Open rows for untouched keys carry no information here:
            # `virtual` rows (__flag=0) only feed the lag of batch rows,
            # and the 156-join probes only batch-key changepoints.
            bkeys = b.select(K).distinct()
            opens = (
                cur.where(F.col("__vt").isNull())
                .join(F.broadcast(bkeys), K, "leftsemi")
                .select(
                    K,
                    F.col(V).alias("__oval"),
                    F.col("version").alias("__over"),
                    F.col("__vf").alias("__ots"),
                    F.col("__seq").alias("__oseq"),
                )
            )
            # out-of-order guard: only changes strictly newer than the
            # stored open version participate
            bj = b.join(
                F.broadcast(opens.select(K, "__ots", "__oseq")), K, "left"
            )
            fresh = bj.where(
                F.col("__ots").isNull()
                | (F.col("ts") > F.col("__ots"))
                | (
                    (F.col("ts") == F.col("__ots"))
                    & (F.col("seq") > F.col("__oseq"))
                )
            ).select(K, "ts", "seq", V)
            virtual = opens.select(
                K,
                F.col("__ots").alias("ts"),
                F.col("__oseq").alias("seq"),
                F.col("__oval").alias(V),
            ).withColumn("__flag", F.lit(0))
            u = fresh.withColumn("__flag", F.lit(1)).unionByName(virtual)
        else:
            opens = None
            u = b.withColumn("__flag", F.lit(1))

        # consecutive-duplicate collapse over (stored open ++ batch):
        # one lag pass suffices — row_i survives iff its value differs
        # (null-safe) from row_{i-1}'s, and equality is transitive
        lw = Window.partitionBy(K).orderBy("ts", "seq")
        changepts = materialize(
            u.select(
                K,
                "ts",
                "seq",
                V,
                "__flag",
                F.lag(V).over(lw).alias("__pv"),
                F.lag("__flag").over(lw).alias("__pf"),
            )
            .where(
                (F.col("__flag") == 1)
                & (
                    F.col("__pf").isNull()
                    | ~F.col(V).eqNullSafe(F.col("__pv"))
                )
            )
            .select(K, "ts", "seq", V),
            eager=False,
        )
        vw = Window.partitionBy(K).orderBy("ts", "seq")
        base = (
            changepts.join(
                F.broadcast(opens.select(K, "__over")), K, "left"
            )
            if opens is not None
            else changepts.withColumn(
                "__over", F.lit(None).cast("bigint")
            )
        )
        newv = base.select(
            K,
            F.col(V),
            (F.coalesce("__over", F.lit(0)) + F.row_number().over(vw))
            .cast("bigint")
            .alias("version"),
            F.col("ts").alias("__vf"),
            F.lead("ts").over(vw).alias("__vt"),
            F.col("seq").alias("__seq"),
        )
        cols = [K, V, "version", "__vf", "__vt", "__seq"]
        if cur is not None:
            firsts = changepts.groupBy(K).agg(
                F.min(F.struct("ts", "seq")).alias("__f")
            )
            # stored rows survive untouched unless they are the OPEN
            # version of a key that just changed — that one closes
            kept_cur = (
                cur.join(
                    F.broadcast(firsts.select(K).withColumn(
                        "__ch", F.lit(1)
                    )),
                    K,
                    "left",
                )
                .where(
                    ~(F.col("__ch").isNotNull() & F.col("__vt").isNull())
                )
                .select(*cols)
            )
            closed = (
                cur.where(F.col("__vt").isNull())
                .join(
                    F.broadcast(
                        firsts.select(K, F.col("__f.ts").alias("__cts"))
                    ),
                    K,
                )
                .select(
                    K,
                    F.col(V),
                    "version",
                    "__vf",
                    F.col("__cts").alias("__vt"),
                    "__seq",
                )
            )
            merged = (
                kept_cur.unionByName(closed)
                .unionByName(newv.select(*cols))
            )
        else:
            merged = newv.select(*cols)
        self._commit(merged, batch_id, prev, touched)
