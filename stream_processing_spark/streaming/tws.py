"""Arbitrary stateful operators on the transformWithState API (Spark 4).

The reference's stateful contract is a per-key dict inside a long-lived
operator process, rebuilt from a replayed log on recovery
(src/Streaming/framework.py:52-54, src/Streaming/worker.py:327-368).
``streaming/stateful.py`` expresses that contract on
``applyInPandasWithState``; this module expresses the SAME contract on
``transformWithStateInPandas`` — the successor API introduced in Spark
4.0 — because its state model is strictly richer and maps better to
100 TB keyed state:

- **typed state variables** (value/list/map) instead of one tuple row,
  each stored as its own RocksDB column family — no
  serialize-the-whole-dict-per-key write amplification;
- **native TTL** per state variable — expiring keyed state (the thing
  every at-scale dedup/session store needs) is a storage-engine
  property, not hand-rolled timer bookkeeping;
- **first-class timers** (``registerTimer`` / ``handleExpiredTimer``)
  decoupled from state rows, in processing or event time;
- **RocksDB required**: the API only runs on RocksDBStateStoreProvider,
  i.e. keyed state lives on executor-local disk with changelog
  checkpointing — the backend keyed state needs once it outgrows heap.

Each operator here is a drop-in ``DataFrame → DataFrame`` transform,
usable as a ``StreamJob`` op (pass ``state_store="rocksdb"``).

RUNTIME REQUIREMENT: executing these operators needs the python
``protobuf`` runtime (the state-server protocol's gencode is built by
protoc 6.33.0). In containers without a protobuf pip install,
``stream_processing_spark.compat.ensure_protobuf_runtime()`` — called
BEFORE the first SparkSession — can activate a vendored pure-python
runtime (shim + the official one-minor-skew version-check override);
with it, every operator in this module executes end-to-end (verified:
running count across restarts, TTL'd dedup, event-time session
timers, all on RocksDB). Two operational notes from those runs:
TTL forces ``TimeMode.ProcessingTime``, and under that mode an
``availableNow`` drain schedules state-maintenance batches long past
the data — run TTL'd operators on a processing-time trigger.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

COUNT_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("cnt", LongType())]
)


class _RunningCount(StatefulProcessor):
    """Per-key running count in a typed ValueState — the reference's A1
    aggregate (tests/sample2_op2.py:8-17) with state the engine owns."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cnt = handle.getValueState("cnt", "cnt bigint")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        # get() returns None when absent — one state-server round trip
        # per key per batch instead of the exists()+get() pair (each
        # access is a protobuf RPC; r11 profile)
        prev = self._cnt.get()
        cnt = prev[0] if prev is not None else 0
        for b in rows:
            cnt += len(b)
        self._cnt.update((cnt,))
        yield pd.DataFrame({"key": [key[0]], "cnt": [cnt]})

    def close(self) -> None:
        pass


def tws_running_count(df: DataFrame, key_col: str = "key") -> DataFrame:
    """A1 running count via transformWithStateInPandas (update mode).

    Semantics are identical to ``stateful.stateful_running_count``; the
    difference is the state backend contract (typed column-family state
    on RocksDB instead of a row-encoded tuple on the default provider).
    """
    return (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=_RunningCount(),
            outputStructType=COUNT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


FIRST_SEEN_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)


class _FirstSeen(StatefulProcessor):
    """Emit only the first record per key; the 'seen' marker carries an
    optional TTL, so a key silent for longer than the TTL re-emits —
    exactly the bounded-memory dedup contract a 100 TB stream needs
    (unbounded distinct-key state is the classic streaming OOM; TTL
    makes the state size track the ACTIVE key set instead)."""

    def __init__(self, ttl_ms: int | None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        # TTL is declared ON THE STATE VARIABLE — expiry is the store's
        # job (RocksDB compaction-time filtering), not operator logic.
        self._seen = handle.getValueState("seen", "seen tinyint", self._ttl_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        first = None
        for b in rows:
            if len(b) and first is None:
                first = str(b["value"].iloc[0])
        if first is None:  # pragma: no cover - empty group
            return
        self._seen.update((1,))
        yield pd.DataFrame({"key": [key[0]], "value": [first]})

    def close(self) -> None:
        pass


def tws_first_seen(
    df: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Exactly-once-per-key emission (streaming dedup, ST2 analogue)
    with optional state TTL. ``ttl_ms=None`` ⇒ permanent dedup
    (dropDuplicates semantics); a finite TTL bounds state to the active
    key set (dropDuplicatesWithinWatermark analogue in processing time).
    """
    return (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("string").alias("value"),
        )
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=_FirstSeen(ttl_ms),
            outputStructType=FIRST_SEEN_SCHEMA,
            outputMode="update",
            # state-variable TTL is only legal under processing-time
            # mode (StatefulProcessorHandleImpl.validateTTLConfig
            # throws for TimeMode.None) — pick the mode the TTL needs
            timeMode="processingtime" if ttl_ms is not None else "none",
        )
    )


FLUSH_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("flushed", LongType())]
)


class _TimerFlushCounts(StatefulProcessor):
    """Buffer-and-flush on PROCESSING-TIME timers: input rows only
    accumulate a pending count and (re)arm a per-key timer
    ``flush_ms`` ahead; emission happens EXCLUSIVELY in
    ``handleExpiredTimer``, which drains and clears the buffer. The
    micro-batching sink pattern (accumulate cheap, emit on a wall-clock
    cadence) — and the operator whose OUTPUT EXISTING at all proves the
    timer path ran: no expiry, no rows. The per-emission partial counts
    sum to the exact input count per key regardless of how many flushes
    the wall clock produced, which is what makes a query over it
    oracle-able (reference ST5 timer analogue, framework.py:52-54)."""

    def __init__(self, flush_ms: int):
        self._flush_ms = flush_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._pend = handle.getValueState("pend", "pend bigint")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n = 0
        for b in rows:
            n += len(b)
        cur = self._pend.get()[0] if self._pend.exists() else 0
        self._pend.update((cur + n,))
        # one outstanding timer per key: re-arrival pushes the flush out
        # (materialize before deleting — see _EventSessions._settle)
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._flush_ms
        )
        return iter(())  # no emission on input — the timer owns output

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._pend.exists():  # pragma: no cover - stale timer
            return
        n = self._pend.get()[0]
        self._pend.clear()
        if n:
            yield pd.DataFrame({"key": [key[0]], "flushed": [n]})

    def close(self) -> None:
        pass


def tws_timer_flush_counts(
    df: DataFrame, key_col: str = "key", flush_ms: int = 500
) -> DataFrame:
    """Per-key buffered counts flushed by native PROCESSING-TIME timers
    (update mode). Every output row is produced by
    ``handleExpiredTimer``; ``handleInputRows`` never emits. Summing
    ``flushed`` per key over the drained output reproduces the exact
    input count per key, independent of flush cadence."""
    return (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=_TimerFlushCounts(flush_ms),
            outputStructType=FLUSH_SCHEMA,
            outputMode="update",
            timeMode="processingtime",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)


class _EventSessions(StatefulProcessor):
    """Inactivity-gap sessions with EVENT-TIME TIMERS: all pending
    session blocks live in a ListState; a timer armed at the earliest
    pending end fires via ``handleExpiredTimer`` when the watermark
    passes it — the quiet-key emission the reference's operator
    processes could never do. Same interval-block merge AND the same
    append-mode finality rule as stateful.stateful_event_sessions: a
    block emits only once watermark > its end (strictly), because an
    admissible late event with t <= end could still merge into it —
    emitting closed-in-batch blocks eagerly can produce overlapping
    sessions under late data."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._blocks = handle.getListState(
            "blocks", "s bigint, l bigint, n bigint"
        )

    def _emit(self, key: Any, blocks) -> pd.DataFrame:
        gap = self._gap_ms
        return pd.DataFrame(
            {
                "key": [key[0]] * len(blocks),
                "start_ms": [b[0] for b in blocks],
                "end_ms": [b[1] + gap for b in blocks],
                "n_events": [b[2] for b in blocks],
            }
        )

    def _settle(self, blocks, wm):
        """Partition by finality, store the rest, re-arm the timer."""
        gap = self._gap_ms
        ripe = [b for b in blocks if wm > b[1] + gap]
        rest = [b for b in blocks if wm <= b[1] + gap]
        # materialize before deleting: the state-server iterator's
        # behavior under concurrent deletion is unspecified
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        if rest:
            self._blocks.put([tuple(b) for b in rest])
            self._handle.registerTimer(min(b[1] + gap for b in rest))
        else:
            self._blocks.clear()
        return ripe

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        gap = self._gap_ms
        ts: list[int] = []
        for b in rows:
            ts += [int(t.value // 10**6) for t in pd.to_datetime(b["ts"])]
        blocks = [(t, t, 1) for t in sorted(ts)]
        if self._blocks.exists():
            import bisect

            for blk in self._blocks.get():
                bisect.insort(blocks, (blk[0], blk[1], blk[2]))
        if not blocks:  # pragma: no cover - empty group
            return
        merged: list[tuple[int, int, int]] = []
        for s_, e_, c_ in blocks:
            if merged and s_ - merged[-1][1] <= gap:
                ps, pe, pc = merged[-1]
                merged[-1] = (min(ps, s_), max(pe, e_), pc + c_)
            else:
                merged.append((s_, e_, c_))
        ripe = self._settle(merged, timerValues.getCurrentWatermarkInMs())
        if ripe:
            yield self._emit(key, ripe)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._blocks.exists():  # pragma: no cover - stale timer
            return
        blocks = [(b[0], b[1], b[2]) for b in self._blocks.get()]
        ripe = self._settle(blocks, timerValues.getCurrentWatermarkInMs())
        if ripe:
            yield self._emit(key, ripe)

    def close(self) -> None:
        pass


def tws_event_sessions(
    df: DataFrame,
    gap_sec: int,
    ts_col: str = "ts",
    key_col: str = "key",
) -> DataFrame:
    """Event-time sessionization via transformWithStateInPandas with
    native timers. Input must carry a watermark on ``ts_col``."""
    gap_ms = gap_sec * 1000
    return (
        df.select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"))
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=_EventSessions(gap_ms),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="eventtime",
        )
    )
