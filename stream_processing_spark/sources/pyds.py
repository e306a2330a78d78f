"""Pure-Python Spark DataSource for line files: batch splits, tail
stream, key:value stream sink (Spark 4 Python Data Source API).

The reference's source/sink surface is (a) a partitioned line scan
(src/Streaming/worker.py:473-520 — each reader keeps 1/n of lines), (b)
a tail-read unbounded source over ONE growing file
(worker.py:503-511), and (c) a ``key:value``-lines sink flushed in
batches (src/Streaming/leader.py:248-284). ``streaming/job.py`` and
``streaming/tailer.py`` express those on the built-in file source; this
module expresses the same three contracts as a first-class custom
connector on the public Python Data Source API — the extension point
Spark 4 added precisely so sources with semantics the built-ins lack
(here: byte-offset record identity and single-file tailing) plug into
Catalyst/Structured Streaming instead of living outside the engine.

Design notes (100 TB stance):

- **Batch reads split by BYTE RANGE** with first-byte line ownership
  and partial-line discard — the TextInputFormat split rule — so a
  500 GB line file fans out to parallel partitions without any driver
  read. The driver only ever stats and globs.
- **Record identity is (file, byte offset)** — stronger than the
  reference's ``filename:linenumber`` (worker.py:512-517): offsets are
  stable under split-parallel reads, line numbers are not.
- **The stream reader's offsets are byte offsets** snapped to the last
  complete line (partial-line holdback, same as streaming/tailer.py);
  a backlog drains as MANY split partitions in one micro-batch, so
  catch-up after downtime is cluster-parallel, not a serial tail.
- **Filter pushdown**: substring filters (``value.contains(...)``) are
  applied inside the Python scan before rows cross Arrow — the grep
  fast path (G2) under the engine's own pushdown contract.
- **The sink commits per (batchId, partition)** with atomic renames in
  ``commit()``; a replayed batch rewrites the same names, so output is
  idempotent without the reference's dedup dicts (leader.py:241-246).

The append-only contract matches the reference (HyDFS files only ever
grow between merges); truncation/rotation of the tailed file raises —
rotation-tolerant tailing stays with streaming/tailer.py's epoch
scheme.
"""

from __future__ import annotations

import glob as _glob
import os
import uuid as _uuid
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    Filter,
    InputPartition,
    StringContains,
    WriterCommitMessage,
)
from pyspark.sql.types import Row

_SCHEMA = "file string, offset bigint, value string"


@dataclass
class _Split(InputPartition):
    """One byte range of one file; owns lines whose first byte is in
    [start, end)."""

    file: str
    start: int
    end: int


def _iter_lines(path: str, start: int, end: int, needles: list[str]):
    """Yield (offset, line) for lines owned by [start, end), reading
    past ``end`` to finish the last owned line (TextInputFormat rule:
    a line belongs to the split containing its first byte)."""
    with open(path, "rb") as f:
        if start > 0:
            # the line containing byte start-1 belongs upstream; skip
            # its remainder. If start-1 is the previous line's '\n',
            # this consumes exactly that newline and lands on start.
            f.seek(start - 1)
            f.readline()
        while True:
            pos = f.tell()
            if pos >= end:
                break
            raw = f.readline()
            if not raw:
                break
            text = raw[:-1] if raw.endswith(b"\n") else raw
            line = text.decode("utf-8", errors="replace")
            if needles and not all(n in line for n in needles):
                continue
            yield pos, line


def _split_ranges(size: int, split_bytes: int) -> list[tuple[int, int]]:
    if size <= 0:
        return []
    step = max(1, split_bytes)
    return [(s, min(s + step, size)) for s in range(0, size, step)]


_ARROW_BATCH_ROWS = 8192


def _iter_record_batches(path: str, start: int, end: int, needles):
    """Yield pyarrow RecordBatches of (file, offset, value) for the
    lines owned by [start, end). The Python Data Source API accepts
    RecordBatch iterators directly — one Arrow batch per ~8k lines
    crosses the worker boundary as columns, not per-row pickled tuples
    (measured ~5x the rows/s of the tuple path on a 1M-line file)."""
    import pyarrow as pa

    offs: list[int] = []
    vals: list[str] = []
    for pos, line in _iter_lines(path, start, end, needles):
        offs.append(pos)
        vals.append(line)
        if len(offs) >= _ARROW_BATCH_ROWS:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([path] * len(offs), pa.string()),
                    pa.array(offs, pa.int64()),
                    pa.array(vals, pa.string()),
                ],
                names=["file", "offset", "value"],
            )
            offs, vals = [], []
    if offs:
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([path] * len(offs), pa.string()),
                pa.array(offs, pa.int64()),
                pa.array(vals, pa.string()),
            ],
            names=["file", "offset", "value"],
        )


class _LineBatchReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("linetail requires a path")
        self._split_bytes = int(options.get("split_bytes", 32 * 1024 * 1024))
        self._needles: list[str] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Handle substring filters on ``value`` inside the scan (rows
        never cross Arrow); everything else stays with Catalyst."""
        for f in filters:
            if isinstance(f, StringContains) and f.attribute == ("value",):
                self._needles.append(f.value)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(_glob.glob(self._path))
        if not files and os.path.exists(self._path):
            files = [self._path]
        if not files:
            # mirror the stream reader's guard: a typo'd path/glob
            # would otherwise scan an empty split and look healthy
            # while reading nothing
            raise FileNotFoundError(
                f"linetail batch path {self._path!r} matches no files"
            )
        out: list[InputPartition] = []
        for fp in files:
            for s, e in _split_ranges(os.path.getsize(fp), self._split_bytes):
                out.append(_Split(fp, s, e))
        return out or [_Split(self._path, 0, 0)]

    def read(self, partition: _Split) -> Iterator["object"]:
        if partition.end <= partition.start:
            return
        yield from _iter_record_batches(
            partition.file, partition.start, partition.end, self._needles
        )


def _snap_to_line_end(path: str, size: int) -> int:
    """Largest offset <= size that ends a complete line (scans
    backwards in chunks; 0 if no newline yet)."""
    chunk = 64 * 1024
    hi = size
    with open(path, "rb") as f:
        while hi > 0:
            lo = max(0, hi - chunk)
            f.seek(lo)
            buf = f.read(hi - lo)
            cut = buf.rfind(b"\n")
            if cut >= 0:
                return lo + cut + 1
            hi = lo
    return 0


def _next_line_end(path: str, frm: int, upto: int) -> int:
    """Smallest line-end offset > frm, scanning forward; ``upto`` (a
    known line end) if no newline before it."""
    chunk = 64 * 1024
    with open(path, "rb") as f:
        pos = frm
        while pos < upto:
            f.seek(pos)
            buf = f.read(min(chunk, upto - pos))
            if not buf:  # pragma: no cover - concurrent truncate
                break
            i = buf.find(b"\n")
            if i >= 0:
                return pos + i + 1
            pos += len(buf)
    return upto


def _cap_advance(path: str, base: int, cap: int, full: int) -> int:
    """Bound one trigger's offset advance to ~``cap`` bytes past
    ``base``, preserving the complete-lines-only invariant: the largest
    line end within the budget, or — liveness when a single line
    exceeds the budget — exactly the next complete line."""
    candidate = base + cap
    if candidate >= full:
        return full
    bounded = _snap_to_line_end(path, candidate)
    if bounded > base:
        return bounded
    return _next_line_end(path, candidate, full)


class _LineTailStreamReader(DataSourceStreamReader):
    """Tail append-only files; offsets are consumed-prefix byte counts
    (complete lines only), checkpointed by Spark like any other source
    offset — the replayable analogue of the reference's
    seek-to-saved-offset loop (worker.py:503-511).

    Two modes by ``path``:
    - a concrete file → single-file tail (offset dict ``{"offset": n}``);
    - a GLOB → FLEET tail: every matching file is tailed concurrently
      under one query, with per-file offsets (``{"files": {path: n}}``)
      — the reference's actual cluster shape, one growing
      ``machine.{id}.log`` per node (src/LogQuerier/server.py:30),
      as ONE streaming source. Files that appear later match the glob
      and join the fleet from offset 0 (tail -F across a fleet)."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("linetail requires a path")
        # an existing path is a concrete file regardless of what
        # characters its name contains ('[', '?', '*' are legal on
        # POSIX); otherwise glob metachars select fleet mode
        self._multi = not os.path.exists(self._path) and any(
            c in self._path for c in "*?["
        )
        allow_missing = (
            options.get("allow_missing", "false").lower() == "true"
        )
        if not allow_missing:
            # a typo'd path/glob would otherwise tail an empty stream
            # forever, looking healthy while reading nothing;
            # tail -F-style wait-for-creation is available explicitly
            if self._multi and not _glob.glob(self._path):
                raise FileNotFoundError(
                    f"linetail glob {self._path!r} matches no files; "
                    "pass option('allow_missing', 'true') to wait for "
                    "the fleet to appear"
                )
            if not self._multi and not os.path.exists(self._path):
                raise FileNotFoundError(
                    f"linetail source {self._path!r} does not exist; "
                    "pass option('allow_missing', 'true') to wait for "
                    "it to appear"
                )
        self._split_bytes = int(options.get("split_bytes", 32 * 1024 * 1024))
        self._last: dict[str, int] = {}  # per-file monotonicity guard
        # per-trigger backpressure (reference analogue: bounded send
        # queues, worker.py:221): each trigger advances each file's
        # offset by at most this many bytes (snapped to a line end; a
        # single oversized line still advances by that one line).
        # STEADY-STATE bound: the engine calls latestOffset() before
        # the reader can see any start offset (first call precedes
        # initialOffset; restarts never replay it), so the FIRST
        # planned micro-batch after any start/restart admits the whole
        # existing backlog; every subsequent trigger is byte-bounded.
        # Capping the blind first call against base 0 would break
        # restarts (end < checkpointed start trips the shrink guard),
        # so the uncapped first batch is deliberate, not an oversight.
        mbt = options.get("max_bytes_per_trigger")
        self._max_bytes = int(mbt) if mbt is not None else None
        if self._max_bytes is not None and self._max_bytes <= 0:
            raise ValueError("max_bytes_per_trigger must be positive")
        self._base: dict[str, int] = {}  # last planned end per file
        self._primed = False  # True once base offsets are trustworthy

    def _snap(self, path: str) -> int:
        try:
            size = os.path.getsize(path)
        except FileNotFoundError:
            size = 0
        snapped = _snap_to_line_end(path, size) if size else 0
        if snapped < self._last.get(path, 0):
            raise RuntimeError(
                f"{path} shrank ({snapped} < {self._last[path]}): the "
                "linetail source requires append-only files; rotated "
                "logs need the epoch-aware FileTailer bridge "
                "(streaming/tailer.py)"
            )
        self._last[path] = max(self._last.get(path, 0), snapped)
        return snapped

    def initialOffset(self) -> dict:
        self._primed = True  # fresh query: every file's base starts 0
        return {"files": {}} if self._multi else {"offset": 0}

    def _bounded(self, path: str, full: int) -> int:
        if self._max_bytes is None:
            return full
        base = self._base.get(path)
        if base is None:
            if not self._primed:
                return full  # restart: base unknown until partitions()
            base = 0  # file newly joined the fleet: cap from 0
        if full <= base:
            return full
        return _cap_advance(path, base, self._max_bytes, full)

    def latestOffset(self) -> dict:
        if not self._multi:
            end = self._bounded(self._path, self._snap(self._path))
            self._base[self._path] = end
            return {"offset": end}
        ends = {
            f: self._bounded(f, self._snap(f))
            for f in sorted(_glob.glob(self._path))
            if os.path.isfile(f)  # a dir can match the glob
        }
        self._base.update(ends)
        return {"files": ends}

    def _file_splits(self, path: str, s: int, e: int) -> list[_Split]:
        if e < s:
            # a restarted reader has no in-memory guard; the
            # checkpointed start exposes the shrink here instead
            raise RuntimeError(
                f"{path} shrank below the checkpointed offset "
                f"({e} < {s}): the linetail source requires append-only "
                "files; rotated logs need the epoch-aware FileTailer "
                "bridge (streaming/tailer.py)"
            )
        self._last[path] = max(self._last.get(path, 0), e)
        if e == s:
            return []
        # a large catch-up range fans out into parallel splits; the
        # first-byte ownership rule keeps them disjoint and complete
        return [
            _Split(path, s + rs, s + re_)
            for rs, re_ in _split_ranges(e - s, self._split_bytes)
        ]

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if "files" in end:
            prev = start.get("files", {})
            vanished = sorted(set(prev) - set(end["files"]))
            if vanished:
                # a tailed file no longer matches the glob: rotation or
                # deletion. Silently dropping its offset would re-emit a
                # recreated file's bytes under already-used (file,
                # offset) identities — the fleet must fail as loudly as
                # single-file mode does on shrink (start comes from the
                # CHECKPOINT, so this guard survives restarts)
                raise RuntimeError(
                    f"tailed files vanished from the fleet: {vanished}; "
                    "the linetail source requires append-only files — "
                    "rotated logs need the epoch-aware FileTailer "
                    "bridge (streaming/tailer.py)"
                )
            out: list[_Split] = []
            for f, e in end["files"].items():
                out += self._file_splits(f, int(prev.get(f, 0)), int(e))
                # authoritative (checkpoint-fed) base for the byte cap
                self._base[f] = max(self._base.get(f, 0), int(e))
            self._primed = True
            return out or [_Split(self._path, 0, 0)]
        out = self._file_splits(
            self._path, int(start["offset"]), int(end["offset"])
        )
        self._base[self._path] = max(
            self._base.get(self._path, 0), int(end["offset"])
        )
        self._primed = True
        return out or [_Split(self._path, 0, 0)]

    def read(self, partition: _Split) -> Iterator["object"]:
        if partition.end <= partition.start:
            return
        yield from _iter_record_batches(
            partition.file, partition.start, partition.end, []
        )

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _KVCommit(WriterCommitMessage):
    tmp: str
    part: int
    rows: int


class _KVStreamWriter(DataSourceStreamWriter):
    """``key:value`` lines sink (leader.py:272 format). Tasks write to
    temp names under the sink's spool dir; ``commit`` renames to
    batchId-deterministic names, so a replayed micro-batch overwrites
    itself instead of duplicating. Micro-batches never overlap (and a
    sink dir belongs to one query — batch file names would collide
    otherwise), so after commit/abort every file still in the spool
    belongs to a FAILED or speculatively-retried task of that batch —
    both sweeps clear it, so crashed tasks can't leak temp files."""

    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("kvlines sink requires a path")
        # deterministic name: Spark constructs separate writer instances
        # for task-side write() and driver-side commit()/abort(), so the
        # spool location must be a pure function of the sink path
        self._spool = os.path.join(self._dir, ".spool")

    def write(self, iterator: Iterator[Row]) -> _KVCommit:
        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        os.makedirs(self._spool, exist_ok=True)
        tmp = os.path.join(self._spool, f"tmp-{_uuid.uuid4().hex}")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                vals = [str(v) for v in row]
                f.write(":".join(vals) + "\n")
                n += 1
        return _KVCommit(tmp=tmp, part=part, rows=n)

    def _sweep_spool(self) -> None:
        try:
            for fn in os.listdir(self._spool):
                try:
                    os.remove(os.path.join(self._spool, fn))
                except OSError:  # pragma: no cover - concurrent removal
                    pass
            os.rmdir(self._spool)
        except OSError:  # spool never created (no task ran) or racing
            pass

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:  # pragma: no cover - skipped empty task
                continue
            final = os.path.join(
                self._dir, f"batch-{batchId:010d}-{m.part:05d}.txt"
            )
            os.replace(m.tmp, final)  # atomic; replay overwrites
        self._sweep_spool()

    def abort(self, messages, batchId: int) -> None:
        self._sweep_spool()


class LineTailDataSource(DataSource):
    """``spark.read.format("linetail")`` / ``readStream`` /
    ``writeStream.format("linetail")`` after
    ``spark.dataSource.register(LineTailDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "linetail"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _LineBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _LineTailStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _KVStreamWriter(self.options)


def register(spark, enable_filter_pushdown: bool = True) -> None:
    """Register the connector. ``enable_filter_pushdown`` flips the
    session conf ``spark.sql.python.filterPushdown.enabled`` (default
    false in Spark 4.1) — a DELIBERATE session-wide side effect, same
    contract as catalog.load_table's nanosAsLong pinning: batch reads
    of this source fail at plan time without it because the reader
    implements pushFilters. Pass False to leave the session conf
    untouched (streaming-only use needs no pushdown)."""
    if enable_filter_pushdown:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LineTailDataSource)
