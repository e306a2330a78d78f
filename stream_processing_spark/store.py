"""Dataset lifecycle surface — the HyDFS parity layer (SURVEY.md §2.1).

The reference implements an append-only, replicated, versioned file store
(create/append/multiappend/merge/get/ls/store — src/FileSystem/
file_system.py, bin/*.py). In a Spark-first build, replication and
durability belong to the storage layer (HDFS/S3), so what remains as
*query semantics* is the dataset lifecycle and its consistency contract:

- **create**      — fails if the dataset exists (C protocol,
                    file_system.py:119-145)
- **append**      — adds content; appends from one writer stay ordered
                    (shared.py:253-296 routes a client to one replica)
- **multiappend** — concurrent appends from many writers
                    (file_system.py:247-253)
- **merge**       — compacts parts; MUST NOT change query results
                    (merge_file file_system.py:286-365 makes replicas
                    byte-identical; our invariant is multiset + per-writer
                    order equality)
- **get**         — versioned read with client-side cache: unchanged
                    version ⇒ no re-read (shared.py:36-81, ≤500 entries)
- **ls / store**  — metadata listing (bin/ls.py, bin/store.py)

Order is carried AS DATA — (writer, wseq, idx) columns — not as file
order: Spark rows have no intrinsic order, so the reference's
"byte-identical after merge" becomes "identical ordered projection",
which survives any physical layout, partitioning, or compaction. At real
scale this module would sit on a table format (Delta/Iceberg) whose
commit protocol gives the same atomicity; the directory-swap here is the
single-filesystem equivalent.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

LINE_SCHEMA = StructType(
    [
        StructField("writer", StringType(), False),
        StructField("wseq", LongType(), False),
        StructField("idx", LongType(), False),
        StructField("value", StringType(), True),
    ]
)

_CACHE_CAP = 500  # reference: bin/get_file.py:41-50 caps the client cache


class DatasetExistsError(Exception):
    pass


class DatasetNotFoundError(Exception):
    pass


class Store:
    """A dataset store rooted at a directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lock = threading.Lock()
        # one merge at a time per dataset: a second merge must not treat
        # a live peer's __merge_tmp as a stale crash leftover
        self._merge_locks: dict[str, threading.Lock] = {}
        self._cache: dict[str, tuple[int, DataFrame]] = {}

    # ---------------------------------------------------------- paths
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_meta.json")

    def _read_meta(self, name: str) -> dict:
        try:
            with open(self._meta_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise DatasetNotFoundError(name) from None

    def _write_meta(self, name: str, meta: dict) -> None:
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(name))

    def _bump(self, name: str) -> None:
        with self._lock:
            meta = self._read_meta(name)
            meta["version"] += 1
            self._write_meta(name, meta)

    # ------------------------------------------------------ lifecycle
    def create(self, name: str, lines: list[str] | None = None, writer: str = "w0") -> None:
        """Create a dataset; error if it exists (reference protocol C)."""
        d = self._dir(name)
        with self._lock:
            if os.path.exists(d):
                raise DatasetExistsError(name)
            os.makedirs(d)
            self._write_meta(name, {"version": 0, "wseq": {}})
        if lines is not None:
            self.append(name, lines, writer=writer)
        else:
            self._bump(name)

    def append(self, name: str, lines: list[str], writer: str = "w0") -> None:
        """Append driver-provided lines. Per-writer order is recorded in
        (wseq, idx); appends from different writers are unordered
        relative to each other — exactly the reference's contract."""
        with self._lock:
            meta = self._read_meta(name)
            wseq = meta["wseq"].get(writer, 0)
            meta["wseq"][writer] = wseq + 1
            self._write_meta(name, meta)
        rows = [(writer, wseq, i, ln) for i, ln in enumerate(lines)]
        df = self.spark.createDataFrame(rows, LINE_SCHEMA)
        self._write_part(name, df)
        self._bump(name)

    def append_df(self, name: str, df: DataFrame, writer: str = "wdf") -> None:
        """Append a whole DataFrame with a `value` column — the scale
        path (no driver materialization)."""
        with self._lock:
            meta = self._read_meta(name)
            wseq = meta["wseq"].get(writer, 0)
            meta["wseq"][writer] = wseq + 1
            self._write_meta(name, meta)
        out = df.select(
            F.lit(writer).alias("writer"),
            F.lit(wseq).cast("long").alias("wseq"),
            F.monotonically_increasing_id().alias("idx"),
            F.col("value").cast("string"),
        )
        self._write_part(name, out)
        self._bump(name)

    def _write_part(self, name: str, df: DataFrame) -> None:
        # each append is its own parquet sub-directory: append never
        # rewrites existing bytes (the MemTable analogue), merge compacts.
        # The Spark write goes to a STAGING path outside the dataset dir
        # and is published with one os.replace under the lock — a merge
        # running concurrently can therefore never observe (and trash) a
        # half-written part: parts appear in the dataset atomically.
        part = f"part-{time.time_ns()}-{uuid.uuid4().hex[:8]}"
        stage = os.path.join(self.root, ".staging", part)
        df.write.mode("errorifexists").parquet(stage)
        with self._lock:
            d = self._dir(name)
            if not os.path.isdir(d):
                raise DatasetNotFoundError(name)
            os.replace(stage, os.path.join(d, part))

    def multiappend(self, name: str, payloads: dict[str, list[str]]) -> None:
        """Concurrent appends from many writers (reference protocol Q):
        one thread per writer, like bin/multiappend.py fans out VMs."""
        errs: list[Exception] = []

        def run(w: str, lines: list[str]) -> None:
            try:
                self.append(name, lines, writer=w)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=run, args=(w, lns)) for w, lns in payloads.items()
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errs:
            raise errs[0]

    def merge(self, name: str, target_parts: int = 1) -> None:
        """Compact all append parts into `target_parts` files. The
        invariant (tested): the ordered projection of the dataset is
        IDENTICAL before and after — merge changes layout, never content.

        Concurrent-append safe: the expensive Spark rewrite runs OUTSIDE
        the lock over a snapshot of part names; inside the lock, any
        part-* created after the snapshot is moved verbatim into the
        merged directory and meta is RE-READ before the swap, so late
        appends are neither lost nor their wseq counters rolled back.
        The new directory gets its meta written before the swap, so a
        reader never observes a dataset directory without _meta.json.
        """
        d = self._dir(name)
        tmp = d + ".__merge_tmp"
        trash = d + ".__trash"
        with self._lock:
            mlock = self._merge_locks.setdefault(name, threading.Lock())
        with mlock:
            self._merge_locked(name, d, tmp, trash, target_parts)

    def _merge_locked(
        self, name: str, d: str, tmp: str, trash: str, target_parts: int
    ) -> None:
        with self._lock:
            if not os.path.isdir(d):
                raise DatasetNotFoundError(name)
            # a crash between the tmp write and the swap can leave either
            # directory behind; both are safe to discard (tmp is a partial
            # rewrite of parts that still live in `d`, trash is pre-swap)
            for stale in (tmp, trash):
                if os.path.isdir(stale):
                    shutil.rmtree(stale)
            snapshot = [p for p in os.listdir(d) if p.startswith("part-")]
        if snapshot:
            df = self.spark.read.schema(LINE_SCHEMA).parquet(
                *[os.path.join(d, p) for p in snapshot]
            )
            (
                df.repartition(target_parts)
                .sortWithinPartitions("writer", "wseq", "idx")
                .write.mode("overwrite")
                .parquet(os.path.join(tmp, f"part-{time.time_ns()}-merged"))
            )
        else:
            os.makedirs(tmp)
        with self._lock:
            meta = self._read_meta(name)  # fresh: keeps post-snapshot wseq
            snapshot_set = set(snapshot)
            for p in os.listdir(d):
                if p.startswith("part-") and p not in snapshot_set:
                    os.replace(os.path.join(d, p), os.path.join(tmp, p))
            with open(os.path.join(tmp, "_meta.json"), "w") as f:
                json.dump({**meta, "version": meta["version"] + 1}, f)
            os.replace(d, trash)
            os.replace(tmp, d)
            shutil.rmtree(trash)

    # ----------------------------------------------------------- reads
    def _read_all(self, name: str) -> DataFrame:
        d = self._dir(name)
        if not os.path.isdir(d):
            raise DatasetNotFoundError(name)
        parts = [os.path.join(d, p) for p in os.listdir(d) if p.startswith("part-")]
        if not parts:
            return self.spark.createDataFrame([], LINE_SCHEMA)
        return self.spark.read.schema(LINE_SCHEMA).parquet(*parts)

    def get(self, name: str) -> DataFrame:
        """Versioned read: if the version is unchanged since the last
        get, return the cached DataFrame (reference S7 semantics —
        'version unchanged ⇒ no transfer')."""
        version = self.version(name)
        hit = self._cache.get(name)
        if hit is not None and hit[0] == version:
            return hit[1]
        df = self._read_all(name)
        if len(self._cache) >= _CACHE_CAP:
            self._cache.pop(next(iter(self._cache)))
        self._cache[name] = (version, df)
        return df

    def get_lines(self, name: str) -> list[str]:
        """Materialized lines in the canonical (writer, wseq, idx) order."""
        return [
            r.value
            for r in self.get(name).orderBy("writer", "wseq", "idx").collect()
        ]

    def version(self, name: str) -> int:
        return self._read_meta(name)["version"]

    def ls(self, name: str) -> dict:
        """Dataset metadata: version, part files, total bytes (the
        replica-listing analogue of reference `ls`)."""
        d = self._dir(name)
        if not os.path.isdir(d):
            raise DatasetNotFoundError(name)
        parts = sorted(p for p in os.listdir(d) if p.startswith("part-"))
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(d)
            for f in fs
        )
        return {"name": name, "version": self.version(name), "parts": parts, "bytes": size}

    def datasets(self) -> list[str]:
        """All dataset names (reference `store`)."""
        return sorted(
            p
            for p in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, p))
            and not p.startswith(".")
            and not p.endswith("__trash")
            and not p.endswith("__merge_tmp")
        )

    def delete(self, name: str) -> None:
        with self._lock:
            d = self._dir(name)
            if not os.path.isdir(d):
                raise DatasetNotFoundError(name)
            shutil.rmtree(d)
            self._cache.pop(name, None)
