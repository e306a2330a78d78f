"""Manifest-based file skipping: the table-format half of data layout.

Z-ordering (operators/zorder.py) makes per-file min/max ranges tight;
this module is the reader side that exploits them — the same contract
Delta/Iceberg/Hudi implement with transaction-log manifests, expressed
over plain parquet:

- ``build_manifest`` harvests per-file, per-column (min, max, n_rows)
  from parquet FOOTERS. Footer reads are metadata-only (no row groups
  decoded). In production the writer appends these rows to a manifest
  table at commit time; harvesting lazily from footers is the
  bootstrap path for pre-existing data.
- ``prune_files`` evaluates a conjunction of per-column interval
  predicates against the manifest and returns only files whose
  [min, max] intersects every interval — a safe over-approximation
  (stats can never exclude a matching row), so downstream filters keep
  full correctness and skipping is purely a performance win.
- ``read_pruned`` loads just the surviving files.

Scale note: the manifest is FILE-count sized (a 100 TB table at 1 GB
files is ~100k manifest rows — kilobytes per column), so pruning is a
driver-side metadata operation, same as every table format. The data
path never opens skipped files at all, which is strictly stronger than
row-group pushdown (that still pays a footer read per file).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession


def build_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-(file, column) stats DataFrame from parquet footers."""
    import pyarrow.parquet as pq

    rows = []
    for f in sorted(_glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        # empty files (0 row groups) and schema-evolved files missing a
        # requested column are recorded STATS-LESS, never skipped: the
        # prune contract is "missing stats must keep the file"
        if md.num_row_groups == 0:
            for c in cols:
                rows.append((f, c, None, None, 0))
            continue
        name_to_idx = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        n_rows = sum(md.row_group(g).num_rows for g in range(md.num_row_groups))
        for c in cols:
            if c not in name_to_idx:
                rows.append((f, c, None, None, n_rows))
                continue
            lo = hi = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(name_to_idx[c]).statistics
                if st is None or st.min is None:
                    lo, hi = None, None
                    break  # stats missing → column unprunable for file
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rows.append((f, c, None if lo is None else str(lo),
                         None if hi is None else str(hi), n_rows))
    return spark.createDataFrame(
        rows, "file string, col string, min string, max string, n_rows long"
    )


def prune_files(
    manifest: DataFrame, intervals: dict[str, tuple]
) -> list[str]:
    """Files whose stats intersect EVERY (lo, hi) interval (inclusive;
    None = unbounded). A file lacking stats for a predicate column is
    conservatively kept. Interval endpoints must be numeric (manifest
    stats are stringified; they are cast back for comparison)."""
    rows = manifest.collect()
    by_file: dict[str, dict[str, tuple]] = {}
    for r in rows:
        by_file.setdefault(r.file, {})[r.col] = (r.min, r.max)
    keep = []
    for f, stats in sorted(by_file.items()):
        ok = True
        for c, (lo, hi) in intervals.items():
            st = stats.get(c)
            if st is None or st[0] is None:
                continue  # no stats → cannot exclude
            fmin, fmax = float(st[0]), float(st[1])
            if (hi is not None and fmin > hi) or (
                lo is not None and fmax < lo
            ):
                ok = False
                break
        if ok:
            keep.append(f)
    return keep


def read_pruned(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    intervals: dict[str, tuple],
) -> DataFrame:
    """Scan only the files that can contain matching rows. Callers MUST
    still apply the exact predicate — pruning is an over-approximation,
    never a filter."""
    keep = prune_files(manifest, intervals)
    if not keep:
        # empty relation with the right schema
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*keep)
