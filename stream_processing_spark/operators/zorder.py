"""Z-order (Morton) multi-dimensional clustering for data layout.

The 100 TB problem: a table can be SORTED on only one key. Sort events
by day and per-user point queries touch every file; sort by user and
per-day queries do. Z-ordering interleaves the bits of several
dimensions into one sort key, so rows close in ANY dimension land close
in the layout — parquet min/max footer stats then prune files/row
groups for point or range predicates on EITHER dimension (~sqrt(F) of F
files for a 2-D point query instead of all of them). This is the same
layout trick Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is an
explicit operator over plain parquet.

Everything is integer bit arithmetic on JVM expressions — no UDFs, and
the same formula is expressible in any engine's SQL (the oracle twin
spells it with `>>`/`&`/`<<`), so clustering assignment is
deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton2(a: Column, b: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    a's bit i → z bit 2i, b's bit i → z bit 2i+1. Pure expression —
    evaluates inside whole-stage codegen."""
    z: Column = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        abit = F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(one)
        bbit = F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(one)
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def morton2_sql(a: str, b: str, bits: int = 8) -> str:
    """The identical interleave as ANSI SQL (DuckDB-compatible)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int,
    sort_extra: list[str] | None = None,
) -> None:
    """Cluster ``df`` into ``n_files`` parquet files by z-value range.

    repartitionByRange gives each output file a contiguous z-range
    (range partitioner samples the z distribution, so files are
    balanced even when the dimensions are skewed); the within-partition
    sort tightens per-ROW-GROUP min/max stats for both dimensions so
    readers prune at row-group granularity too, not just per file."""
    out = df.withColumn("__z", zcol)
    out = out.repartitionByRange(n_files, "__z").sortWithinPartitions(
        "__z", *(sort_extra or [])
    )
    out.drop("__z").write.mode("overwrite").parquet(path)
