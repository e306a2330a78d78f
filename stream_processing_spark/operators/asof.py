"""As-of join: for each left row, the nearest right row at-or-before
(backward) or at-or-after (forward) its timestamp, matched on an
equality key, optionally within a tolerance.

Spark has no native as-of join (DuckDB/Pandas do). The scalable plan is
NOT a per-row range probe (that's a quadratic theta-join); it is:

    union(left tagged 1, right tagged 0)
      → single shuffle on the match key
      → per-key sort by (ts, side, tiebreak)   [ts desc for forward]
      → running `last(payload, ignorenulls)` window
      → keep left rows, null out matches beyond tolerance

One shuffle + one sort, the same cost as a sort-merge join — this is the
plan that survives 100 TB. Right-side payload is packed into one struct
so the carried columns always come from the SAME right row (per-column
last() could tear rows when payload values are legitimately NULL); the
matched right timestamp rides along in the struct for the tolerance
check.

Reference note: the reference engine has no join at all (SURVEY.md §2.4);
this operator is part of the beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_TIE = "__asof_tie"
_PAYLOAD = "__asof_payload"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    strict: bool = False,
    direction: str = "backward",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join.

    Parameters
    ----------
    on : equality key column(s) present on both sides.
    left_ts / right_ts : event-time columns.
    right_tiebreak : column ordering right rows that share a timestamp
        (backward: greatest wins; forward: smallest wins); required for
        a deterministic result when right timestamps can tie.
    strict : if True, match right.ts < left.ts (backward) or
        right.ts > left.ts (forward) instead of the inclusive bound.
    direction : "backward" (latest right at-or-before) or "forward"
        (earliest right at-or-after) — pandas merge_asof semantics.
    tolerance_sec : if set, matches farther than this many seconds from
        the left timestamp are nulled out (match columns → NULL).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    backward = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)

    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    if not payload_cols:
        raise ValueError("right side has no payload columns to carry")
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash:
        raise ValueError(
            "right payload column(s) collide with left columns: "
            f"{clash} — rename the right side (e.g. .withColumnRenamed) "
            "before the as-of join"
        )

    tie = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        tie.alias(_TIE),
        F.struct(F.col(right_ts).alias(_RTS), *payload_cols).alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        # side orders equal timestamps: with the inclusive bound the
        # right row sorts before the left row it can match; with strict
        # it sorts after (excluded by the running window).
        F.lit(1 if not strict else -1).alias(_SIDE),
        F.lit(None).cast(r.schema[_TIE].dataType).alias(_TIE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns if c not in keys],
    )

    # backward: ts asc, running-last = latest right ≤ lts, greatest tie.
    # forward: ts DESC, running-last = earliest right ≥ lts; tie DESC so
    # the last seen (= kept) is the SMALLEST tiebreak.
    ts_ord = F.col(_TS).asc() if backward else F.col(_TS).desc()
    tie_ord = (
        F.col(_TIE).asc_nulls_first()
        if backward
        else F.col(_TIE).desc_nulls_first()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, F.col(_SIDE).asc(), tie_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col(_SIDE) != 0)

    if tolerance_sec is not None:
        delta = F.col(_TS).cast("double") - F.col(f"{_PAYLOAD}.{_RTS}").cast(
            "double"
        )
        gap = delta if backward else -delta
        out = out.withColumn(
            _PAYLOAD,
            F.when(gap <= float(tolerance_sec), F.col(_PAYLOAD)),
        )

    return out.select(
        *keys,
        *[F.col(c) for c in left.columns if c not in keys],
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload_cols],
    )
