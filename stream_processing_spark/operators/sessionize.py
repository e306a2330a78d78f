"""Gap-based batch sessionization.

The reference has no notion of time (SURVEY.md §2.5 — arrival order
only); sessionization is part of the beyond-reference event-time
surface, the batch twin of ``streaming/windows.py`` session windows
(Spark's ``session_window`` exists only for streaming/batch aggs that
collapse rows — this operator *labels* every row with its session).

Scale notes: one shuffle on the key — the lag-gap flag and the running
sum share the same (key, order) window spec, so Catalyst plans a single
Exchange + Sort feeding both Window nodes. Skewed keys (one user with
millions of events) serialize within the key by construction — that is
inherent to per-key sessionization, not an implementation artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sessions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: list[str] | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Label each row with a per-key session sequence number (1-based).

    A new session starts when the gap to the previous event of the same
    key strictly exceeds ``gap_seconds``. Gaps are compared in integer
    microseconds (exact — no float round-off at the threshold).
    ``order_cols`` must be a total order within the key for the labels
    to be deterministic; defaults to [ts_col].
    """
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    new_sess = (
        F.when(gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    )
    return (
        df.withColumn("__new_sess", new_sess)
        .withColumn(out_col, F.sum("__new_sess").over(run))
        .drop("__new_sess")
    )
