"""Event-time windowed streaming aggregates with watermarks.

The reference has NO notion of time (SURVEY.md §2.5 — arrival order
only); these are engine extensions, built directly on Structured
Streaming's event-time machinery:

- tumbling / sliding / session windows over a timestamp column
- watermarks bound state and drop late data deterministically
- streaming dedup with ``dropDuplicatesWithinWatermark``

The batch twin of the tumbling agg is queries/relational.py::
events_hourly_tumbling (date_trunc) — same results when the stream
drains fully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Counts per (window, key); watermark bounds state size — without
    it a 100 TB stream accretes unbounded window state."""
    keys = [F.window(F.col(ts_col), window).alias("w")]
    if key_col:
        keys.append(F.col(key_col))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            *( [F.col(key_col)] if key_col else [] ),
            "cnt",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    keys = [F.window(F.col(ts_col), window, slide).alias("w")]
    if key_col:
        keys.append(F.col(key_col))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            *( [F.col(key_col)] if key_col else [] ),
            "cnt",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) per key — state merges as events
    arrive; watermark closes sessions."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "cnt",
        )
    )


def dedup_within_watermark(
    df: DataFrame, id_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exactly-once-by-key: duplicates arriving within the
    watermark horizon are dropped with bounded state — the streaming
    analogue of the reference's (job_id, line_number) dedup dicts
    (worker.py:446-453), but with a state bound."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)
