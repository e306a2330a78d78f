"""Batch sessionization and near-dup canonicalization queries.

Sessionization is the batch twin of the streaming session windows
(``streaming/windows.py``); the canonical-map query turns the LSH
near-dup *pairs* into the actual dedup decision (which row to keep) —
the missing last step of the embedding-cosine dedup pipeline from the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import dedup as dd
from stream_processing_spark.functions import similarity as sim
from stream_processing_spark.operators.sessionize import with_sessions
from stream_processing_spark.queries import register
from stream_processing_spark.queries.llmops import _COS_SQL, _LSH_BUCKET_SQL


@register(
    "sessionize_user_sessions",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(FLOOR(EXTRACT(EPOCH FROM MAX(ts) - MIN(ts))) AS BIGINT)
               AS dur_sec
    FROM sess GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30-min inactivity), then per-session "
    "rollup: the lag-gap flag, the running session counter, and the "
    "final groupBy all share one shuffle on user_id. Gap compared in "
    "exact integer microseconds (operators/sessionize.py).",
)
def sessionize_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    s = with_sessions(
        events, "user_id", "ts", gap_seconds=1800, order_cols=["ts", "event_id"]
    )
    dur_us = F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.floor(dur_us / 1_000_000).cast("bigint").alias("dur_sec"),
    )


@register(
    "dedup_embedding_canonical",
    f"""
    WITH buckets AS ({_LSH_BUCKET_SQL}),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN embeddings ea ON ea.vec_id = id_a
        JOIN embeddings eb ON eb.vec_id = id_b
        WHERE {_COS_SQL.format(a="ea.embedding", b="eb.embedding")} >= 0.4
    ),
    nbrs AS (
        SELECT id_a AS vec_id, id_b AS nbr FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
        UNION ALL SELECT vec_id, vec_id FROM embeddings
    )
    SELECT vec_id, MIN(nbr) AS canonical_id
    FROM nbrs GROUP BY vec_id
    """,
    doc="Embedding-cosine near-dup DEDUP decision: banded multi-table "
    "sign-LSH candidate pairs (the scale path — per-band equi-joins, no "
    "all-pairs join, 4× single-table recall), each vector mapped to "
    "min(id) over itself + direct cosine>=0.4 neighbors; rows where "
    "canonical_id < vec_id are the drops. One-hop canonicalization; "
    "dedup_connected_components is the full-closure variant.",
)
def dedup_embedding_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = sim.lsh_banded_pairs(
        emb, threshold=0.4, dim=64, bands=4, rows_per_band=8
    )
    return dd.canonical_from_pairs(pairs, emb, id_col="vec_id")


@register(
    "resample_hourly_ffill",
    """
    WITH hourly AS (
        SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
        FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT user_id,
               UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
        FROM bounds
    )
    SELECT s.user_id, s.bucket_ts,
           last_value(h.val IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_ffill,
           COALESCE(h.n_events, 0) AS n_events
    FROM spine s LEFT JOIN hourly h
      ON s.user_id = h.user_id AND s.bucket_ts = h.bucket_ts
    """,
    doc="Time-series regularization (operators/resample.py): hourly "
    "per-user aggregate densified onto each user's own [min,max] hour "
    "grid (sequence+explode executor-side - no global calendar cross "
    "join), gap hours forward-filled from the last observed value and "
    "zero-filled counts. Every exchange is keyed; spine size is linear "
    "in output rows.",
)
def resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.operators.resample import resample_ffill
    from stream_processing_spark.queries._util import dsum

    events = load_table(spark, sf_dir, "events")
    return resample_ffill(
        events,
        key_col="user_id",
        ts_col="ts",
        aggs=[dsum("value", "val"), F.count(F.lit(1)).alias("n_events")],
        unit="hour",
        fill_cols=["val"],
        zero_cols=["n_events"],
    )


@register(
    "resample_hourly_lerp",
    """
    WITH hourly AS (
        SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
        FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT user_id,
               UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
        FROM bounds
    ),
    j AS (
        SELECT s.user_id, s.bucket_ts, h.val
        FROM spine s LEFT JOIN hourly h
          ON s.user_id = h.user_id AND s.bucket_ts = h.bucket_ts
    ),
    anch AS (
        SELECT user_id, bucket_ts, val,
               last_value(val IGNORE NULLS) OVER wb AS prev_v,
               last_value(CASE WHEN val IS NOT NULL THEN bucket_ts END
                          IGNORE NULLS) OVER wb AS prev_t,
               first_value(val IGNORE NULLS) OVER wf AS next_v,
               first_value(CASE WHEN val IS NOT NULL THEN bucket_ts END
                           IGNORE NULLS) OVER wf AS next_t
        FROM j
        WINDOW wb AS (PARTITION BY user_id ORDER BY bucket_ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY bucket_ts
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket_ts,
           CASE WHEN val IS NOT NULL THEN val
                WHEN next_v IS NOT NULL THEN
                     prev_v + (next_v - prev_v) *
                     ((epoch_us(bucket_ts) - epoch_us(prev_t))
                      / (epoch_us(next_t) - epoch_us(prev_t)))
                ELSE prev_v END AS val_lerp
    FROM anch
    """,
    doc="Linear-interpolation gap fill: gap hours get "
    "prev + (next-prev) * elapsed-fraction between the surrounding "
    "observations (flat after the last). The backward and forward "
    "anchor windows share one (key, bucket) Exchange+Sort - frame "
    "bounds differ, partitioning does not. Hash-matches because both "
    "engines run the identical IEEE double expression on exact inputs.",
)
def resample_hourly_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.operators.resample import resample_ffill
    from stream_processing_spark.queries._util import dsum

    events = load_table(spark, sf_dir, "events")
    return resample_ffill(
        events,
        key_col="user_id",
        ts_col="ts",
        aggs=[dsum("value", "val")],
        unit="hour",
        lerp_cols=["val"],
    )


_TSM_W = 8  # subsequence window length

_TSM_LEADS = ",\n               ".join(
    f"lead(cents, {k}) OVER (PARTITION BY user_id "
    f"ORDER BY ts, event_id) AS c{k}"
    for k in range(_TSM_W)
)
_TSM_DIST = " + ".join(f"(w.c{k} - q.c{k}) * (w.c{k} - q.c{k})" for k in range(_TSM_W))

_TSM_SQL = f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM {{events}}
    ),
    win AS (
        SELECT user_id, event_id, ts,
               {_TSM_LEADS}
        FROM ordered
    ),
    complete AS (
        SELECT * FROM win WHERE c{_TSM_W - 1} IS NOT NULL
    ),
    q AS (
        SELECT user_id AS quser, event_id AS qstart,
               {", ".join(f"c{k}" for k in range(_TSM_W))}
        FROM complete
        WHERE user_id = (SELECT MIN(user_id) FROM complete)
        ORDER BY ts, event_id LIMIT 1
    )
    SELECT w.user_id, w.event_id AS start_event_id,
           CAST({_TSM_DIST} AS BIGINT) AS sq_dist
    FROM complete w, q
    WHERE NOT (w.user_id = q.quser AND w.event_id = q.qstart)
    ORDER BY sq_dist, w.user_id, start_event_id
    LIMIT 10
"""


@register(
    "tsmatch_topk_windows",
    _TSM_SQL.format(events="events"),
    doc=f"Time-series subsequence similarity search (EDBT'19 streaming "
    "time-series search, batch form): the query pattern is the first "
    f"complete length-{_TSM_W} window of the lowest user's value "
    "series, and the answer is the top-10 closest sliding windows "
    "across ALL users by squared Euclidean distance. Windows "
    f"materialize as {_TSM_W} lead() columns over (user, time) — one "
    "sort per user partition, no self-join, no explode — and the "
    "distance is exact INTEGER arithmetic on 100×-scaled values "
    "(the 2-decimal data makes ROUND(value*100) lossless), so both "
    "engines agree bit-for-bit with no float ordering concerns. The "
    "1-row query window broadcasts; at scale the scan stays one "
    "window-function pass, linear in events, with TakeOrderedAndProject "
    "keeping k.",
)
def tsmatch_topk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "tsm_events"
    )
    return spark.sql(_TSM_SQL.format(events="tsm_events"))


@register(
    "pattern_match_event_sequences",
    """
    WITH o AS (
        SELECT user_id, substr(event_type, 1, 1) AS l, ts, event_id
        FROM events
    ),
    s AS (
        SELECT user_id,
               string_agg(l, '' ORDER BY ts, event_id) AS seq
        FROM o GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'vc+p')) AS BIGINT)
               AS n_funnels
    FROM s
    """,
    doc="CEP-style sequence pattern matching (the batch spelling of "
    "MATCH_RECOGNIZE): each user's event history compresses to a "
    "letter string in strict (ts, event_id) order — the five event "
    "types have distinct initials — and the funnel pattern "
    "view→click+→purchase is the regex 'vc+p', counted "
    "non-overlapping leftmost (identical semantics in Java regex and "
    "DuckDB's RE2 for this class). Unlike the stage-join funnel "
    "(funnel_time_bounded), the regex form expresses ADJACENCY — no "
    "intervening events inside a match — which join chains cannot say "
    "without a row-number gap check per stage. Plan: one keyed "
    "shuffle, per-user state bounded by that user's history, regex "
    "map-side; the struct sort_array makes the order deterministic "
    "under any partitioning.",
)
def pattern_match_event_sequences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("l")
            ).alias("x"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("x")).alias("xs"))
    )
    seq = F.expr("array_join(transform(xs, x -> x.l), '')")
    return arr.select(
        "user_id",
        F.length(seq).cast("bigint").alias("n_events"),
        F.regexp_count(seq, F.lit("vc+p")).cast("bigint").alias("n_funnels"),
    )
