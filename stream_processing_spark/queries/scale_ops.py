"""Scale-path operators made first-class queries: runtime bloom-filter
join pruning, incremental partial-aggregate maintenance, and friends.

Each query here exists because the naive spelling stops working (or
stops being affordable) at 100 TB; the oracle proves the scale spelling
is RESULT-IDENTICAL to the naive one, which is the whole contract of a
physical optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.operators import bloomjoin, zorder
from stream_processing_spark.queries import register
from stream_processing_spark.queries._util import REVENUE_SQL, revenue_col

_BLOOM_PRICE = 300000


@register(
    "bloom_prefilter_join_revenue",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > {_BLOOM_PRICE}
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Runtime bloom-filter join pruning (operators/bloomjoin.py): "
    "revenue of lineitems belonging to urgent high-value orders. The "
    "selective order slice builds an 8 KB packed bloom bitset "
    "(md5-sliced positions, DISTINCT-capped constant driver traffic), "
    "inlined as a literal so the fact scan drops non-candidate rows "
    "MAP-SIDE before the join shuffle — the explicit spelling of "
    "engine runtime filters (Spark AQE bloom injection). Bloom filters "
    "have no false negatives and the equi-join kills the false "
    "positives, so the oracle is simply the plain join: result "
    "invariance IS the contract. At 1000 executors the win is shuffle "
    "volume — with a ~5%-selective build side most fact rows die at "
    "the scan instead of crossing the network.",
)
def bloom_prefilter_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > _BLOOM_PRICE)
    ).select("o_orderkey")
    joined = bloomjoin.bloom_join(
        lineitem, build, big_key="l_orderkey", build_key="o_orderkey"
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue_col()).cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


_Z_BITS = 8
_Z_SHARD_SHIFT = 6


@register(
    "zorder_shard_profile",
    f"""
    WITH d AS (
        SELECT (user_id % 64) AS ub,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
        FROM events
    ),
    z AS (SELECT ub, day, ({zorder.morton2_sql("ub", "day", _Z_BITS)}) AS zval
          FROM d)
    SELECT (zval >> {_Z_SHARD_SHIFT}) AS shard,
           COUNT(*) AS n_events,
           MIN(ub) AS min_ub, MAX(ub) AS max_ub,
           MIN(day) AS min_day, MAX(day) AS max_day
    FROM z
    GROUP BY 1
    ORDER BY shard
    """,
    doc="Z-order (Morton) clustering assignment over events "
    "(operators/zorder.py): user-bucket and day-of-epoch bits "
    "interleaved into one sort key, sharded by z-range. The per-shard "
    "min/max profile IS the pruning evidence — tight ranges in BOTH "
    "dimensions mean parquet footer stats can skip shards for point/"
    "range predicates on either user or time (the layout trick "
    "Delta/Iceberg ship as OPTIMIZE ZORDER BY; a single-key sort "
    "prunes only its own dimension). Pure integer bit arithmetic in "
    "whole-stage codegen; the oracle spells the identical interleave "
    "with >>/&/<<. File-level skipping is proven from real parquet "
    "footers in test_zorder.py.",
)
def zorder_shard_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ub = F.pmod(F.col("user_id"), F.lit(64))
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
    z = zorder.morton2(ub, day, bits=_Z_BITS)
    return (
        ev.select(
            ub.alias("ub"), day.alias("day"),
            F.shiftrightunsigned(z, _Z_SHARD_SHIFT).alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ub").alias("min_ub"), F.max("ub").alias("max_ub"),
            F.min("day").alias("min_day"), F.max("day").alias("max_day"),
        )
        .orderBy("shard")
    )


_BPE_MERGES = 5


def _bpe_oracle(n: int) -> str:
    """Unrolled CTE ladder: per merge step, a pair-count agg, a
    deterministic argmax, and the same doubled-gap literal replace the
    engine uses (left-to-right non-overlapping merge)."""
    parts = [
        """
    tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    r0 AS (
        SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS repr,
               COUNT(*) AS freq
        FROM tok WHERE w <> '' GROUP BY 1
    )"""
    ]
    for k in range(1, n + 1):
        parts.append(f"""
    p{k} AS (
        SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS c
        FROM (SELECT string_split(repr, ' ') AS l, freq FROM r{k - 1}) t,
             UNNEST(range(1, len(l))) AS u(i)
        GROUP BY 1, 2
    ),
    m{k} AS (SELECT a, b, c FROM p{k} ORDER BY c DESC, a ASC, b ASC LIMIT 1),
    r{k} AS (
        SELECT trim(replace(replace(
                   ' ' || replace(repr, ' ', '  ') || ' ',
                   (SELECT ' ' || a || '  ' || b || ' ' FROM m{k}),
                   (SELECT ' ' || a || b || ' ' FROM m{k})),
               '  ', ' ')) AS repr, freq
        FROM r{k - 1}
    )""")
    finals = " UNION ALL ".join(
        f"SELECT {k} AS step, a AS left_sym, b AS right_sym, "
        f"c AS pair_count FROM m{k}"
        for k in range(1, n + 1)
    )
    return "WITH " + ",".join(parts) + f" {finals} ORDER BY step"


@register(
    "bpe_train_merges",
    _bpe_oracle(_BPE_MERGES),
    doc=f"Distributed BPE tokenizer training (functions/bpe.py): the "
    f"first {_BPE_MERGES} learned merges over the documents corpus. "
    "Each step is one distributed adjacent-pair aggregation over the "
    "WORD-FREQUENCY table (vocabulary-sized — ~log of corpus — so "
    "iterations never rescan the corpus; the one corpus-wide pass is "
    "the initial word count) plus a 1-row argmax driver trip with a "
    "total tie-break. The merge rewrite is engine-portable string "
    "algebra: doubled gaps + a literal replace give the left-to-right "
    "non-overlapping scan without lookbehind (RE2-safe), and the "
    "oracle unrolls the identical three steps per merge as CTEs. "
    "Frames are checkpointed per round (reliable=True available for "
    "clusters) so lineage stays flat. Parity vs a pure-Python BPE "
    "reference asserted in test_bpe.py.",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, n_merges=_BPE_MERGES)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_count bigint"
    )
