"""Query registry — the correctness surface of the engine.

Each entry pairs an idiomatic-PySpark implementation with an ANSI-SQL
oracle that DuckDB runs on the same parquet tables. The driver compares
row-count + schema + order-insensitive value-hash at sf=0.01
(see /root/repo/__spark_entry__.py).

Determinism rules (both sides MUST follow them to hash-match):
- Never aggregate raw doubles: cast to DECIMAL first (the synthetic data
  is 2-decimal), aggregate exactly, then CAST the result to DOUBLE.
  Float addition is order-dependent; decimal addition is not.
- Alias every computed column identically in Spark and SQL.
- Every LIMIT carries a total tie-breaking ORDER BY.
- Round genuinely-float outputs (cosine similarity) to 6 decimals.

Input contract: numeric columns are FINITE. NaN/Infinity cannot be
oracle-matched at all — Spark's decimal/bigint casts null them while
DuckDB raises a conversion error — so queries neither special-case nor
claim them; ingest validation (dq_expectations_report has an isfinite
shape) is the right place to reject them. Degenerate-but-valid inputs
(empty tables, NULLs, empty strings, Unicode) ARE in-contract and
hash-verified by tests/test_advice_fixes.py's sweeps.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


# Importing the submodules populates REGISTRY via @register.
from stream_processing_spark.queries import parity  # noqa: E402,F401
from stream_processing_spark.queries import relational  # noqa: E402,F401
from stream_processing_spark.queries import relational2  # noqa: E402,F401
from stream_processing_spark.queries import relational3  # noqa: E402,F401
from stream_processing_spark.queries import relational4  # noqa: E402,F401
from stream_processing_spark.queries import relational5  # noqa: E402,F401
from stream_processing_spark.queries import relational6  # noqa: E402,F401
from stream_processing_spark.queries import llmops  # noqa: E402,F401
from stream_processing_spark.queries import streaming_queries  # noqa: E402,F401
from stream_processing_spark.queries import skew_queries  # noqa: E402,F401
from stream_processing_spark.queries import sampling_queries  # noqa: E402,F401
from stream_processing_spark.queries import sessionize_queries  # noqa: E402,F401
from stream_processing_spark.queries import analytics_queries  # noqa: E402,F401
from stream_processing_spark.queries import curation2  # noqa: E402,F401
from stream_processing_spark.queries import curation3  # noqa: E402,F401
from stream_processing_spark.queries import curation4  # noqa: E402,F401
from stream_processing_spark.queries import curation5  # noqa: E402,F401
from stream_processing_spark.queries import curation6  # noqa: E402,F401
from stream_processing_spark.queries import graph_retrieval  # noqa: E402,F401
from stream_processing_spark.queries import pq  # noqa: E402,F401
from stream_processing_spark.queries import scale_ops  # noqa: E402,F401
from stream_processing_spark.queries import ml_queries  # noqa: E402,F401
from stream_processing_spark.queries import variantq  # noqa: E402,F401
from stream_processing_spark.queries import rcte  # noqa: E402,F401
from stream_processing_spark.queries import pipesql  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-snapshot ordering: the round driver records correctness for the
# FIRST 50 registry entries, so that window must certify (a) every
# SURVEY.md §2 reference-parity operator and (b) the LLM-pipeline and
# analytics flagships. Everything else keeps registration order after.
_PRIORITY = [
    # §2.2/§2.3/§2.6 reference parity anchors (T1-T7, G1-G3, json,
    # S1/T8/A1/ST2 streaming) — these stay in EVERY round's window
    "t1_filter_pattern", "t2_select_columns", "t3_filter_project",
    "t4_filter_eq", "t5_count_by_category", "t6_word_count",
    "t7_custom_flatmap",
    "grep_count_by_source", "grep_total_count", "grep_word_anchor_count",
    "json_extract_props",
    "streaming_counts_by_type", "streaming_hourly_windows",
    "streaming_stateful_running_count", "streaming_dedup_events",
    # ---- round-7 rotation (VERDICT r6 #3): 35 queries never before
    # in any driver window (r01/r02/r03/r05/r06), so successive rounds
    # accumulate driver-side certification beyond the in-repo gate.
    # Everything rotated OUT keeps its GATE_r*/CORRECTNESS_r* history
    # plus tests/test_oracle_queries.py.
    # full streaming tier (incl. the two transformWithState queries,
    # registered correctly as of this round)
    "streaming_sliding_windows", "streaming_session_windows",
    "streaming_static_join_counts", "streaming_stream_stream_join",
    "streaming_stream_stream_left_join", "streaming_custom_stateful_max",
    "streaming_trending_topk", "streaming_stateful_sessions",
    "streaming_tws_running_count", "streaming_tws_sessions",
    # remaining §2.6 grep parity variants (G2 flag surface)
    "grep_context_count", "grep_only_matching_counts",
    "grep_max_count_first_matches", "grep_files_with_matches",
    "grep_multi_pattern_count",
    # curation waves
    "quality_gopher_repetition", "funnel_time_bounded",
    "scd2_user_event_type_history", "events_anomaly_days",
    # LLM-pipeline dedup/curation flagships not yet driver-certified
    "dedup_incremental_new_vs_corpus", "dedup_survivors_near",
    "curation_final_keep", "similar_docs_lsh_pruned_topk",
    # scale ops remainder
    "bpe_encode_source_stats", "dq_expectations_report",
    "join_size_prediction",
    # sessionize / sampling / variant surfaces
    "resample_hourly_lerp", "weighted_reservoir_sample",
    "variant_missing_path_semantics",
    # ML pipeline
    "kmeans_cluster_assignments", "association_rules_parts",
    # relational function surfaces
    "window_lead_lag_events", "join_full_outer_daily",
    "array_functions_surface", "map_functions_surface",
]

_missing = [n for n in _PRIORITY if n not in REGISTRY]
assert not _missing, f"priority list names unknown queries: {_missing}"
assert len(_PRIORITY) <= 50, (
    f"_PRIORITY has {len(_PRIORITY)} entries; the driver certifies only "
    "the first 50 registry entries"
)
_ordered = {n: REGISTRY[n] for n in _PRIORITY}
_ordered.update({n: s for n, s in REGISTRY.items() if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)
