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
    # §2.2/§2.3/§2.6 reference parity (T1-T7, grep, json)
    "t1_filter_pattern", "t2_select_columns", "t3_filter_project",
    "t4_filter_eq", "t5_count_by_category", "t6_word_count",
    "t7_custom_flatmap",
    # (grep_case_insensitive / grep_invert_count / grep_fixed_literal_count
    # moved out of the window in round 5 for the new flagships; G1-G3
    # stay covered by the three below, the rest by GATE + pytest)
    "grep_count_by_source", "grep_total_count", "grep_word_anchor_count",
    "json_extract_props",
    # §2 streaming operators (S1/T8/A1/ST1-ST7 query surfaces)
    "streaming_counts_by_type", "streaming_hourly_windows",
    "streaming_stateful_running_count", "streaming_dedup_events",
    "skew_salted_user_counts", "skew_salted_user_totals",
    # LLM-pipeline flagships: dedup tiers
    "dedup_exact_groups", "dedup_minhash_signatures", "dedup_lsh_candidates",
    "dedup_minhash_verified_pairs", "dedup_jaccard_pairs",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_connected_components",
    "dedup_embedding_canonical",
    # LLM-pipeline flagships: similarity search
    "ann_brute_force_topk", "ann_lsh_bucketed_pairs", "ann_ivf_topk",
    "embedding_label_centroids", "hybrid_search_topk",
    # LLM-pipeline flagships: text analysis + sampling
    "text_quality_stats", "text_lang_id", "text_token_counts",
    "sample_hash_pct", "sample_stratified_per_lang",
    # analytics flagships
    "funnel_view_click_purchase", "sessionize_user_sessions",
    "event_transition_matrix", "cohort_retention_daily",
    "asof_last_click_before_purchase", "resample_hourly_ffill",
    "range_join_clicks_before_purchase",
    # headline TPC-H-style relational
    "q1_pricing_summary", "q3_top_revenue_orders",
    # round-4 flagships: the composed curation funnel and SemDeDup
    # (q5/q18 moved out of the window; still certified by GATE_r4.json
    # and tests/test_oracle_queries.py)
    "curation_pipeline_yield", "semantic_dedup_stats",
    # round-5 flagships: VARIANT semi-structured extraction, recursive
    # CTE, SQL pipe syntax (everything else stays gate/pytest-certified)
    "variant_typed_extract_stats", "rcte_capped_running_balance",
    "pipe_syntax_lineitem_rollup",
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
