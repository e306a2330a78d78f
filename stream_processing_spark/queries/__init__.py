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
    # ---- round-6 rotation (VERDICT r5 #3): 35 queries never before
    # in a driver window, so successive rounds accumulate driver-side
    # certification beyond the in-repo gate. Everything rotated OUT
    # (dedup/ann/text/analytics flagships of r3-r5 windows) keeps its
    # GATE_r*/CORRECTNESS_r* history plus tests/test_oracle_queries.py.
    # relational wave
    "q4_priority_late_ship", "q11_important_part_values",
    "q12_linestatus_priority_mix", "q13_customer_distribution",
    "q16_supplier_count_by_part", "q20_dominant_part_suppliers",
    "q21_last_shipper_waits", "q22_global_sales_opportunity",
    # similarity tiers (PQ/IVFPQ + quantized + exact pairs)
    "ann_cosine_pairs", "ann_quantized_topk", "ann_pq_topk",
    "ann_ivfpq_topk",
    # graph retrieval
    "pagerank_copurchase_parts", "triangle_count_copurchase",
    "clustering_coeff_copurchase",
    # scale ops / observability
    "bloom_prefilter_join_revenue", "zorder_shard_profile",
    "snapshot_diff_events", "incremental_rollup_merge",
    "observed_ingest_metrics", "dataset_content_digest",
    # SQL surfaces (VARIANT, recursive CTE, LATERAL, GROUP BY ALL,
    # grouping sets, PIVOT/UNPIVOT)
    "variant_nested_roundtrip_filter", "variant_array_path_access",
    "rcte_date_spine_order_counts", "lateral_top2_orders_per_customer",
    "group_by_all_status_priority", "agg_grouping_sets",
    "pivot_daily_event_counts", "unpivot_lineitem_measures",
    # LLM-pipeline waves not yet driver-certified
    "bpe_train_merges", "bm25_topk_docs", "decontaminate_ngram_overlap",
    "similar_docs_minhash_topk", "cdc_apply_latest_changes",
    "multimodal_binary_meta",
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
