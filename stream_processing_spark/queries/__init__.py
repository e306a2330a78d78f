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
from stream_processing_spark.queries import mlfeat  # noqa: E402,F401
from stream_processing_spark.queries import expstats  # noqa: E402,F401
from stream_processing_spark.queries import llmprep  # noqa: E402,F401
from stream_processing_spark.queries import expstats2  # noqa: E402,F401
from stream_processing_spark.queries import curation7  # noqa: E402,F401
from stream_processing_spark.queries import expstats3  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-snapshot ordering: the round driver records correctness for the
# FIRST 50 registry entries, so that window must certify (a) every
# SURVEY.md §2 reference-parity operator and (b) the LLM-pipeline and
# analytics flagships. Everything else keeps registration order after.
_PRIORITY = [
    # §2.2/§2.3/§2.6 reference parity ANCHORS — shrunk to 10 this round
    # (VERDICT r7 #1) so the window certifies 40 first-time names.
    # These stay in EVERY round's window: T1-T7 (the reference's whole
    # transform tier), G1/G3 grep, and the A1/T8 stateful streaming
    # running count. Everything rotated OUT keeps its GATE_r*/
    # CORRECTNESS_r* history plus tests/test_oracle_queries.py.
    "t1_filter_pattern", "t2_select_columns", "t3_filter_project",
    "t4_filter_eq", "t5_count_by_category", "t6_word_count",
    "t7_custom_flatmap",
    "grep_count_by_source", "grep_total_count",
    "streaming_stateful_running_count",
    # ---- round-13 rotation (standing invariant, VERDICT r12 item 2):
    # window = anchors + every query whose SPARK CODE materially
    # changed this round (the range_prefix_sum materialization +
    # adaptive small-frame path touch every scan caller; the KS helper
    # also swapped its arg-max to a one-pass struct fold; BM25F moved
    # to the single-scan posexplode shape) + every round-13 addition.
    # Everything rotated OUT keeps its CORRECTNESS_r* history plus
    # tests/test_oracle_queries.py.
    # -- re-certifications: range_prefix_sum callers (r13 one-scan
    # materialization + adaptive small-frame path)
    "spearman_quantity_price", "mann_whitney_value_drift",
    "ks_value_drift_report", "psi_value_drift",
    "streaming_ks_drift_monitor", "streaming_psi_drift_monitor",
    "conformal_linreg_intervals", "winsorized_mean_price",
    "grouped_value_percentiles", "median_ci_orders",
    "lorenz_user_activity_deciles", "user_activity_gini",
    "vocab_top_tokens",
    # -- re-certification: single-scan field tagging (ADVICE r12)
    "bm25f_topk_docs",
    # -- round-13 additions: stats tier III + curation
    "tdigest_value_quantiles", "seasonal_mann_kendall_weekday",
    "quantile_regression_pinball", "hllpp_sparse_distinct_users",
    "sessionized_funnel_timeout", "langid_trigram_cosine_mix",
    "kmv_distinct_users", "weighted_sample_docs_aes",
    "cramer_von_mises_drift", "funnel_time_to_convert",
    "dau_wau_mau_daily", "did_value_estimate",
    "split_assignment_report", "ab_minimum_detectable_effect",
    "classifier_calibration_ece", "james_stein_type_means",
    "logrank_lifetime_by_cohort",
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
