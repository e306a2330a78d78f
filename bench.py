#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect). Queries are chosen to cover the engine's load-
bearing paths: scan+agg, multi-join, window, top-k, grep, shuffle-heavy
dedup, embedding similarity, as-of join.

Round-over-round note: round 2 ADDED headliners (dedup_jaccard_pairs,
dedup_connected_components, ann_ivf_topk, dedup_simhash_pairs,
decontaminate_ngram_overlap, bm25_topk_docs, quality_lm_avg_bigram_prob,
pii_redact_stats, cross_source_span_overlap) and replaced the
single-band LSH algorithm with the 4-table banded one (~4x recall, more
signature math) — compare totals per-query against BENCH_r01, not in
aggregate. Measured mid-round-2 on an idle box: the 22 round-1 queries
total 14.1s vs 15.5s in BENCH_r01 (slightly faster); the only >1.5x
per-query mover is ann_lsh_bucketed_pairs (1.35s -> 2.7s), which is the
intentional banded-multi-table upgrade, not a plan regression.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "t6_word_count",
    "grep_count_by_source",
    "window_top3_orders_per_customer",
    "events_hourly_tumbling",
    "asof_last_click_before_purchase",
    "dedup_minhash_signatures",
    # df-capped 3-gram Jaccard: proves the shingle self-join is bounded
    # at sf0.1 (the uncapped unigram form blew up quadratically here)
    "dedup_jaccard_pairs",
    "dedup_connected_components",
    "ann_brute_force_topk",
    "ann_lsh_bucketed_pairs",
    "ann_ivf_topk",
    # pigeonhole 4-byte band join (Hamming<=3 pairs, no all-pairs)
    "dedup_simhash_pairs",
    # linear-volume train-set n-gram membership join
    "decontaminate_ngram_overlap",
    # sparse retrieval: tf shuffle + broadcast df/stats + top-k
    "bm25_topk_docs",
    # LM build + linear membership scoring join over one checkpointed
    # bigram frame
    "quality_lm_avg_bigram_prob",
    "embedding_label_centroids",
    "skew_salted_user_counts",
    "text_quality_stats",
    "dedup_exact_groups",
    # map-side regex scrub over the full corpus (PII masking throughput)
    "pii_redact_stats",
    # linear span-fingerprint self-join bounded by catalog-size fan-out
    "cross_source_span_overlap",
    # grouping-sets agg over broadcast dims (subtotal tree in one pass)
    "rollup_revenue_region_nation",
    "sessionize_user_sessions",
    # event-sequence ops: chained stage joins / lead() transition pairs
    "funnel_view_click_purchase",
    "event_transition_matrix",
    # densifies ~1M output rows (grid gen + join + ffill window)
    "resample_hourly_ffill",
    # a REAL Structured Streaming query (file stream → stateful agg →
    # memory sink, drained): ~100k events at sf0.1 in single-digit
    # seconds ≈ >10k rec/s vs the reference's ~84-330 rec/s
    # (BASELINE.md, Streaming.pdf p.1-3)
    "streaming_counts_by_type",
    # --- round-3 additions (new capabilities, not replacements —
    # compare totals per-query against BENCH_r02, not in aggregate).
    # Round-over-round note: dedup_minhash_signatures gained the
    # stop-shingle df cap (0.8s -> 1.4s, the adversarial-corpus guard);
    # ann_lsh_bucketed_pairs / ann_ivf_topk got ~2x FASTER from the
    # SQL-string dot construction (2.8/2.7s -> ~1.5s each).
    # bloom runtime-filter join: map-side prefilter + shuffle join
    "bloom_prefilter_join_revenue",
    # 5 BPE merge rounds over the word-frequency table (1 agg + 1-row
    # driver argmax per round)
    "bpe_train_merges",
    # closed-form OLS: one 6-moment decimal agg per group
    "linreg_price_on_quantity",
    # Morton-interleave clustering profile (pure integer codegen)
    "zorder_shard_profile",
    # DataSketches HLL daily sketches unioned to per-type distincts
    "hll_sketch_rollup_users",
    # CDC diff: key full-outer join on (key, row-hash) only
    "snapshot_diff_events",
    # Arrow GROUPED_AGG pandas UDAF (the sanctioned custom-agg path)
    "grouped_wavg_pandas_udaf",
    # order-independent whole-table checksum (scan + commutative sum)
    "dataset_content_digest",
    # --- round-4 additions (new capabilities — compare totals
    # per-query against BENCH_r03, not in aggregate).
    # Round-over-round note: bloom_prefilter_join_revenue got ~2.3x
    # FASTER (3.9s -> ~1.7s: xxhash64 positions, single array<bigint>
    # literal, executor-side bit_or packing, one build-side scan);
    # dedup_connected_components switched to the hybrid
    # propagation+star closure (parity locally, O(log n) worst case).
    # Other per-query deltas vs r3 track machine load — the r4
    # measurement day ran ~15-25% slower across untouched queries.
    # SemDeDup: cluster-bounded pairwise cosine, map-side assignment,
    # block-decomposed pair join
    "semantic_dedup_stats",
    # tokenizer application: broadcast vocab map, no corpus shuffle
    "bpe_encode_source_stats",
    # --- round-5 additions (new capabilities — compare totals
    # per-query against BENCH_r04, not in aggregate).
    # Round-over-round note: ann_ivf_topk / ann_lsh numbers carry over;
    # the PQ tier (not benched here, gate-visible) got ~2x faster from
    # ADC lookup-table scoring + SQL-string expression construction.
    # parse-once VARIANT ingestion + typed path extraction (JSON
    # parse throughput over the 1M-row props envelope)
    "variant_typed_extract_stats",
    # WITH RECURSIVE: 20-level capped running balance, one join+clamp
    # per level, all users advance in parallel per level. ~3s wall is
    # 20 sequential per-level jobs (CONSTANT in data volume — the
    # serial dimension of plan-level recursion); the ranked prefix is
    # materialized once so levels touch 20 rows/user, never the events
    # scan
    "rcte_capped_running_balance",
    # --- round-6 addition (new headliner — compare per-query against
    # BENCH_r05, not in aggregate): PQ ADC lookup-table scoring over
    # IVF-pruned candidates (the compressed-domain ANN scale path)
    "ann_ivfpq_topk",
    # --- round-7 additions (VERDICT r6 #8): the SAME per-key running
    # count on both arbitrary-stateful tiers, so the transformWithState
    # "richer state model" claim carries a measured cost. The TWS row
    # pays the state-server protocol (a protobuf round-trip per state
    # access between the python worker and the JVM's state server) and
    # the RocksDB provider; the applyInPandasWithState row is the
    # row-encoded-tuple tier already benched as
    # streaming_stateful_running_count. Compare the pair to each other,
    # not against earlier rounds' totals.
    "streaming_stateful_running_count",
    "streaming_tws_running_count",
    # round-7 new-capability headliners (compare per-query against
    # BENCH_r06, not in aggregate): asymmetric containment (df-capped
    # shingle self-join), hybrid RRF fusion (depth-bounded), Gopher
    # line/para dedup over the derived page fixture (page-keyed
    # shuffle), CEP-style sequence regex (per-user keyed shuffle)
    "dedup_containment_pairs",
    "retrieval_rrf_hybrid_topk",
    "quality_gopher_line_para_dedup",
    "pattern_match_event_sequences",
    # --- round-8 additions (new capabilities — compare per-query
    # against BENCH_r07, not in aggregate).
    # Round-over-round note: funnel_view_click_purchase was REWRITTEN
    # this round (the r7 >2x regression): the three-branch join form
    # re-evaluated shared stage subtrees (six events scans); the new
    # form is one scan + one user_id shuffle with per-user
    # collect_list arrays and map-side array_min(filter(...)) stage
    # derivation — 1.17 s -> ~0.8 s on the r8 box.
    # Lee et al. exact-substring spans: linear window fingerprints,
    # gaps-and-islands merge
    "dedup_exact_substring_spans",
    # DSIR: map-side hashed features, constant-size bucket-weight
    # broadcast, map-side keep
    "mixture_dsir_resample",
    # Viterbi-EM tokenizer training: 2 EM rounds over the vocab-sized
    # word table (pandas-UDF lattice DP)
    "unigram_lm_train",
    # WordPiece likelihood-ratio merges (same ladder as BPE, extra
    # vocab-sized symbol-count agg per step)
    "wordpiece_train_merges",
    # fastText-style classifier inference: one feature scan + a
    # constant-size weight broadcast (training runs inside, 3 GD rounds)
    "quality_classifier_scores",
    # MMR diversity re-rank: one first-stage top-k scan + depth-bounded
    # greedy selection
    "retrieval_mmr_rerank_topk",
    # power-iteration PC1: two linear passes per round, broadcast d-row
    # direction vector
    "embedding_power_iteration_pc1",
    # CUSUM drift monitor: daily-count agg + constant-size decimal walk
    "changepoint_cusum_daily_events",
    # checkpoint state read back as a table (statestore source) after a
    # drained streaming count
    "streaming_state_inspection",
    # --- round-9 additions (new capabilities — compare per-query
    # against BENCH_r08, not in aggregate). Classifier note: the
    # round-9 model cache (trained_classifier) means
    # quality_classifier_scores above now pays ONE corpus scan over a
    # broadcast weight table; training cost shows once per fresh JVM.
    # Tokenizer APPLICATION twins of bpe_encode_source_stats: greedy
    # longest-match walk / one extra Viterbi E-step over the distinct
    # word table, then a broadcast word->token-count join
    "wordpiece_encode_source_stats",
    "unigram_encode_source_stats",
    # round 10: novelty scoring (shingle-shuffle shape), temperature
    # mixture (lang agg + md5 map), dim-variance selection (64-group
    # explode agg)
    "ngram_novelty_scores",
    "mixture_temperature_resample",
    "embedding_dim_variance_topk",
    # round-10 third/fourth/fifth batches (new capabilities — compare
    # per-query against BENCH_r09/BENCH_r10, not in aggregate):
    # two-level-blocked sorted-neighborhood dedup (partitioned sort +
    # bounded neighbor equi-join + shingle verify)
    "dedup_sorted_neighborhood_pairs",
    # 3 synchronous vote rounds over the co-purchase graph (join+count
    # shuffle + per-node window argmax per round)
    "graph_label_propagation",
    # split-conformal intervals: fit-stats agg + histogram quantile
    "conformal_linreg_intervals",
    # KS drift: corpus agg to a value histogram + integer CDF maximize
    "ks_value_drift_report",
    # Zipf fit: token explode/count + vocab-bounded rank window + OLS
    "zipf_token_fit",
    # --- round-11 additions (new capabilities — compare per-query
    # against BENCH_r10, not in aggregate).
    # Round-over-round note: graph_label_propagation gained the
    # round-1 min-neighbor shortcut (sf1 54-60 s -> 24-28 s
    # same-session; sf0.1 within noise) and
    # streaming_tws_running_count now sizes its state partitions to
    # the event_type key DOMAIN (8 stores, not 32 — ~47 ms per RocksDB
    # store per batch measured) plus one fewer state RPC per key; the
    # TWS/twin headliner pair narrowed from 2.2x to ~1.55x.
    # next-fit sequence packing: per-shard applyInPandas greedy walk
    "context_window_packing",
    # pure map-stage chunk explode (offset arithmetic + md5, no shuffle)
    "rag_chunk_offsets",
    # per-group argmax/argmin preference pairs over per-doc TTR scores
    "dpo_preference_pairs",
    # two corpus aggs + per-doc cumulative windows + ln-ln OLS
    "heaps_vocab_growth_fit",
    # (source,token) histogram + domain-bounded pair frame + KL terms
    "corpus_js_divergence_sources",
    # rank-sum U over the value-domain histogram (KS/PSI sibling)
    "mann_whitney_value_drift",
    # one per-user agg + 2-row variant frame x 1-row pooled stats
    "cuped_adjusted_ab_metric",
    # joint-histogram Spearman (marginal rank maps joined back)
    "spearman_quantity_price",
    # --- round-12 additions (new capabilities — compare per-query
    # against BENCH_r11, not in aggregate). Round-over-round note:
    # spearman/mann_whitney/ks/psi/conformal/cms/zipf/rrf/gini/vocab
    # moved their rank/CDF walks onto the range-partitioned prefix
    # scan this round (operators/prefixsum) — identical values, plans
    # with no data-sized single-partition window.
    # domain-bounded cell-pair concordance fold
    "kendall_tau_quantity_discount",
    # histogram-rank P5/P95 cut points + clamped integer fold
    "winsorized_mean_price",
    # jaccard edges → CC closure → per-cluster survivor election
    "dedup_cc_survivor_map",
    # field-tagged explode + weighted-tf saturation + top-k
    "bm25f_topk_docs",
    # distinct-day shuffle + per-user gaps-and-islands windows
    "user_longest_streak",
    # per-user first-event agg + month-domain cohort rollup
    "cohort_ltv_matrix",
    # --- round-13 additions (new capabilities — compare per-query
    # against BENCH_DETAIL_r12, not in aggregate). Round-over-round
    # note: every range_prefix_sum caller eager-materializes its
    # histogram once this round and small frames take the adaptive
    # one-bucket window path — identical values, one corpus scan.
    # k1-clustered deterministic quantile sketch over the value hist
    "tdigest_value_quantiles",
    # joint-histogram pinball-loss slope grid + grouped prefix scan
    "quantile_regression_pinball",
    # two-shuffle trigram-profile cosine argmax
    "langid_trigram_cosine_mix",
    # one window pass + three co-partitioned step aggs
    "sessionized_funnel_timeout",
    # 30-way map-side expansion of the distinct (day, user) frame
    "dau_wau_mau_daily",
    # bottom-k distinct sketch (TakeOrdered over distinct hashes)
    "kmv_distinct_users",
    # per-weekday day-pair equi-join + DECIMAL tie folds
    "seasonal_mann_kendall_weekday",
    # prefix-scan CDF gaps, 9dp-rounded DECIMAL L2 fold
    "cramer_von_mises_drift",
    # corpus scoring scan + 10-bin calibration fold
    "classifier_calibration_ece",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # export the vendored protobuf runtime BEFORE the JVM starts so the
    # transformWithState rows can run (workers inherit the JVM's env)
    from stream_processing_spark.compat import ensure_protobuf_runtime

    ensure_protobuf_runtime()

    from stream_processing_spark.session import get_spark
    from stream_processing_spark.queries import REGISTRY

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/JIT and the file-listing cache off the clock
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # machine-speed canary (r11): a fixed, data-independent JVM job so
    # round-over-round comparisons can NORMALIZE host drift (r10/r11
    # both measured 1.1-2.9x cross-round wall drift on identical code;
    # shuffle-heavy queries drift the most). Compare per-query walls
    # as (wall / canary) across rounds, not raw seconds.
    def _canary() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(200_000_000).selectExpr(
                "sum((id * 37) % 1000003) AS s"  # bounded: no overflow
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # r12: the canary's OWN codegen/C2 path needs warming — every
    # recorded run showed pre ≈ 2× post on an otherwise idle box (the
    # parquet warmup above compiles a different code path), which made
    # the pre/post swing read as permanent host noise. Warm it off the
    # clock until two consecutive probes agree within 20% (≤6 tries).
    prev = _canary()
    for _ in range(5):
        cur = _canary()
        if max(prev, cur) / max(min(prev, cur), 1e-9) < 1.2:
            break
        prev = cur

    canary_pre = _canary()

    timings: dict[str, float] = {}

    def _measure_pass(runs: int) -> None:
        import gc

        for name in BENCH_QUERIES:
            spec = REGISTRY[name]
            best = timings.get(name, float("inf"))
            for _ in range(runs):
                t0 = time.perf_counter()
                spec.spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            # release checkpoint/cache blocks between queries: the
            # eager localCheckpoints (LPA, spearman, the drift
            # monitors) are reclaimed by ContextCleaner only after
            # both the Python refs and the JVM weak refs clear — left
            # alone, ~80 queries of accumulated blocks degraded the
            # shared session ~4x for late-positioned queries (r12)
            gc.collect()
            spark.sparkContext._jvm.System.gc()

    # best of 2: the first run pays whole-stage-codegen compilation
    # and JIT; steady-state is what a long-running cluster sees
    _measure_pass(2)
    canary_post = _canary()

    # act on the canary (VERDICT r11 item 1): if the host speed swung
    # >1.5x between the pre and post probes, the measurement window is
    # drift-contaminated — take one more min-merged pass and re-probe;
    # if it STILL swings, stamp the JSON noisy so round-over-round
    # comparisons know to normalize instead of trusting raw walls
    def _swing(a: float, b: float) -> float:
        return max(a, b) / max(min(a, b), 1e-9)

    if _swing(canary_pre, canary_post) > 1.5:
        _measure_pass(1)
        canary_post = _canary()
    noisy = _swing(canary_pre, canary_post) > 1.5

    # adversarial skew/scale stress section (VERDICT r2 #1): hostile
    # fixtures (~10x sf0.1: Zipf-hot keys, stop-shingle saturation, LSH
    # mode collapse, blob skew) measured with every scale guard active.
    # Fixture generation is cached on disk; set SPARK_GRAFT_SKIP_SKEW=1
    # to skip the section entirely.
    skew = None
    if not os.environ.get("SPARK_GRAFT_SKIP_SKEW"):
        from stream_processing_spark.stressbench import run_stress

        skew = run_stress(spark)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # fixed JVM job timed BEFORE and AFTER the query loop: compare
        # per-query walls across rounds as wall/canary, and treat a
        # pre/post gap as mid-run host noise (r11 saw a 2x swing).
        # noisy=true means even a drift-triggered extra pass could not
        # get the swing under 1.5x — normalize, don't trust raw walls.
        "canary_pre_sec": canary_pre,
        "canary_post_sec": canary_post,
        "canary_swing": round(_swing(canary_pre, canary_post), 3),
        "noisy": noisy,
        "queries": timings,
        "sf": sf,
    }
    # The driver parses the LAST stdout line only if it fits entirely
    # inside its 2000-char tail capture (BENCH_r09 at 62 headliners
    # overflowed -> parsed: null). If the one-line form would blow the
    # window, elide the FASTEST queries from the printed line
    # (slowest-first is what matters for grading) and say how many,
    # pointing at the sidecar that always holds every timing.
    line = json.dumps(out, separators=(",", ":"))
    budget = 1900
    elided_names: list[str] = []
    if len(line) > budget:
        out["detail"] = "BENCH_DETAIL.json"
        ranked = sorted(
            timings.items(), key=lambda kv: (-kv[1], kv[0])
        )
        kept: dict[str, float] = {}
        for k, v in ranked:
            trial = dict(out)
            trial["queries"] = {**kept, k: v}
            trial["queries_elided"] = len(timings) - len(kept) - 1
            if len(json.dumps(trial, separators=(",", ":"))) > budget:
                break
            kept[k] = v
        out["queries"] = kept
        out["queries_elided"] = len(timings) - len(kept)
        elided_names = sorted(set(timings) - set(kept))
        line = json.dumps(out, separators=(",", ":"))
    # The driver captures only a bounded TAIL of stdout's last line
    # (BENCH_r5 came back `parsed: null` because the skew section blew
    # past it) — so the skew/stress detail goes to a sidecar file and
    # the FINAL printed line stays compact and parseable. The sidecar
    # is written EVERY run (skew: null when the section was skipped)
    # so a stale skew section can never be attributed to a later run.
    # It carries the FULL timing dict plus the names elided from the
    # printed line (r13 PERF misread the 7 elided-fastest queries as
    # "dropped" — the sidecar now names them so a round-over-round
    # comparison is complete without guessing).
    detail = dict(out)
    detail["queries"] = timings
    detail["queries_elided_names"] = elided_names
    detail["skew"] = skew
    with open(
        os.path.join(os.path.dirname(__file__) or ".",
                     "BENCH_DETAIL.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=1)
    print(line)


if __name__ == "__main__":
    sys.exit(main())
