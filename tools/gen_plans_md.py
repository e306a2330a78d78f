"""Regenerate PLANS.md — audited physical plans for the key queries.

Usage: python tools/gen_plans_md.py > PLANS.md
Runs each audited query at $SPARK_GRAFT_SF_DIR (default sf0.1) on a
local session and dumps the `explain('formatted')` header tree with the
curated audit note. The mechanical criteria live in
tests/test_plan_lint.py / test_bucketed.py; this file is the
human-readable tour.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query name -> one-line audit note (what the plan must show and why)
AUDITED = {
    "dedup_sorted_neighborhood_pairs": (
        "Sorted-neighborhood ER blocking: the sort is PARTITIONED by "
        "a 2-char block prefix (no single-partition global window), "
        "the w-neighbor join is an EQUI-join on (block, rn+i) after a "
        "bounded 1..w explode — candidates ≤ w·N by construction — "
        "and the Jaccard verify ships candidate ids + shingles only; "
        "the ranked frame and the shingle frame each materialize once "
        "(each feeds two branches)."
    ),
    "graph_label_propagation": (
        "Label propagation: the (order, part) frame materializes once "
        "and only the u<v edge orientation goes through the self-join "
        "+ distinct (the mirror is a projection); round 1 degenerates "
        "to a node-sized min-neighbor aggregation (identity labels + "
        "distinct edges ⇒ every vote has cnt=1 — the r11 shortcut "
        "that removed the one uncompressible edge-sized exchange, sf1 "
        "54-60 s → 24-28 s); rounds 2-3 are one edges⋈labels join "
        "each (AQE broadcasts the label side while it fits), one "
        "partially-aggregated (node, label) vote count, and a "
        "HASH-agg argmax over (cnt, −label) structs — no per-round "
        "sort window. Fixed-width rows; round count data-independent. "
        "r12 (VERDICT item 6, tools/profile_lpa.py stage profile): "
        "lazy localCheckpoints never materialized before the single "
        "final action, so every round re-derived the edge frame from "
        "the full 2 GB base scan (two extra full-input stages at "
        "sf1); checkpoints are now EAGER and the identity labels "
        "derive from the checkpointed pair frame instead of a second "
        "source scan — sf1 36.1 s → 24.1 s same-session, ×/dec 3 at "
        "4.7× (was 5.2×), results identical (exceptAll-verified). "
        "Post-fix profile: the remaining shuffle is one 251 MB edge "
        "exchange + one ~240 MB join exchange per round — data-bound, "
        "inherent to LPA's per-round edges⋈labels join. r13 CLOSING "
        "WORD (VERDICT r12 item 5): the one candidate left — "
        "pre-partitioning the mirrored edge frame by u and eager-"
        "checkpointing it so every round's join side is exchange-free "
        "(checkpoint preserves hashpartitioning; the probe plan "
        "confirms the join drops to ONE exchange, the node-sized "
        "label side) — was A/B-measured at sf0.1: plain 8.7/3.2 s "
        "(cold/warm) vs pre-partitioned 7.0/5.8 s. The asymptotic "
        "trade (pay one edge-frame materialization, save one "
        "edge-sized exchange per subsequent round) only wins at deep "
        "iteration counts or cluster-scale shuffle costs; at 3 "
        "rounds on local[32] the materialization dominates and the "
        "bench would regress. Decision: keep the plain shape, stop "
        "spending on LPA — rounds 2-3's exchange is edge-sized and "
        "irreducible without changing the algorithm (degree-1 "
        "contraction would alter vote counts and thus the certified "
        "labels)."
    ),
    "context_window_packing": (
        "Next-fit sequence packing: ONE FlatMapGroupsInPandas over the "
        "doc_id hash shard key — the greedy walk is per-shard "
        "sequential BY DESIGN (that is how packing parallelizes at "
        "100 TB: one pack per input shard, shard count scaling with "
        "the cluster), and the only shuffle is the shard partition. "
        "No collect, no iteration, no window."
    ),
    "rag_chunk_offsets": (
        "RAG chunking: a pure MAP stage — length filter pushed to the "
        "scan, explode(sequence(...)) for stride starts, offset "
        "arithmetic + substring + md5 inside whole-stage codegen. "
        "ZERO exchanges in the plan; scan parallelism is the plan."
    ),
    "corpus_js_divergence_sources": (
        "JS divergence: one corpus aggregation to the (source, token) "
        "histogram; the pair frame is built by TWO EQUI-joins against "
        "a broadcast source-pair list (never an OR-join that would "
        "plan as a nested loop), the marginal totals broadcast, and "
        "the 9dp-decimal KL terms aggregate per pair. All corpus-"
        "sized exchanges key on token."
    ),
    "mann_whitney_value_drift": (
        "Mann-Whitney U: the corpus collapses to the per-cent-value "
        "histogram in one aggregation; the rank walk's cumulative is "
        "the range-partitioned prefix scan (r12 — PARTITIONED local "
        "windows + a bucket-count-bounded offset broadcast, no "
        "single-partition window over the histogram); DECIMAL(38) "
        "rank sums and the tie correction run on that frame; the z "
        "is one fixed double expression in a 1-row aggregate."
    ),
    "spearman_quantity_price": (
        "Spearman ρ: one aggregation to the JOINT (quantity, "
        "price-cent) histogram; each marginal's rank map is the "
        "range-partitioned prefix scan (r12 — the price-cents "
        "marginal grows to a ~10M domain, so no single-partition "
        "window walks it) joined back (quantity side broadcast); the "
        "five moment sums are DECIMAL(38)-exact and the correlation "
        "is one double expression — no row-level rank window over "
        "the corpus."
    ),
    "decontaminate_embedding_neighbors": (
        "Benchmark decontamination: the pinned ≤200-vector eval slice "
        "collects once (bounded by id construction, not data) and the "
        "train scan runs a BIT-EXACT Arrow-vectorized twin of the "
        "cosine semi-join — dim-sequential accumulation reproduces "
        "the fold's IEEE order, with an all-flagged early exit — so "
        "the plan is ONE ArrowEvalPython scan + one label agg; no "
        "nested-loop join, no corpus shuffle of vectors."
    ),
    "ks_value_drift_report": (
        "KS drift: one corpus aggregation to per-cent-value counts "
        "(bounded by the value DOMAIN); the CDFs are range-partitioned "
        "prefix scans and the totals / |cumA·nB − cumB·nA| arg-max "
        "are 1-row broadcast aggregates (r12 — nothing collapses the "
        "histogram to one task); the day-span midpoint is a 1-row "
        "broadcast. The scan reads (ts, value) only with the "
        "value-not-null filter pushed to parquet."
    ),
    "retrieval_rrf_hybrid_topk": (
        "Hybrid RRF fusion: each arm broadcasts its 1-row query side "
        "(BM25 (N,avgdl) stats / dense query vector) and scans its "
        "table once; the dense arm's top-depth compiles to "
        "TakeOrderedAndProject, ranks attach over depth-bounded rows "
        "only, and the full-outer fusion join is depth×2 rows — the "
        "only corpus-sized work is the two scans."
    ),
    "dedup_containment_pairs": (
        "Asymmetric containment: ONE shuffle keyed by the shingle "
        "(df-capped, so every join key is bounded at max_df² rows), "
        "the intersection aggregates once per unordered pair, and the "
        "two orientations are a union over the SAME aggregated frame "
        "— no second self-join; sizes join back by id only."
    ),
    "tsmatch_topk_windows": (
        "Time-series subsequence search: windows materialize as lead() "
        "columns inside ONE window pass per (user) partition — no "
        "explode, no self-join; the 1-row query window broadcasts and "
        "the distance is integer codegen; TakeOrderedAndProject keeps "
        "k."
    ),
    "dedup_c4_crossdoc_lines": (
        "C4 corpus-wide line rule: one shuffle keyed by the 80-char "
        "line builds the corpus line-frequency table (the artifact "
        "every C4 implementation materializes), one page-keyed agg "
        "computes the strip fractions; both linear, no pair join."
    ),
    "ann_ivfpq_topk": (
        "IVFADC: the coarse-cell assignment and the PQ codes both "
        "evaluate MAP-SIDE from inlined literals (no shuffle until the "
        "ADC top-k), the cell filter prunes the scan to nprobe/n_cells "
        "before any ADC math runs, the ADC top-(refine*k) compiles to "
        "TakeOrderedAndProject, and the exact re-rank reads full "
        "vectors only through a left-semi join on the candidate ids. "
        "Training cost is two jobs total for all 16 subspace codebooks "
        "(pq_codebooks), amortized across queries by the fingerprint-"
        "keyed cache."
    ),
    "bloom_prefilter_join_revenue": (
        "The bloom membership test evaluates INSIDE the fact scan stage "
        "(Filter over Scan, zero exchanges before it — asserted by "
        "test_bloomjoin's exchange-free-plan test); non-candidate rows "
        "never reach the join shuffle. Round 4: positions are native "
        "xxhash64(seed, key) (was md5 hex slices — ~10x cheaper "
        "probes), the bitset is packed executor-side via per-word "
        "bit_or (driver receives <= m_bits/64 longs), the packed array "
        "rides the plan as ONE array<bigint> literal (a 1024-child "
        "CreateArray escaped constant folding), and the build side is "
        "lazily checkpointed so the dim is scanned once. 3.93s -> "
        "~1.9s at sf0.1."
    ),
    "semantic_dedup_stats": (
        "SemDeDup: cluster assignment is MAP-SIDE from inlined "
        "centroid literals; the only data-sized shuffle keys on "
        "(cluster) for the within-cell pair join — cells are the unit "
        "of work, sized by the quantizer (n_cells ~ sqrt(N) at scale), "
        "and AQE splits an oversized cell's partition. The drop set "
        "and the per-cluster accounting shuffle ids only."
    ),
    "bpe_encode_source_stats": (
        "Tokenizer application: the merge list is driver state applied "
        "as chained codegen string replaces over the DISTINCT word "
        "table (vocabulary-sized), which is then BROADCAST — the "
        "corpus-sized pass is explode + map-side hash join + partial "
        "agg; no corpus-volume shuffle anywhere."
    ),
    "bpe_train_merges": (
        "Each merge round is one distributed adjacent-pair aggregation "
        "over the WORD-FREQUENCY table (vocabulary-sized, not corpus-"
        "sized) plus a single-row argmax driver trip; the symbol "
        "rewrite is a map-side string expression, and each round's "
        "frame is checkpointed so the plan never accumulates a tower "
        "of rewrites. The only corpus-wide pass is the initial word "
        "count."
    ),
    "zorder_shard_profile": (
        "The Morton interleave is pure integer bit arithmetic inside "
        "whole-stage codegen (16 shift/and/or terms per dimension); "
        "one hash aggregate on the shard key is the only exchange."
    ),
    "snapshot_diff_events": (
        "One key-equi full-outer SortMergeJoin carrying (event_id, "
        "md5) — 40-byte rows, never payloads; classification and the "
        "count aggregate run on the join output. At 100 TB this is "
        "the canonical CDC diff: shuffle volume is keys+hashes."
    ),
    "dataset_content_digest": (
        "Single scan, map-side md5 + conv, one partial/final aggregate "
        "pair on a commutative decimal sum — no exchange wider than "
        "one row per partition. Row order, partitioning, and engine "
        "cannot change the digest."
    ),
    "weighted_reservoir_sample": (
        "The weight-bounded copy explode and md5 priorities are "
        "map-side; the per-doc MIN aggregates (id, 32-char key) rows "
        "and the global top-k compiles to TakeOrderedAndProject — "
        "never a global sort."
    ),
    "q6_forecast_revenue": (
        "All five predicates pushed to the parquet scan; 4-column "
        "ReadSchema; no join."
    ),
    "q3_top_revenue_orders": (
        "Dims broadcast, single fact shuffle for the agg, "
        "TakeOrderedAndProject top-10 (no global sort)."
    ),
    "sort_topk_orders": (
        "Global top-k compiles to TakeOrderedAndProject: per-partition "
        "heap + k-row gather."
    ),
    "skew_salted_user_counts": (
        "Two-phase salted agg: the (key,salt) exchange spreads hot keys; "
        "second agg reduces S partials/key."
    ),
    "ann_lsh_bucketed_pairs": (
        "Three shuffle-bounded stages: (1) signature pass — 4 bands × 8 "
        "hyperplane dots map-side, explode to (id, band, sig), "
        "materialized ONCE via lazy localCheckpoint (the signature eval "
        "is the dominant cost and the self-join would otherwise run it "
        "on both sides; cluster spelling = persist); (2) per-band "
        "equi-join on (band, sig) + distinct — ids only through the "
        "wide join, never vectors; (3) verify — vectors joined back by "
        "id for the candidate set, exact cosine filter. Plan shows the "
        "band join as a hash join on (band, sig) feeding "
        "HashAggregate(distinct) and two BuildRight joins that attach "
        "(vector, norm) per side; no cross join anywhere. Measured "
        "sf0.1: 4.55s unshared → 3.68s with the shared signature pass."
    ),
    "dedup_jaccard_pairs": (
        "The shingle frame (explode → distinct → window df-cap) feeds "
        "four plan branches (join sides a/b, both size lookups) and is "
        "localCheckpointed once. Inside it: one Exchange for the "
        "set-semantics distinct on (doc_id, sh), one Exchange for the "
        "df window on sh — both irreducible (different keys). The "
        "self-join then shuffles on the capped shingle only; every join "
        "key is bounded to ≤ max_df² = 400 pair rows, so total join "
        "volume is linear in distinct shingles, not quadratic in corpus."
    ),
    "dedup_simhash_pairs": (
        "Fingerprint pass (explode tokens → 60 conditional sums per "
        "doc, one Exchange on doc_id) → Generate (4 band blocks) → "
        "hash join on (band, 15-bit block) → bit_count(xor) filter → "
        "distinct. The join ships (id, 8-byte fp); per-band buckets "
        "are blocks of DIFFERENT positions so hot buckets don't align "
        "across bands, and 2^15 buckets per band keeps candidate mass "
        "~17× below the 8-bit-band form (the r10 sf1 profile fix)."
    ),
    "ngram_novelty_scores": (
        "Shingle frame (rebalanced explode → distinct) is "
        "localCheckpointed once and feeds both branches: the "
        "min(doc_id) aggregation and the join back run on the SAME "
        "sh-keyed shuffle (ReusedExchange), then one doc-keyed count. "
        "Membership-join shape — one row per (doc, shingle), never "
        "pair expansion, so volume is linear in total shingles."
    ),
    "mixture_temperature_resample": (
        "One lang aggregation (map-side partials), two 1-row "
        "broadcasts (decimal sqrt-sum, doc total), a ≤|langs|-row "
        "broadcast join back onto documents, and a map-side md5 per "
        "doc — the only data-sized shuffle is the lang count's "
        "partial-agg exchange."
    ),
    "embedding_dim_variance_topk": (
        "Rebalanced posexplode → 64-group hash aggregate with "
        "map-side partials (three exact decimal moments per dim) → "
        "TakeOrderedAndProject(10). No join, no broadcast; shuffle "
        "is 64 rows × partials."
    ),
    "source_similarity_minhash": (
        "One source-keyed shingle explode (localCheckpointed) feeds "
        "sizes, the sh-keyed self-join, and the per-source minhash "
        "aggregation; every shingle's document frequency is bounded "
        "by the CATALOG-sized source count, so the self-join needs "
        "no df cap — candidate volume ≤ sources × shingle rows, "
        "linear. The signature joins broadcast ≤|sources| rows."
    ),
    "asof_nearest_click_to_purchase": (
        "Two runs of the as-of union trick (one user_id shuffle + "
        "one sort each; running last() window — never a range "
        "probe), merged by an event_id equi-join over purchase-"
        "sized frames. Three shuffles total, all key-partitioned."
    ),
    "t_closeness_report": (
        "One (event_type, hour, sens) aggregation; group totals via "
        "an intra-partition window (≤10 rows per group); a 10-row "
        "broadcast + 1-row total; integer TV numerators with ONE "
        "double division per group; tiny per-type rollup."
    ),
    "decontaminate_ngram_overlap": (
        "Both sides explode 5-grams once (pre-rebalanced scan → "
        "arrays_zip slices → md5, all codegen). The train side "
        "collapses to a DISTINCT hash set BEFORE the join, so the "
        "(g)-keyed shuffle join produces at most one row per eval "
        "n-gram: volume is linear in eval n-grams regardless of "
        "stop-n-gram document frequency — the membership-join shape, "
        "not the pair-join shape, which is why no df cap is needed here."
    ),
    "pack_docs_token_budget": (
        "Single Exchange on lang → in-partition sort by doc_id → "
        "running-sum window → map-side floor-divide. No join, no second "
        "shuffle; output is the input cardinality. At 100 TB the lang "
        "partitions are the shard streams, and the one sort per "
        "partition is the packing order contract."
    ),
    "mixture_equalize_langs": (
        "One Exchange on lang for the row_number window over md5(text) "
        "order, plus a 1-row broadcast of min(lang count) (allowlisted "
        "scalar BroadcastNestedLoopJoin). Content-addressed ranking "
        "makes the sample stable under repartition/rerun/append — "
        "rand() sampling has none of those properties."
    ),
    "dedup_incremental_new_vs_corpus": (
        "Signature pass (shingle explode → 8 min-hash agg, one Exchange "
        "on doc_id) localCheckpointed once, feeding the band explode "
        "and both verify branches. The band join is ASYMMETRIC (new × "
        "corpus): daily ingest cost is O(new × collisions), the corpus "
        "never self-joins. The verify join ships 8 hashes per doc — no "
        "text re-read."
    ),
    "range_join_clicks_before_purchase": (
        "Bucketed range join: plain hash joins on (user_id, bucket); no "
        "BroadcastNestedLoopJoin."
    ),
    "sessionize_user_sessions": (
        "One Exchange total: lag-gap Window, running-sum Window, and the "
        "per-session HashAggregate all reuse the user_id hash "
        "partitioning; one Sort serves both Window nodes."
    ),
    "resample_hourly_ffill": (
        "Per-key grid via sequence+explode (Generate) — no cross join "
        "against a calendar; keyed exchanges only."
    ),
    "asof_last_click_before_purchase": (
        "As-of join as union + running last_value: ONE shuffle + one "
        "sort, no per-row range probe."
    ),
    "fuzzy_name_pairs": (
        "Deletion-neighborhood blocking: Generate (explode) then a "
        "plain hash join on the variant string — the O(n^2) name "
        "comparison never appears as a nested-loop plan."
    ),
    "zscore_orders_per_status": (
        "Group moments reduce map-side then BroadcastExchange back to "
        "the facts: standardization itself is shuffle-free."
    ),
    "funnel_view_click_purchase": (
        "ONE events scan and ONE user_id shuffle (r8 rewrite): per-user "
        "collect_list aggregation, map-side array_min(filter(...)) "
        "stage derivation, a 1-row count aggregate unpivoted into the "
        "three stage rows — no joins, no window, no shared-subtree "
        "re-evaluation."
    ),
    "dedup_exact_substring_spans": (
        "Exact-substring spans (Lee et al.): window volume is LINEAR "
        "in corpus tokens, the hot set is an fp-keyed aggregation "
        "(never a pair join), the count join-back keys on fp, and the "
        "gaps-and-islands merge is a per-doc window sort bounded by "
        "document length."
    ),
    "mixture_dsir_resample": (
        "DSIR keep: map-side hashed features, one bucket-keyed "
        "aggregation, the CONSTANT-size (1024-bucket) weight table "
        "broadcast back, the keep decision a map-side decimal-sum "
        "threshold — no global sort, no collect."
    ),
    "unigram_lm_train": (
        "Viterbi-EM: the corpus-sized work is ONE word-frequency "
        "aggregation; every EM round joins/aggregates the vocab-sized "
        "distinct-word table, with the lattice DP in an Arrow-batched "
        "pandas UDF over integer-scaled log-probs (ArrowEvalPython in "
        "the plan, never BatchEvalPython)."
    ),
    "quality_classifier_scores": (
        "fastText-style inference: ONE feature scan, one per-doc "
        "aggregation, the constant-size weight table broadcast — the "
        "scoring join is BroadcastHashJoin and the keep decision is "
        "map-side."
    ),
    "embedding_power_iteration_pc1": (
        "Power iteration: each round is two linear passes (per-vector "
        "score, per-dimension accumulation) with the direction vector "
        "as a broadcast d-row frame; the only single-row exchange is "
        "the norm scalar. No Gram matrix, no driver collect."
    ),
    "wordpiece_train_merges": (
        "WordPiece: per merge step one pair-count aggregation + one "
        "vocab-sized symbol-count aggregation + a 1-row argmax driver "
        "trip; the likelihood-ratio score is a single IEEE division "
        "of exact integers. Corpus is scanned ONCE (the initial word "
        "count); iterations touch the word-frequency table only."
    ),
    "retrieval_mmr_rerank_topk": (
        "MMR re-rank: the corpus-sized work is ONE first-stage top-k "
        "scan (TakeOrderedAndProject over the broadcast query row); "
        "candidate-candidate sims and the greedy argmax steps operate "
        "on the depth-bounded (20-row) candidate set."
    ),
    "changepoint_cusum_daily_events": (
        "CUSUM: the heavy work is the daily count aggregation; the "
        "prefix-sum walk runs over DAYS (constant-size at any corpus) "
        "in two staged window passes over decimals."
    ),
    "pii_redact_stats": (
        "Regex scrub is pure map-side codegen (Project over the scan, "
        "no UDF, no pre-aggregate shuffle); only the per-source "
        "summary exchanges."
    ),
    "dedup_cc_survivor_map": (
        "Cluster canonicalization (r12): df-capped Jaccard edges feed "
        "the hybrid CC closure (propagation rounds + star contraction "
        "— O(log n) worst case, localCheckpoint lineage cuts); the "
        "survivor election is a PARTITIONED row_number per cluster "
        "(desc n_chars, asc doc_id — no global window) and the final "
        "member→canonical map is an equi-join on cluster_id."
    ),
    "bm25f_topk_docs": (
        "BM25F (r13 single-scan rewrite, ADVICE r12): ONE corpus scan "
        "explodes each doc into its (title, body) slice structs "
        "map-side and the tagged frame is eager-checkpointed before "
        "fanning into stats/tf/N — the old two-projection union read "
        "the source twice; field length L rides the tf group key "
        "(functionally dependent on doc+field), so no lens join; "
        "per-field avg lengths and df broadcast, the weighted-tf "
        "saturation is map-side arithmetic, and TakeOrderedAndProject "
        "keeps the top-k — no vocab-sized window anywhere."
    ),
    "kendall_tau_quantity_discount": (
        "Kendall τ-b (r12): one aggregation to the (quantity × "
        "discount) joint cells — BOTH domains bounded, ≤ ~550 cells — "
        "then a broadcast nested-loop cell-pair fold (≤ 550² "
        "products, constant in the row count) with DECIMAL(38) "
        "concordance sums; tie terms come from the two marginal "
        "aggregates as 1-row broadcasts."
    ),
    "winsorized_mean_price": (
        "Winsorized mean (r12): one aggregation to the price-cents "
        "histogram; the rank walk is the range-partitioned prefix "
        "scan and the P5/P95 cut points + n are 1-row broadcasts; "
        "the clamped mean folds exactly in integers over the "
        "histogram with one double division."
    ),
    "user_longest_streak": (
        "Gaps-and-islands streaks (r12): one distinct (user, day) "
        "aggregation is the only corpus shuffle; the island "
        "derivation is a PARTITIONED per-user window (day − "
        "row_number), then two hash aggregations — parallelism is "
        "the user key space, no global window."
    ),
    "vocab_top_tokens": (
        "Vocabulary ids (r12 rewrite): explode+count is fully "
        "parallel; each count LEVEL's starting id comes from the "
        "range-partitioned prefix scan over the count histogram "
        "(distinct frequencies — far fewer than the vocabulary), and "
        "within-level ids are a PARTITIONED window ordered by token; "
        "same (cnt DESC, token) total order as the old global "
        "row_number, bit-identical ids, no vocab-sized single task."
    ),
    "user_activity_gini": (
        "Activity Gini (r12 rewrite): per-user counts collapse to the "
        "count-of-counts LEVEL histogram (activity-domain-bounded); "
        "the level offsets are the range-partitioned prefix scan and "
        "the closed form n·k·(2s+k−nu) folds in DECIMAL(38) — the "
        "|users|-row global sort is gone."
    ),
    "grouped_value_percentiles": (
        "Grouped percentiles (r12): one aggregation to the (type × "
        "cent-value) histogram; cumulative windows are PARTITIONED by "
        "type (parallelism = type domain) and the P50/P90/P99 picks "
        "are integer ceil-rank CASE folds — no float interpolation, "
        "no global window."
    ),
    "cross_source_span_overlap": (
        "Span fingerprints dedup per source BEFORE the fp equi-join, "
        "so each key appears once per source and fan-out is bounded "
        "by the catalog, not the corpus; per-source totals broadcast."
    ),
    "tdigest_value_quantiles": (
        "t-digest sketch (r13): one aggregation to the value-cents "
        "histogram, EAGER-checkpointed (it feeds the 1-row total AND "
        "the prefix scan — the r13 one-scan rule); centroid ids are "
        "map-side asin arithmetic on the scan's cumulative; the "
        "centroid frame is δ-bounded (≤ 52 rows), so its cumulative "
        "window and the quantile picks are constant-size."
    ),
    "quantile_regression_pinball": (
        "Pinball-loss median regression (r13): ONE corpus scan to the "
        "(quantity, price-cents) JOINT histogram (10× pair "
        "compression at sf1, checkpointed); OLS moments fold from it "
        "exactly; the 11-row candidate grid broadcast expands the "
        "PAIR frame (not the corpus) into per-candidate dollar-"
        "residual histograms; per-candidate medians ride the GROUPED "
        "prefix scan; the 11-row loss frame folds to one row."
    ),
    "langid_trigram_cosine_mix": (
        "Trigram-cosine lang-ID (r13): the explode is map-side "
        "(corpus × doc chars); TWO shuffles total — the (doc, "
        "trigram) count aggregation, then one per-doc fold producing "
        "the norm and all four profile dots as COLUMNS via the "
        "pivoted 44-row broadcast profile; the argmax is column "
        "arithmetic (no per-(doc, lang) exchange), and the final "
        "rollup is language-domain-bounded."
    ),
    "dau_wau_mau_daily": (
        "DAU/WAU/MAU (r13): one corpus distinct to the (day, user) "
        "frame, a 30× constant map-side expansion (each activity day "
        "feeds the 30 report days it can influence), ONE distinct-"
        "aggregate shuffle keyed by the day domain — the per-day "
        "range join COUNT(DISTINCT) cannot ride a window frame on "
        "either engine is gone; no joins at all."
    ),
    "kmv_distinct_users": (
        "KMV bottom-k sketch (r13): one distinct-aggregate over the "
        "hash space, then TakeOrderedAndProject keeps k=256 rows — "
        "the merge-friendly distinct sketch; the exact count the "
        "report compares against is its own single aggregate; 1-row "
        "broadcasts only."
    ),
    "sessionized_funnel_timeout": (
        "Timeout funnel (r13): ONE user-keyed window pass labels "
        "sessions (lag-gap + running sum share an exchange), EAGER-"
        "checkpointed for its four consumers; the three step frames "
        "are co-partitioned (user, session) aggregations chained by "
        "equi-joins; step counters are 1-row broadcasts."
    ),
}

TAIL = """
## Runtime bloom filters (selective shuffle joins)

Not a per-query plan: at production scale the built-in
`spark.sql.optimizer.runtime.bloomFilter.*` rule injects a bloom
filter from a selectively-filtered build side into the probe-side
scan, killing probe rows before the shuffle. Gated by
`applicationSideScanSizeThreshold` (10 GB default) so it never fires
at test scale; `tests/test_runtime_filters.py` lowers the gate and
pins that the rewrite (`might_contain` in the optimized plan) fires
on our join shapes and preserves results.
"""


def main(out=sys.stdout) -> None:
    from pyspark.sql import SparkSession

    from stream_processing_spark.queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("# PLANS — audited physical plans (sf0.1, local)", file=out)
    print(file=out)
    print(
        "Regenerate: `python tools/gen_plans_md.py > PLANS.md`. Each plan\n"
        "is the `explain('formatted')` header tree; the audit criteria\n"
        "live in tests/test_plan_lint.py and tests/test_bucketed.py\n"
        "(mechanically enforced on every run).",
        file=out,
    )
    for name, note in AUDITED.items():
        df = REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        header = buf.getvalue().split("\n\n")[0]
        print(f"\n## {name}\n\n{note}\n\n```\n{header}\n```", file=out)
    print(TAIL, end="", file=out)


if __name__ == "__main__":
    main()
