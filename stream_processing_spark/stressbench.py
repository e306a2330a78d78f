"""Run the dedup/ANN/sessionize/media tiers against the adversarial
fixtures from stressgen and measure that every scale guard HOLDS —
turning the 100 TB bucket-bound claims from plan-reading into numbers.

What "holds" means, per tier:

- n-gram Jaccard: the df=corpus-size boilerplate shingles are dropped by
  ``max_df`` — the join completes in seconds (uncapped, ONE such shingle
  is |docs|² ≈ 2.5e9 join rows) AND the planted near-dup pairs are still
  found (recall ≥ 0.9: near-dups are identified by their RARE shingles,
  which the cap keeps).
- MinHash-LSH: stop-shingles are df-capped BEFORE hashing (else every
  doc's min-hash collapses to the same boilerplate shingle and one band
  bucket holds the whole corpus); ``max_bucket`` backstops the join.
- SimHash: byte-bucket cap bounds the pigeonhole join under fingerprint
  saturation.
- banded sign-LSH ANN: 85 % of vectors share one direction → one
  mega-bucket per band (≈ 2.9e8 candidate pairs per band uncapped);
  ``max_bucket`` drops it while the planted near-dup pairs in the
  spread region survive in their small buckets (recall ≥ 0.9).
- sessionize / salted counts: a 30 %-hot user key; per-key serialization
  is inherent to sessionization, salting spreads the count shuffle.
- media thumbnails: 256 KB blob skew through the Arrow/numpy stage.

Used by bench.py (full sizes, reported under the "skew" key of the
bench JSON line) and tests/test_stress_skew.py (mini sizes, assertions).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_spark import stressgen
from stream_processing_spark.functions import dedup, multimodal, similarity
from stream_processing_spark.metrics import execute_with_shuffle_metrics
from stream_processing_spark.operators.sessionize import with_sessions
from stream_processing_spark.operators.skew import salted_count_by

# caps used across the stress tiers (documented defaults, not tuning)
MAX_DF = 20
MAX_BUCKET_DOCS = 2_000
MAX_BUCKET_SIMHASH = 2_500
MAX_BUCKET_ANN = 1_000

# shuffle-byte ceilings per INPUT row (~1.5-3x headroom over the
# numbers measured at BOTH fixture scales: mini 2k docs and full 50k
# docs). These assert the linear-shuffle design directly in bytes:
# every tier's exchanges must ship a bounded CONSTANT per input row —
# an uncapped quadratic blowup (e.g. one stop-shingle joining |docs|²
# pairs ≈ tens of GB even at mini scale) blows the ceiling by orders
# of magnitude. The per-row constants decompose as:
# - minhash_lsh: one df-cap pass over distinct (shingle, doc) pairs
#   (~1.7 KB/doc at ~35 tokens) + the banded candidate join's output,
#   itself capped at 20 pairs/doc × ~0.2 KB — ~5.3 KB/doc measured at
#   full scale; ceiling 8 KB.
# - phash: 4 bands × (id, 16-bit band value) + capped candidate pairs
#   (~0.8 KB/blob full scale).
# - media_thumbnails: payloads average ~1.5 KB/blob (256 KB hot tail);
#   the ~56 B/blob measured proves the BLOBS never cross a shuffle —
#   only extracted features do.
SHUFFLE_BYTES_PER_ROW = {
    "jaccard_capped": ("documents", 300),
    "minhash_lsh_capped": ("documents", 8_000),
    "simhash_capped": ("documents", 600),
    "ann_banded_capped": ("embeddings", 100),
    "sessionize_hot_user": ("events", 64),
    "salted_counts": ("events", 32),
    "media_thumbnails": ("media", 400),
    "phash_pairs_capped": ("media", 2_000),
}


def _recall(pairs: DataFrame, planted: set[tuple[int, int]], a: str, b: str) -> float:
    spark = pairs.sparkSession
    want = spark.createDataFrame(sorted(planted), f"{a} long, {b} long")
    hit = pairs.join(want, [a, b], "inner").count()
    return hit / len(planted)


def fixture_stats(spark: SparkSession, paths: dict[str, str]) -> dict:
    """Prove the fixture is actually hostile (these are the numbers the
    guards must survive), cheaply: three small aggregations."""
    ev = spark.read.parquet(paths["events_skew"])
    top_user = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    docs = spark.read.parquet(paths["documents_skew"])
    max_df = (
        dedup.shingles(docs, n=3)
        .groupBy("sh")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    emb = spark.read.parquet(paths["embeddings_skew"])
    planes = similarity._hyperplanes(stressgen.EMB_DIM, 8, seed=42)
    hot_bucket = (
        emb.select(
            similarity.signature_col("embedding", planes).alias("sig")
        )
        .groupBy("sig")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    return {
        "n_events": ev.count(),
        "top_user_rows": int(top_user["count"]),
        "n_docs": docs.count(),
        "max_shingle_df": int(max_df),
        "n_vectors": emb.count(),
        "hot_lsh_bucket": int(hot_bucket),
    }


def run_stress(
    spark: SparkSession,
    root: str = stressgen.DEFAULT_ROOT,
    sizes: dict | None = None,
) -> dict:
    """Generate-if-needed, run every tier, return the measurement dict."""
    sizes = sizes or stressgen.FULL
    t0 = time.perf_counter()
    paths = stressgen.ensure_stress_data(spark, root, sizes)
    gen_sec = round(time.perf_counter() - t0, 3)

    docs = spark.read.parquet(paths["documents_skew"])
    emb = spark.read.parquet(paths["embeddings_skew"])
    ev = spark.read.parquet(paths["events_skew"])
    media = spark.read.parquet(paths["media_skew"])
    doc_pairs = stressgen.planted_doc_pairs(sizes["documents"])
    vec_pairs = stressgen.planted_vec_pairs(sizes["embeddings"])

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    recall: dict[str, float] = {}
    shuffle: dict[str, dict] = {}

    def timed(name: str, df: DataFrame) -> DataFrame:
        # one JVM-side execution yields the row count AND the shuffle
        # bytes the tier's exchanges actually wrote (metrics.py) — the
        # byte ceilings in bounds_ok are asserted on these numbers
        t = time.perf_counter()
        m = execute_with_shuffle_metrics(df)
        timings[name] = round(time.perf_counter() - t, 3)
        counts[name] = m["rows"]
        shuffle[name] = {
            "bytes_written": m["shuffle_bytes_written"],
            "records_written": m["shuffle_records_written"],
        }
        return df

    # 1. df-capped exact Jaccard over stop-shingle-saturated docs
    sh = dedup.shingles(docs, n=3)
    jac = timed(
        "jaccard_capped", dedup.jaccard_pairs(sh, threshold=0.7, max_df=MAX_DF)
    )
    recall["jaccard"] = _recall(jac, doc_pairs, "doc_a", "doc_b")

    # 2. MinHash-LSH with df-capped shingles + bucket cap (distinct
    # shingles so df means document frequency, then the stop-shingle cap)
    capped = dedup.cap_document_frequency(dedup.shingles(docs, n=3), MAX_DF)
    sigs = dedup.minhash_signatures(capped, k=8)
    mh = timed(
        "minhash_lsh_capped",
        dedup.lsh_candidate_pairs(
            sigs, bands=4, rows_per_band=2, max_bucket=MAX_BUCKET_DOCS
        ),
    )
    recall["minhash_lsh"] = _recall(mh, doc_pairs, "doc_a", "doc_b")

    # 3. SimHash pigeonhole join under fingerprint saturation (the
    # production 60-bit/15-bit-band shape, same as the registry query)
    fp = dedup.simhash60(docs)
    timed(
        "simhash_capped",
        dedup.simhash_pairs(
            fp, max_hamming=3, max_bucket=MAX_BUCKET_SIMHASH, fp_bits=60
        ),
    )

    # 4. banded sign-LSH ANN under mode collapse
    ann = timed(
        "ann_banded_capped",
        similarity.lsh_banded_pairs(
            emb,
            threshold=0.98,
            dim=stressgen.EMB_DIM,
            bands=4,
            rows_per_band=8,
            max_bucket=MAX_BUCKET_ANN,
        ),
    )
    recall["ann_banded"] = _recall(ann, vec_pairs, "id_a", "id_b")

    # 5. sessionize across a 30%-hot key (per-key serialization is the
    # stress: one user's events all sort inside one task)
    sess = with_sessions(
        ev, "user_id", "ts", gap_seconds=1800, order_cols=["ts", "event_id"]
    )
    timed(
        "sessionize_hot_user",
        sess.groupBy("user_id").agg(F.max("session_seq").alias("n_sessions")),
    )

    # 6. salted count vs the straggler-prone plain groupBy
    timed("salted_counts", salted_count_by(ev, "user_id"))

    # 7. blob-skewed media through the Arrow/numpy thumbnail stage
    timed("media_thumbnails", multimodal.thumbnail_features(media))

    # 8. pHash near-dup over the SAME skewed blobs: the hostile case is
    # the 256 B majority payloads, which rasterize near-identically and
    # collapse into shared phash band buckets — max_bucket keeps the
    # Hamming join from going quadratic, same guard as the LSH tiers.
    # Recall ground truth: media_skew plants brightness-shifted pairs
    # (+1 on every byte), which pHash must map to Hamming ≤ radius
    # (brightness only moves the DC coefficient).
    ph = timed(
        "phash_pairs_capped",
        multimodal.phash_hamming_pairs(
            multimodal.image_phash(media), radius=3, max_bucket=200
        ),
    )
    recall["phash"] = _recall(
        ph, stressgen.planted_img_pairs(sizes["media"]), "id_a", "id_b"
    )

    # 9. connected components on a PLANTED CHAIN — the adversarial
    # graph for min-label propagation (diameter = n). The hybrid
    # closure (operators/graph.py: propagation → contracted large-star/
    # small-star) must converge in O(log n) driver rounds, asserted
    # against switch_after + log2(n) + 4.
    import math

    from stream_processing_spark.operators.graph import (
        _AUTO_SWITCH_AFTER,
        connected_components,
    )

    chain_n = max(4096, sizes["events"] // 8)
    chain = spark.range(chain_n - 1).selectExpr("id AS src", "id + 1 AS dst")
    cc_stats: dict = {}
    t = time.perf_counter()
    cc = connected_components(chain, stats=cc_stats)
    agg = cc.selectExpr(
        "count(*) AS n", "count(distinct component) AS c"
    ).head()
    timings["cc_chain"] = round(time.perf_counter() - t, 3)
    counts["cc_chain"] = int(agg["n"])
    cc_rounds_bound = _AUTO_SWITCH_AFTER + int(math.log2(chain_n)) + 4
    cc_ok = (
        int(agg["c"]) == 1
        and int(agg["n"]) == chain_n
        and cc_stats["rounds"] <= cc_rounds_bound
    )
    cc_section = {
        "rounds": cc_stats["rounds"],
        "rounds_bound": cc_rounds_bound,
        "chain_n": chain_n,
    }

    bounds_ok = (
        cc_ok
        and recall["jaccard"] >= 0.9
        and recall["minhash_lsh"] >= 0.9
        and recall["ann_banded"] >= 0.9
        and recall["phash"] >= 0.9
        # capped candidate sets must stay linear-ish in corpus size, not
        # quadratic: a generous 20x factor vs corpus size
        and counts["minhash_lsh_capped"] <= 20 * sizes["documents"]
        and counts["ann_banded_capped"] <= 20 * sizes["embeddings"]
        and counts["simhash_capped"] <= 20 * sizes["documents"]
        and counts["phash_pairs_capped"] <= 20 * sizes["media"]
        # shuffle volume stays linear with the documented per-row
        # constants — the byte-level form of "ids-only shuffle"
        and all(
            shuffle[q]["bytes_written"] <= per_row * sizes[tbl]
            for q, (tbl, per_row) in SHUFFLE_BYTES_PER_ROW.items()
        )
    )
    return {
        "gen_sec": gen_sec,
        "sizes": sizes,
        "fixture": fixture_stats(spark, paths),
        "queries": timings,
        "counts": counts,
        "shuffle": shuffle,
        "cc": cc_section,
        "recall": {k: round(v, 4) for k, v in recall.items()},
        "bounds_ok": bounds_ok,
    }
