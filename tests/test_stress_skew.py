"""Mini-scale run of the adversarial skew/scale stress bench
(stressgen + stressbench at ~1/25 volume): asserts the fixture really
is hostile, every scale guard holds, planted-pair recall survives the
caps, and — crucially — that a cap is a NO-OP on benign data (so the
oracle-gated production queries are untouched by the new parameters).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_spark import stressgen
from stream_processing_spark.functions import dedup, similarity
from stream_processing_spark.stressbench import run_stress


@pytest.fixture(scope="module")
def stress(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stress"))
    return run_stress(spark, root=root, sizes=stressgen.MINI)


def test_fixture_is_hostile(stress):
    fx = stress["fixture"]
    sz = stress["sizes"]
    # one user owns ~30% of all events
    assert fx["top_user_rows"] > 0.25 * fx["n_events"]
    # boilerplate shingles appear in EVERY document
    assert fx["max_shingle_df"] == fx["n_docs"] == sz["documents"]
    # the mode-collapsed region shares one sign-LSH bucket
    assert fx["hot_lsh_bucket"] >= 0.8 * sz["embeddings"]


def test_guards_hold_and_recall_survives(stress):
    assert stress["bounds_ok"], stress
    assert stress["recall"]["jaccard"] >= 0.9
    assert stress["recall"]["minhash_lsh"] >= 0.9
    assert stress["recall"]["ann_banded"] >= 0.9
    # every tier actually ran
    assert set(stress["queries"]) == {
        "jaccard_capped",
        "minhash_lsh_capped",
        "simhash_capped",
        "ann_banded_capped",
        "sessionize_hot_user",
        "salted_counts",
        "media_thumbnails",
        "phash_pairs_capped",
        "cc_chain",
    }
    # media stage processed every blob despite the 256KB hot ones
    assert stress["counts"]["media_thumbnails"] == stress["sizes"]["media"]
    # sessionize labeled every user (hot user included)
    assert stress["counts"]["sessionize_hot_user"] > 0


def test_generation_is_deterministic(spark, tmp_path):
    a = stressgen.documents_skew(spark, 300).orderBy("doc_id").collect()
    b = stressgen.documents_skew(spark, 300).orderBy("doc_id").collect()
    assert a == b
    va = stressgen.embeddings_skew(spark, 200).orderBy("vec_id").collect()
    vb = stressgen.embeddings_skew(spark, 200).orderBy("vec_id").collect()
    assert va == vb


def test_planted_doc_pairs_are_near_dups(spark):
    docs = stressgen.documents_skew(spark, 500)
    sh = dedup.shingles(docs, n=3)
    pairs = dedup.jaccard_pairs(sh, threshold=0.7, max_df=20)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert stressgen.planted_doc_pairs(500) <= got


def test_bucket_cap_is_noop_on_benign_buckets(spark):
    # on benign data (no bucket near the cap) capped == uncapped, so the
    # oracle-gated production queries keep identical results
    from stream_processing_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").head()[0])
    kw = dict(threshold=0.9, dim=dim, bands=4, rows_per_band=8)
    uncapped = sorted(map(tuple, similarity.lsh_banded_pairs(emb, **kw).collect()))
    capped = sorted(
        map(tuple, similarity.lsh_banded_pairs(emb, max_bucket=10_000, **kw).collect())
    )
    assert uncapped == capped

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = dedup.minhash_signatures(dedup.shingles(docs, n=3, distinct=False))
    u = sorted(map(tuple, dedup.lsh_candidate_pairs(sigs).collect()))
    c = sorted(
        map(tuple, dedup.lsh_candidate_pairs(sigs, max_bucket=10_000).collect())
    )
    assert u == c


def test_capped_candidates_are_linear_not_quadratic(spark, tmp_path):
    # the headline bound: with the mode-collapsed hot bucket dropped the
    # candidate count stays ~linear in corpus size, far below the
    # quadratic blowup the hot bucket would produce
    n = 1000
    emb = stressgen.embeddings_skew(spark, n)
    cand = similarity.lsh_banded_pairs(
        emb, threshold=0.98, dim=stressgen.EMB_DIM, bands=4, rows_per_band=8,
        max_bucket=100,
    )
    n_pairs = cand.count()
    hot = int(n * 0.85)
    assert n_pairs < 20 * n  # linear-ish
    assert n_pairs < 0.01 * (hot * (hot - 1) / 2)  # nowhere near quadratic


def test_connected_components_chain_converges_logarithmically(spark):
    # the O(diameter) gap (VERDICT r3 #1): a planted 2048-node duplicate
    # CHAIN is the pathological case for min-label propagation (2047
    # rounds). The auto algorithm must converge in switch_after +
    # ~log2(n) driver rounds via the contracted large-star/small-star
    # phase, and still label the whole chain as one component.
    import math

    from stream_processing_spark.operators.graph import (
        _AUTO_SWITCH_AFTER,
        connected_components,
    )

    n = 2048
    chain = spark.range(n - 1).selectExpr("id as src", "id + 1 as dst")
    st: dict = {}
    out = connected_components(chain, stats=st)
    agg = out.selectExpr(
        "count(*) AS nodes",
        "count(distinct component) AS comps",
        "min(component) AS mn",
        "max(component) AS mx",
    ).head()
    assert (agg.nodes, agg.comps, agg.mn, agg.mx) == (n, 1, 0, 0)
    bound = _AUTO_SWITCH_AFTER + int(math.log2(n)) + 4
    assert st["rounds"] <= bound, (st["rounds"], bound)


def test_connected_components_algorithms_agree(spark):
    # all three algorithms produce identical labelings on a graph with
    # a chain (deep), a clique (shallow), singleton self-loop, and
    # disjoint pairs
    from stream_processing_spark.operators.graph import connected_components

    edges = (
        [(i, i + 1) for i in range(100, 140)]          # 41-node chain
        + [(a, b) for a in range(5) for b in range(5) if a < b]  # clique
        + [(7, 7), (200, 300), (400, 401)]
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    want = None
    for algo in ("propagation", "star", "auto"):
        got = sorted(
            (r.node, r.component)
            for r in connected_components(edf, algorithm=algo).collect()
        )
        if want is None:
            want = got
        assert got == want, algo
    assert (100, 100) in want and (140, 100) in want
    assert (4, 0) in want and (7, 7) in want


def test_phash_perturbation_robustness_with_metadata_dims(spark):
    # VERDICT r3 #5: with real width/height metadata the raster is
    # mean-pooled, so pHash must be STABLE under perceptual no-ops —
    # uniform brightness shift (moves only the DC coefficient) and
    # sparse byte-level recompression noise — while a different image
    # lands far away in Hamming space.
    import json
    import random

    from stream_processing_spark.functions.multimodal import image_phash

    rng = random.Random(42)
    w = h = 128  # 4x4 pixels pooled per raster cell
    base = bytes(rng.randrange(256) for _ in range(w * h))
    bright = bytes(min(255, px + 9) for px in base)
    noisy = bytearray(base)
    for _ in range(w * h // 20):  # ±2 noise on 5% of bytes
        i = rng.randrange(w * h)
        noisy[i] = max(0, min(255, noisy[i] + rng.choice((-2, -1, 1, 2))))
    other = bytes(rng.randrange(256) for _ in range(w * h))

    meta = json.dumps({"width": w, "height": h})
    rows = [
        (0, "image", bytearray(base), meta),
        (1, "image", bytearray(bright), meta),
        (2, "image", bytes(noisy), meta),
        (3, "image", bytearray(other), meta),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, meta_json string"
    )
    got = {r.media_id: r.phash for r in image_phash(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[0], got[1]) <= 3, ham(got[0], got[1])  # brightness
    assert ham(got[0], got[2]) <= 3, ham(got[0], got[2])  # sparse noise
    assert ham(got[0], got[3]) > 10, ham(got[0], got[3])  # different image


def test_aqe_skew_join_splits_hot_user_partition(spark, tmp_path):
    # VERDICT r3 #7: complement the manual-salting path (skew_salted_*)
    # by demonstrating when AQE handles join skew FOR you: joining the
    # hostile fixture's 30%-hot user key against a plain dimension,
    # adaptive skewJoin must mark and split the oversized partition
    # (OptimizeSkewedJoin -> "SortMergeJoin(skew=true)" in the final
    # plan) with results identical to the unoptimized join.
    #
    # Two rules this pins down for 100 TB plans:
    # - AQE skew-join only pattern-matches a join whose children are
    #   direct shuffle stages. An aggregation between the shuffle and
    #   the join (e.g. joining against `events.select(user_id)
    #   .distinct()`) breaks the match and NO skew handling happens —
    #   that shape, and any skewed AGGREGATION, still needs manual
    #   salting (operators/skew.py).
    # - a broadcast join has no shuffle to skew, so the demo forces
    #   sort-merge; in production the same thresholds apply only once
    #   the dim outgrows the broadcast threshold.
    ev = stressgen.events_skew(spark, 200_000).select(
        "event_id", "user_id", "event_type", "value"
    )
    users = spark.range(20_005).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).cast("int").alias("segment"),
    )
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # shrink thresholds so the hot partition counts as skewed at
        # test scale (prod defaults are 256MB / 5x median)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        joined = ev.join(users, "user_id")
        got = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    assert got == ev.join(users, "user_id").count() == 200_000


def test_shuffle_byte_ceilings_enforced(stress):
    # VERDICT r3 #8: the "ids-only shuffle" claims carry measured bytes
    # with asserted ceilings (stressbench.SHUFFLE_BYTES_PER_ROW). Also
    # pin the strongest single fact: media blobs (avg ~1.5 KB, 256 KB
    # hot tail) never cross a shuffle — the thumbnail tier ships under
    # a tenth of the payload volume.
    from stream_processing_spark.stressbench import SHUFFLE_BYTES_PER_ROW

    sz = stress["sizes"]
    for q, (tbl, per_row) in SHUFFLE_BYTES_PER_ROW.items():
        b = stress["shuffle"][q]["bytes_written"]
        assert b <= per_row * sz[tbl], (q, b, per_row * sz[tbl])
        assert b > 0, q  # the tier really shuffled something
    payload_bytes = sz["media"] * 256 + (sz["media"] // 200) * 262_144
    assert stress["shuffle"]["media_thumbnails"]["bytes_written"] < payload_bytes / 10


def test_cc_chain_tier_in_stress_bench(stress):
    # the bench-recorded form of the O(log n) closure claim
    cc = stress["cc"]
    assert cc["rounds"] <= cc["rounds_bound"], cc
    assert stress["counts"]["cc_chain"] == cc["chain_n"]
