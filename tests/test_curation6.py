"""Round-8 operators vs brute-force Python references.

The oracle suite (test_oracle_queries.py / the driver gate) proves
fixed-dataset Spark↔DuckDB parity; these tests prove the ALGORITHMS
against independent pure-Python implementations on adversarial
fixtures — planted verbatim repeats for exact-substring dedup,
hand-rolled hashed-n-gram importance weights for DSIR, and an
integer-arithmetic Viterbi-EM reference for unigram-LM training.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _round6(x: float) -> float:
    """Spark F.round / DuckDB ROUND on DOUBLE: HALF_UP at 6dp over the
    shortest decimal repr (JVM BigDecimal.valueOf == Python repr)."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


# --------------------------------------------------------------- ESS

_K = 4  # small k so short random docs exercise merges


def _ess_bruteforce(docs: list[tuple[int, str]], k: int):
    """Reference: mark tokens covered by any k-window whose text occurs
    >= 2 times corpus-wide; per doc, report maximal covered runs."""
    from collections import Counter

    wins = Counter()
    toks = {d: t.split(" ") for d, t in docs}
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            wins[" ".join(t[i : i + k])] += 1
    out = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - k + 1):
            if wins[" ".join(t[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        if not covered:
            continue
        runs = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                runs += 1
            prev = p
        out[d] = (
            runs,
            len(covered),
            len(t),
            _round6(len(covered) / len(t)),
        )
    return out


_words = st.sampled_from(["a", "b", "c", "aa", "x"])
_doc = st.lists(_words, min_size=1, max_size=14).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=8))
@SET
def test_exact_substring_spans_vs_bruteforce(spark, texts):
    from stream_processing_spark.queries.curation6 import (
        exact_substring_spans,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["dup_tokens"],
            r["n_tokens"],
            r["dup_token_frac"],
        )
        for r in exact_substring_spans(df, k=_K).collect()
    }
    assert got == _ess_bruteforce(docs, _K)


def test_exact_substring_planted_repeat(spark):
    """An L-token verbatim repeat (L > k) must merge into ONE maximal
    span covering exactly L tokens in each of the two documents."""
    from stream_processing_spark.queries.curation6 import (
        exact_substring_spans,
    )

    span = "p q r s t u v w x y z"  # 11 unique tokens, no other repeats
    docs = [
        (1, "d1a d1b " + span + " d1c"),
        (2, "d2a " + span + " d2b d2c d2d"),
        (3, "e1 e2 e3 e4 e5 e6 e7 e8 e9"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"])
        for r in exact_substring_spans(df, k=8).collect()
    }
    assert got == {1: (1, 11), 2: (1, 11)}


# -------------------------------------------------------------- DSIR

_B = 1024


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % _B


def _dsir_bruteforce(docs: list[tuple[int, str, str]], target_lang="en"):
    feats = []  # (doc_id, lang, bucket)
    for d, lang, text in docs:
        t = [w for w in text.split(" ") if w]
        grams = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        feats += [(d, lang, _bucket(g)) for g in grams]
    n_raw, n_tgt = {}, {}
    for _, lang, b in feats:
        n_raw[b] = n_raw.get(b, 0) + 1
        if lang == target_lang:
            n_tgt[b] = n_tgt.get(b, 0) + 1
    rt, tt = sum(n_raw.values()), sum(n_tgt.values())
    weights = {
        b: _round6(
            ((n_tgt.get(b, 0) + 1) * (rt + _B)) / ((n_raw[b] + 1) * (tt + _B))
        )
        for b in n_raw
    }
    keep = {}
    for d, _, _ in docs:
        lw = sum(
            int(
                Decimal(repr(_round6(math.log(weights[b])))) * 1_000_000
            )
            for dd, _, b in feats
            if dd == d
        )
        if lw >= 0:
            keep[d] = lw / 1_000_000
    return {b: (n_tgt.get(b, 0), n_raw[b], w) for b, w in weights.items()}, keep


_lang = st.sampled_from(["en", "de"])


@given(
    rows=st.lists(
        st.tuples(_lang, st.lists(_words, min_size=1, max_size=8)),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_dsir_vs_bruteforce(spark, rows):
    from stream_processing_spark.queries.curation6 import (
        dsir_bucket_weights,
        dsir_resample_keep,
    )

    docs = [(i, lang, " ".join(ws)) for i, (lang, ws) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    want_w, want_keep = _dsir_bruteforce(docs)

    got_w = {
        r["bucket"]: (r["n_target"], r["n_raw"], r["weight"])
        for r in dsir_bucket_weights(df).collect()
    }
    assert got_w == want_w

    got_keep = {
        r["doc_id"]: r["log_weight"] for r in dsir_resample_keep(df).collect()
    }
    assert set(got_keep) == set(want_keep)
    for d, lw in want_keep.items():
        assert abs(got_keep[d] - lw) < 1e-9, (d, got_keep[d], lw)


# -------------------------------------------------- unigram-LM train


def _ulm_bruteforce(texts: list[str], rounds=2, max_piece=3, max_word=12):
    """Integer-arithmetic Viterbi-EM reference (log-probs scaled 1e6,
    HALF_UP-rounded — the exact DECIMAL(18,6) the engine uses)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w and len(w) <= max_word:
                words[w] += 1

    def lpi(cnt: int, total: int) -> int:
        return int(
            Decimal(repr(_round6(math.log(cnt / total)))) * 1_000_000
        )

    seed = Counter()
    for w, f in words.items():
        for s in range(len(w)):
            for e in range(s + 1, min(len(w), s + max_piece) + 1):
                seed[w[s:e]] += f
    total = sum(seed.values())
    vocab = {p: (c, lpi(c, total)) for p, c in seed.items()}

    for _ in range(rounds):
        counts = Counter()
        for w, f in words.items():
            L = len(w)
            dp = [None] * (L + 1)
            dp[0] = 0
            for i in range(1, L + 1):
                best = None
                for s in range(max(0, i - max_piece), i):
                    if dp[s] is None or w[s:i] not in vocab:
                        continue
                    c = dp[s] + vocab[w[s:i]][1]
                    if best is None or c > best:
                        best = c
                dp[i] = best
            i = L
            while i > 0:
                for s in range(max(0, i - max_piece), i):
                    if (
                        dp[s] is not None
                        and w[s:i] in vocab
                        and dp[s] + vocab[w[s:i]][1] == dp[i]
                    ):
                        counts[w[s:i]] += f
                        i = s
                        break
                else:  # pragma: no cover
                    raise AssertionError("lattice gap")
        new_counts = {p: counts.get(p, 0) + 1 for p in seed}
        total = sum(new_counts.values())
        vocab = {p: (c, lpi(c, total)) for p, c in new_counts.items()}
    return {p: (c, l / 1_000_000) for p, (c, l) in vocab.items()}


def test_unigram_lm_vs_python_reference(spark):
    from stream_processing_spark.functions.unigram_lm import (
        unigram_lm_train,
    )

    texts = [
        "spark sparse spar park bark",
        "spark park lark dark spark",
        "a ab abc abcd spark",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["piece"]: (r["cnt"], r["logp"])
        for r in unigram_lm_train(df, rounds=2, max_piece=3).collect()
    }
    want = _ulm_bruteforce(texts, rounds=2, max_piece=3)
    assert set(got) == set(want)
    for p, (c, lp) in want.items():
        assert got[p][0] == c, (p, got[p], (c, lp))
        assert abs(got[p][1] - lp) < 1e-9, (p, got[p], (c, lp))


@given(texts=st.lists(_doc, min_size=1, max_size=5))
@SET
def test_unigram_lm_random_vs_reference(spark, texts):
    from stream_processing_spark.functions.unigram_lm import (
        unigram_lm_train,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["piece"]: r["cnt"]
        for r in unigram_lm_train(df, rounds=1, max_piece=2).collect()
    }
    want = {
        p: c
        for p, (c, _) in _ulm_bruteforce(
            texts, rounds=1, max_piece=2
        ).items()
    }
    assert got == want


def _ulm_encode_bruteforce(
    texts: list[str], rounds=2, max_piece=3, max_word=12
) -> dict[str, int]:
    """Encode reference: run the EM reference, then one more Viterbi
    segmentation (smallest-start backtrack = longest-piece tie-break)
    under the final vocab; return {word: n_tokens}."""
    vocab_lp = {
        p: int(Decimal(repr(lp)) * 1_000_000)
        for p, (_c, lp) in _ulm_bruteforce(
            texts, rounds=rounds, max_piece=max_piece, max_word=max_word
        ).items()
    }
    words = set()
    for t in texts:
        for w in t.split(" "):
            if w and len(w) <= max_word:
                words.add(w)
    out = {}
    for w in words:
        L = len(w)
        dp = [None] * (L + 1)
        dp[0] = 0
        for i in range(1, L + 1):
            best = None
            for s in range(max(0, i - max_piece), i):
                if dp[s] is None or w[s:i] not in vocab_lp:
                    continue
                c = dp[s] + vocab_lp[w[s:i]]
                if best is None or c > best:
                    best = c
            dp[i] = best
        n = 0
        i = L
        while i > 0:
            for s in range(max(0, i - max_piece), i):
                if (
                    dp[s] is not None
                    and w[s:i] in vocab_lp
                    and dp[s] + vocab_lp[w[s:i]] == dp[i]
                ):
                    n += 1
                    i = s
                    break
            else:  # pragma: no cover
                raise AssertionError("lattice gap")
        out[w] = n
    return out


@given(texts=st.lists(_doc, min_size=1, max_size=5))
@SET
def test_unigram_encode_random_vs_reference(spark, texts):
    """Property: the encode E-step (tokens per word under the trained
    vocab) matches the pure-Python Viterbi on random corpora."""
    from stream_processing_spark.functions.unigram_lm import (
        unigram_encode_word_tokens,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["w"]: r["n_tok"]
        for r in unigram_encode_word_tokens(
            df, rounds=1, max_piece=2
        ).collect()
    }
    want = _ulm_encode_bruteforce(texts, rounds=1, max_piece=2)
    assert got == want


# ---------------------------------------- quality classifier (fastText)


def _clf_bruteforce(docs, rounds=3, B=256, lr=1.0, target="en"):
    """Pure-Python full-batch logistic regression with the engine's
    exact rounding discipline (6dp weights/sigmoid, 9dp per-occurrence
    gradients, decimal sums)."""

    def r6(x):
        return _round6(x)

    def r9(x):
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000000001"), rounding=ROUND_HALF_UP
            )
        )

    feats = []  # (doc_id, y, bucket)
    for d, lang, text in docs:
        t = [w for w in text.split(" ") if w]
        grams = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        y = 1 if lang == target else 0
        feats += [
            (d, y, int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B)
            for g in grams
        ]
    n_docs = len({d for d, _, _ in feats})
    w = {b: Decimal(0) for _, _, b in feats}
    bias = 0.0
    by_doc = {}
    for d, y, b in feats:
        by_doc.setdefault(d, (y, []))[1].append(b)
    for _ in range(rounds):
        grads = {b: Decimal(0) for b in w}
        bias_grad = Decimal(0)
        for d, (y, bs) in by_doc.items():
            s = r6(bias + float(sum(w[b] for b in bs)) / len(bs))
            p = Decimal(repr(r6(1.0 / (1.0 + math.exp(-s)))))
            r = p - y
            bias_grad += r
            g = Decimal(repr(r9(float(r) / len(bs))))
            for b in bs:
                grads[b] += g
        w = {
            b: Decimal(repr(r6(float(w[b]) - lr * float(grads[b]) / n_docs)))
            for b in w
        }
        bias = r6(bias - lr * float(bias_grad) / n_docs)
    return {b: float(v) for b, v in w.items()}, bias


@given(
    rows=st.lists(
        st.tuples(_lang, st.lists(_words, min_size=1, max_size=8)),
        min_size=2,
        max_size=6,
    )
)
@SET
def test_quality_classifier_vs_bruteforce(spark, rows):
    from stream_processing_spark.queries.curation6 import (
        train_quality_classifier,
    )

    docs = [(i, lang, " ".join(ws)) for i, (lang, ws) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    weights, bias, _ = train_quality_classifier(df, rounds=2)
    got = {
        r["bucket"]: float(r["w"]) for r in weights.collect()
    }
    want_w, want_b = _clf_bruteforce(docs, rounds=2)
    assert got == want_w
    assert abs(bias - want_b) < 1e-12, (bias, want_b)


def test_quality_classifier_learns_separable_fixture(spark):
    """On a linearly separable fixture (disjoint vocabularies per
    class) three rounds must already classify every doc correctly."""
    from stream_processing_spark.queries.curation6 import (
        _clf_features,
        _clf_scores,
        train_quality_classifier,
    )

    docs = [(i, "en", "good clean prose text here") for i in range(8)] + [
        (i + 8, "de", "spam junk noise garbage tokens") for i in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    weights, bias, _ = train_quality_classifier(df, rounds=3)
    scored = _clf_scores(_clf_features(df), weights, bias).collect()
    assert len(scored) == 16
    for r in scored:
        assert (r["score"] >= 0) == (r["y"] == 1), (
            r["doc_id"],
            r["score"],
            r["y"],
        )


# --------------------------------------------------- CUSUM changepoint


def test_cusum_alarm_fires_on_planted_level_shift(spark):
    """A sustained +2.1σ level shift from day 20 must alarm within a
    few days, and the prefix-sum spelling must equal the textbook
    two-sided recursion computed in exact integers. (The pre-shift
    plateau sits 0.707σ BELOW the full-series mean, so the downward
    side correctly accumulates 0.207/day and brushes h=4 once at day
    20 — the corrected virtual-P_0 recursion keeps that alarm; the
    pre-r9 spelling missed it.)"""
    daily = [100] * 20 + [160] * 10
    got = _cusum_got(spark, daily)
    want = _cusum_reference(daily)
    assert got == want
    # upward side quiet through the plateau, alarming from day 25
    assert all(g[0] == 0 for g in got[:20])
    assert all(g[2] == 1 for g in got[24:])


def _cusum_events_fixture(spark, daily: list[int]) -> str:
    """Write an events.parquet whose per-day counts equal ``daily``."""
    import datetime
    import os
    import tempfile

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for d, n in enumerate(daily):
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=d, seconds=i), 1,
                 "view", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp(prefix="cusum_fx_")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def _cusum_reference(daily: list[int]) -> list[tuple[int, int, int]]:
    """Textbook two-sided CUSUM recursion over the same 6dp z-scores in
    scaled-integer arithmetic (virtual S_0 = 0): per day
    (s_hi, s_lo, alarm) scaled 1e6."""
    n = len(daily)
    mu = sum(daily) / n
    sigma = math.sqrt(
        (sum(x * x for x in daily) - sum(daily) * sum(daily) / n) / n
    )
    k = 500_000
    h = 4_000_000
    s_hi = s_lo = 0
    out = []
    for x in daily:
        z = 0 if sigma == 0 else int(
            Decimal(repr(_round6((x - mu) / sigma))) * 1_000_000
        )
        s_hi = max(0, s_hi + z - k)
        s_lo = max(0, s_lo - z - k)
        out.append((s_hi, s_lo, 1 if s_hi > h or s_lo > h else 0))
    return out


def _cusum_got(spark, daily: list[int]) -> list[tuple[int, int, int]]:
    from stream_processing_spark.queries.curation6 import (
        changepoint_cusum_daily_events,
    )

    d = _cusum_events_fixture(spark, daily)
    rows = sorted(
        changepoint_cusum_daily_events(spark, d).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == len(daily)
    return [
        (
            int(Decimal(repr(r["s_hi"])) * 1_000_000),
            int(Decimal(repr(r["s_lo"])) * 1_000_000),
            r["alarm"],
        )
        for r in rows
    ]


def test_cusum_day1_spike(spark):
    """A series whose anomaly starts at the FIRST row: the virtual
    P_0 = 0 term must participate in the running extremum, else s_hi
    is zero everywhere and the alarm is missed (ADVICE r8, high)."""
    daily = [500, 90, 110, 95, 105, 100, 100, 98, 102, 100]
    got = _cusum_got(spark, daily)
    want = _cusum_reference(daily)
    assert got == want
    # the day-1 spike must register immediately (z_1 ≈ 2.85σ → S_1 > 0)
    assert got[0][0] > 0, got[0]


def test_cusum_flat_series_no_alarm(spark):
    """Constant daily counts → sigma = 0; the NULLIF guard must emit
    z = 0 and no alarm instead of NaN-propagating (ADVICE r8, low)."""
    got = _cusum_got(spark, [100] * 8)
    assert all(g == (0, 0, 0) for g in got), got


@given(
    daily=st.lists(st.integers(min_value=1, max_value=400),
                   min_size=2, max_size=24)
)
@SET
def test_cusum_recursion_parity_random(spark, daily):
    """Property: the prefix-sum spelling equals the textbook recursion
    on RANDOM daily-count series, both sides and the alarm bit
    (VERDICT r8 item 6)."""
    assert _cusum_got(spark, daily) == _cusum_reference(daily)
