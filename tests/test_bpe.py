"""BPE training parity vs an independent pure-Python reference
implementing the canonical left-to-right scan merge, plus unit coverage
of the doubled-gap merge rewrite's overlap semantics."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import bpe

SF = "/root/testdata/sf0.001"


def _py_bpe(word_freq: dict[str, int], n_merges: int):
    """Canonical BPE: scan-merge, argmax with (count desc, a, b)."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, c))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents")
    words = [
        w
        for r in docs.select("text").collect()
        for w in r.text.split(" ")
        if w
    ]
    expect = _py_bpe(Counter(words), n_merges=6)
    got = bpe.bpe_train(docs, n_merges=6)
    assert got == expect, (got, expect)


def test_merge_expr_overlap_semantics(spark):
    # 'a b a b' must become 'ab ab' (both pairs merge), 'a a a' with
    # pair (a,a) must become 'aa a' (left-to-right non-overlapping)
    cases = [
        ("a b a b", "a", "b", "ab ab"),
        ("a a a", "a", "a", "aa a"),
        ("b a b", "a", "b", "b ab"),
        ("x a b x", "a", "b", "x ab x"),
        ("a b", "a", "b", "ab"),
        ("c d", "a", "b", "c d"),
        ("a", "a", "b", "a"),
    ]
    df = spark.createDataFrame(
        [(r, a, b, want) for r, a, b, want in cases],
        "repr string, a string, b string, want string",
    )
    for r, a, b, want in cases:
        got = (
            df.filter((F.col("repr") == r) & (F.col("want") == want))
            .select(bpe.merge_pair_expr(F.col("repr"), a, b).alias("m"))
            .head()["m"]
        )
        assert got == want, (r, a, b, got, want)


def _py_wordpiece(word_freq: dict[str, int], n_merges: int):
    """Canonical WordPiece: same scan-merge, argmax by likelihood
    ratio c_ab / (c_a * c_b) with (score desc, a, b) tie-break."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        syms_count: Counter = Counter()
        for syms, f in vocab.items():
            for s in syms:
                syms_count[s] += f
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(),
            key=lambda kv: (
                -(kv[1] / (syms_count[kv[0][0]] * syms_count[kv[0][1]])),
                kv[0][0],
                kv[0][1],
            ),
        )
        score = c / (syms_count[a] * syms_count[b])
        merges.append((step, a, b, c, round(score, 9)))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_wordpiece_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents")
    words = [
        w
        for r in docs.select(F.split("text", " ").alias("t")).collect()
        for w in r["t"]
        if w
    ]
    wf = dict(Counter(words))
    want = _py_wordpiece(wf, 6)
    got = [
        (s, a, b, c, round(sc, 9))
        for s, a, b, c, sc in bpe.wordpiece_train(docs, n_merges=6)
    ]
    assert got == want


def _py_greedy_stats(
    texts: list[tuple[str, str]], merges, max_word: int
) -> dict[str, tuple[int, int, int]]:
    """Reference greedy longest-match-first encode: vocab = chars +
    merge outputs; per source (n_words, n_tokens, n_chars)."""
    pieces = sorted({a + b for _s, a, b, _c, _sc in merges})
    lens = sorted({len(p) for p in pieces}, reverse=True)

    def n_tok(w: str) -> int:
        pos, n = 0, 0
        while pos < len(w):
            step = 1
            for pl in lens:
                sub = w[pos : pos + pl]
                if len(sub) == pl and sub in pieces and pl > step:
                    step = pl
                    break  # lens descending: first hit is longest
            pos += step
            n += 1
        return n

    out: dict[str, tuple[int, int, int]] = {}
    for source, text in texts:
        for w in text.split(" "):
            if not w or len(w) > max_word:
                continue
            a, b, c = out.get(source, (0, 0, 0))
            out[source] = (a + 1, b + n_tok(w), c + len(w))
    return out


def test_wordpiece_greedy_encode_vs_bruteforce(spark, tmp_path):
    """End-to-end wordpiece_encode_source_stats (train + greedy walk +
    per-source accounting) vs a pure-Python reference, on a fixture
    where multi-char pieces overlap ('abc' vs 'ab') so longest-match
    order matters."""
    import os

    from stream_processing_spark.queries.scale_ops import (
        _WP_MAX_WORD,
        wordpiece_encode_source_stats,
    )

    texts = [
        ("web", "abab abc ab a qz qzqz"),
        ("web", "abcabc qz ab ba cab"),
        ("books", "zq qz abba cab abc abcd"),
        ("books", "a b c q z aaaa " + "ab" * 10),  # 20 chars > cap 16
    ]
    df = spark.createDataFrame(
        [(i, "en", t, s) for i, (s, t) in enumerate(texts)],
        "doc_id long, lang string, text string, source string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        r["source"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in wordpiece_encode_source_stats(
            spark, str(tmp_path)
        ).collect()
    }
    words = Counter(
        w for _s, t in texts for w in t.split(" ") if w
    )
    merges = _py_wordpiece(dict(words), 5)
    want = _py_greedy_stats(texts, merges, _WP_MAX_WORD)
    assert got == want


def test_wordpiece_diverges_from_bpe_on_frequency_vs_likelihood(spark):
    """A pair can be the most FREQUENT without being the most
    LIKELIHOOD-lifting (its symbols are themselves frequent) — the two
    criteria must pick different first merges on this fixture."""
    rows = (
        [("aa bb",)] * 10          # 'a a' / 'b b' pairs: frequent symbols
        + [("qz",)] * 3            # q,z occur ONLY together: max lift
    )
    docs = spark.createDataFrame(rows, "text string")
    first_bpe = bpe.bpe_train(docs, n_merges=1)[0]
    first_wp = bpe.wordpiece_train(docs, n_merges=1)[0]
    assert (first_bpe[1], first_bpe[2]) == ("a", "a")
    assert (first_wp[1], first_wp[2]) == ("q", "z")
