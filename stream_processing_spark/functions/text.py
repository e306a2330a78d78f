"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting.

All of it is native Catalyst expressions (JVM, codegen) — no Python in
the hot path. At 100 TB these run as a single pass over the text column
with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# marker words per language for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count_ws(col: str | Column = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe_ish(col: str | Column = "text") -> Column:
    """Count of BPE-ish regex tokens — a cheap proxy for tokenizer cost."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH))


def stopword_ratio(col: str | Column = "text", stopwords=STOPWORDS) -> Column:
    toks = tokens(col)
    sw = F.filter(toks, lambda t: t.isin(*stopwords))
    return F.round(F.size(sw) * F.lit(1.0) / F.size(toks), 6)


def avg_token_len(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.length(F.replace(c, F.lit(" "), F.lit(""))) * F.lit(1.0) / F.size(tokens(col)),
        6,
    )


def _isin_lambda(markers: tuple[str, ...]):
    # one-arg lambda for F.filter: Spark's higher-order-function binding
    # passes one Column per lambda parameter, so markers must be a closure
    return lambda t: t.isin(*markers)


def lang_scores(col: str | Column = "text") -> dict[str, Column]:
    """Marker-word hit count per language."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _isin_lambda(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_guess(col: str | Column = "text") -> Column:
    """Deterministic argmax over marker-word counts (ties broken by the
    fixed language order en→de→fr→es; 'unk' when nothing matches)."""
    scores = lang_scores(col)
    best = None
    best_lang = F.lit("unk")
    # fold right-to-left so earlier languages win ties
    for lang in reversed(list(scores)):
        s = scores[lang]
        if best is None:
            best = s
            best_lang = F.when(s > 0, F.lit(lang)).otherwise(F.lit("unk"))
        else:
            best_lang = F.when((s > 0) & (s >= best), F.lit(lang)).otherwise(best_lang)
            best = F.when(s >= best, s).otherwise(best)
    return best_lang


def fingerprint_md5(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def fingerprint_normalized(col: str | Column = "text") -> Column:
    """md5 of whitespace-normalized, lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(c, r"\s+", " ")))


def quality_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass quality scoring frame."""
    return df.select(
        id_col,
        F.length(text_col).alias("n_chars_calc"),
        token_count_ws(text_col).alias("n_tokens"),
        avg_token_len(text_col).alias("avg_token_len"),
        stopword_ratio(text_col).alias("stopword_ratio"),
    )
