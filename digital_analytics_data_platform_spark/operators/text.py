"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All hot-path logic is built-in column functions (codegen'd); nothing
here needs Python per row. The reference's text surface is the AI-
extraction workflow's page-level text rows
(``workflows/01_competitive_offers_ai_extraction/notebooks/01_Notebook_v8.ipynb``);
these operators generalize that to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic. Deliberately small: the operator's job is the
# Spark shape (vectorized scoring + argmax), not lexicography.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por", "con", "para"],
}

_WORD_RE = r"[\p{L}]+"
# BPE-ish tokenization: letter runs, digit runs, or single non-space symbols
_TOKEN_RE = r"[\p{L}]+|[0-9]+|[^\s\p{L}0-9]"


def token_count(text: Column | str, *, pattern: str = _TOKEN_RE) -> Column:
    """Token count under a BPE-ish regex (letters / digits / symbol
    singletons); whitespace token count is ``size(split(text, '\\s+'))``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(pattern))


def whitespace_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+"))


def lang_scores(text: Column | str) -> list[tuple[str, Column]]:
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    out = []
    for lang, words in _LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out.append((lang, F.regexp_count(lowered, F.lit(pat))))
    return out


def language_id(text: Column | str, *, min_hits: int = 1) -> Column:
    """Stopword-marker language heuristic: argmax of per-language
    marker-hit counts, 'und' (undetermined) when nothing matches.
    Vectorized: one regexp_count per language, a greatest() argmax —
    no UDF, no shuffle."""
    scores = lang_scores(text)
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reverse order so earlier languages win ties deterministically
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best >= min_hits), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, word stats, punctuation /
    uppercase / digit / whitespace ratios, stopword ratio, mean word
    length — the standard pre-training quality filter inputs."""
    c = F.col(text_col)
    n_chars = F.length(c)
    words = F.regexp_count(c, F.lit(_WORD_RE))
    en_stop = F.regexp_count(F.lower(c), F.lit(r"\b(" + "|".join(_LANG_MARKERS["en"]) + r")\b"))
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        words.alias("q_words"),
        F.try_divide(F.regexp_count(c, F.lit(r"[\p{Punct}]")), n_chars).alias("q_punct_ratio"),
        F.try_divide(F.regexp_count(c, F.lit(r"[A-Z]")), n_chars).alias("q_upper_ratio"),
        F.try_divide(F.regexp_count(c, F.lit(r"[0-9]")), n_chars).alias("q_digit_ratio"),
        F.try_divide(en_stop, words).alias("q_stopword_ratio"),
        F.try_divide(n_chars, words).alias("q_mean_word_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the features — monotone in
    stopword density, penalizing extreme punctuation/digit ratios and
    very short docs."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.lit(1.0), F.col("q_words") / F.lit(20.0)) * F.lit(0.4)
        + F.least(F.lit(1.0), F.coalesce(F.col("q_stopword_ratio"), F.lit(0.0)) * F.lit(5.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(F.lit(1.0), F.coalesce(F.col("q_punct_ratio"), F.lit(0.0)) * F.lit(4.0))) * F.lit(0.15)
        + (F.lit(1.0) - F.least(F.lit(1.0), F.coalesce(F.col("q_digit_ratio"), F.lit(0.0)) * F.lit(4.0))) * F.lit(0.15)
    )
    return feats.withColumn("q_score", F.round(score, 6))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace, strip punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\p{L}0-9\s]", " "), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic 64-bit content fingerprint of the normalized text
    (the content-hash manifest analog, ``01_Notebook_v8.ipynb:215``)."""
    return F.xxhash64(normalize_text(text))


def shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles of the normalized text as an array<string>
    (input to minhash / n-gram Jaccard)."""
    c = normalize_text(text)
    words = F.split(c, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )
