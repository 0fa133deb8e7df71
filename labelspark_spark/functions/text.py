"""Text-analysis column functions (north-star extension; SURVEY §2.9-16).

All pure ``pyspark.sql.functions`` expressions — JVM-side, inside
whole-stage codegen, no Python on the hot path. Each has an ANSI-SQL
twin in the oracle registry so correctness is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny language-ID stopword profiles (public-knowledge function words).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "las", "de", "y", "que", "en", "un", "una"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine"],
}

EN_STOPWORDS = LANG_PROFILES["en"]

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim: canonical form for
    fingerprinting and dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def whitespace_tokens(col: Column | str) -> Column:
    """Whitespace tokenizer -> array<string> (empty-string safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), "\\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(col))


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count via regexp_count of TOKEN_REGEX."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-gram (shingle) array over the normalized text.

    Built with sequence+transform — stays in codegen, no UDF. NULL
    input propagates as NULL (the sequence/greatest scaffold would
    otherwise emit the 1-element [null] array — r11 review: every
    null doc would share one common 'shingle'). A string shorter than
    ``n`` yields its single truncated shingle — the same short-input
    degradation as the word-shingle builders.
    """
    c = normalize_text(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1))),
        lambda i: F.substring(c, i, n),
    )
    return F.when(c.isNotNull(), grams)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (arrays of n space-joined tokens). NULL
    input propagates as NULL (see char_ngrams)."""
    toks = whitespace_tokens(col)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i + F.lit(1), n), " "),
    )
    return F.when(toks.isNotNull(), shingles)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    sw = stopwords if stopwords is not None else EN_STOPWORDS
    toks = whitespace_tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punct +
    healthy stopword ratio. Deterministic arithmetic only."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    len_ok = (n_tok >= 5) & (n_tok <= 5000)
    punct_ok = punct_ratio(c) < 0.3
    sw = stopword_ratio(c)
    sw_ok = (sw > 0.01) & (sw < 0.7)
    return (
        len_ok.cast("int") * F.lit(0.4)
        + punct_ok.cast("int") * F.lit(0.3)
        + sw_ok.cast("int") * F.lit(0.3)
    )


def _stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    # NB: the lambda must stay single-parameter — PySpark dispatches HOF
    # lambdas on arity, so a bound-default second arg breaks it.
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(stopwords)))


def lang_scores(col: Column | str) -> list[Column]:
    """Per-language stopword hit counts (one column per profile)."""
    toks = whitespace_tokens(col)
    return [
        _stopword_hits(toks, sw).alias(f"score_{lang}") for lang, sw in LANG_PROFILES.items()
    ]


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text — stable across
    engines (DuckDB md5 agrees), used for exact-dup clustering."""
    return F.md5(normalize_text(col))
