"""Text-analysis operators for a training-data pipeline (SURVEY.md §2.9
E5): tokenization, quality scoring, language-ID heuristic, fingerprinting.

Everything is built from JVM-side array/string expressions (split,
transform, filter, md5) — no Python UDFs, so the hot path stays inside
whole-stage codegen and scales linearly with input bytes. All hashes are
MD5-based because MD5 is bit-identical across engines (oracle-checkable),
unlike engine-native ``hash()``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(_c(text), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count_no_spaces(text: Column | str) -> Column:
    return F.length(F.regexp_replace(_c(text), r"\s+", ""))


def avg_token_length(text: Column | str) -> Column:
    return char_count_no_spaces(text).cast("double") / token_count(text)


def stopword_ratio(
    text: Column | str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    """Fraction of tokens that are stopwords — a quality signal."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: length band + stopword presence +
    token-length sanity. Deterministic arithmetic (oracle-checkable)."""
    n_tok = token_count(text).cast("double")
    swr = stopword_ratio(text)
    atl = avg_token_length(text)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 5000), 1.0).otherwise(0.0)
    sw_ok = F.when((swr >= 0.01) & (swr <= 0.6), 1.0).otherwise(0.0)
    atl_ok = F.when((atl >= 2.0) & (atl <= 12.0), 1.0).otherwise(0.0)
    return (length_ok + sw_ok + atl_ok) / F.lit(3.0)


def lang_id_heuristic(
    text: Column | str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    """Stopword-density language ID: 'en' if common-English-token density
    clears a threshold, else 'other'. (Real n-gram models plug in the
    same column slot.)"""
    return F.when(stopword_ratio(text, stopwords) >= 0.02, F.lit("en")).otherwise(
        F.lit("other")
    )


def fingerprint(text: Column | str) -> Column:
    """Canonical-form document fingerprint: lowercase, collapse
    whitespace, md5. Engine-portable (md5 is md5 everywhere)."""
    canon = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return F.md5(canon)


def dup_token_fraction(text: Column | str) -> Column:
    """1 − |distinct tokens| / |tokens| — Gopher-style repetition signal
    (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1:
    repetitious documents are low-quality training data)."""
    toks = tokens(text)
    return 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def symbol_ratio(text: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-whitespace characters — the
    symbol-to-char Gopher filter."""
    t = _c(text)
    return (
        F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).cast("double")
        / F.length(t)
    )


def gopher_quality_pass(
    text: Column | str,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_token_frac: float = 0.6,
    max_symbol_ratio: float = 0.1,
) -> Column:
    """1 when a document passes all Gopher-style quality gates (token
    count band, mean word length band, repetition cap, symbol cap),
    else 0. Pure codegen expressions — at corpus scale this is a
    map-only pass over the text bytes."""
    n_tok = token_count(text)
    mwl = avg_token_length(text)
    return (
        F.when(
            n_tok.between(min_tokens, max_tokens)
            & mwl.between(min_mean_word_len, max_mean_word_len)
            & (dup_token_fraction(text) < max_dup_token_frac)
            & (symbol_ratio(text) < max_symbol_ratio),
            1,
        )
        .otherwise(0)
    )
