"""Benchmark decontamination + n-gram repetition — two training-data
pipeline operators (extensions beyond the reference, alongside
operators/dedup.py; cf. Gopher §A1.1 repetition filters, Rae et al.
2021, and the n-gram eval-overlap decontamination of GPT-3 appendix C /
Llama reports).

Everything is JVM-side array/string expressions except nothing — no
Python UDFs anywhere; hashes are MD5 (bit-identical across engines, so
DuckDB oracles can replay them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.dedup import _spread
from mrt_data_integration_spark.operators.text import tokens


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def word_ngrams(text: Column | str, n: int) -> Column:
    """Array of ALL n-word grams (space-joined, duplicates kept —
    unlike ``dedup.word_shingles`` which is distinct'd for set
    semantics). Empty array when the doc has fewer than n tokens."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_repetition(text: Column | str, n: int = 2) -> Column:
    """Duplicate n-gram fraction: 1 − |distinct grams| / |grams| — the
    Gopher-style within-document repetition signal at n-gram (not just
    token) granularity. NULL when the doc has fewer than n tokens (no
    gram universe to measure)."""
    grams = word_ngrams(text, n)
    return F.when(
        F.size(grams) > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
    ).otherwise(F.lit(None).cast("double"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_col: str = "contaminated",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing ≥1 word n-gram with ANY benchmark doc
    (test-set leakage removal before training).

    Scale shape: both sides explode to (id, md5(gram)) — fixed-width
    hashes, never the gram strings, cross the wire; the benchmark side
    is distinct'd (eval sets are small → broadcast by default, making
    the contamination check a map-side semi-join with ZERO shuffle of
    the corpus). Contaminated doc_ids (a tiny set) then broadcast back
    onto the corpus, so document bodies never shuffle at any scale.
    Set ``broadcast_benchmark=False`` for corpus-vs-corpus runs; the
    semi-join then shuffles (id, hash) pairs only.
    """
    c_grams = _spread(corpus).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(word_ngrams(text_col, ngram_n), F.md5)
            )
        ).alias("__gh__"),
    )
    b_grams = benchmark.select(
        F.explode(
            F.array_distinct(
                F.transform(word_ngrams(text_col, ngram_n), F.md5)
            )
        ).alias("__gh__")
    ).distinct()
    if broadcast_benchmark:
        b_grams = F.broadcast(b_grams)
    hits = (
        c_grams.join(b_grams, "__gh__", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit__", F.lit(True))
    )
    flagged = corpus.join(F.broadcast(hits), id_col, "left")
    return flagged.withColumn(
        flag_col, F.coalesce(F.col("__hit__"), F.lit(False))
    ).drop("__hit__")
