"""Distributed BPE tokenizer training (SURVEY.md §2.9 E5+ — learn the
merge table, not just apply a fixed one; reference has no tokenizer
surface at all, cf. its fixed token regex analogue in
scripts/data-processing.R:1-40 which only splits columns).

Byte-pair encoding training (Sennrich 2016, "Neural Machine Translation
of Rare Words with Subword Units" — public algorithm) is the standard
LLM-tokenizer construction: repeatedly merge the most frequent adjacent
symbol pair. The scalable form never iterates over the corpus — it
iterates over the WORD-FREQUENCY table:

1. ONE corpus scan aggregates ``(word, count)``. Zipf compression makes
   this table orders of magnitude smaller than the corpus (100 TB of
   text → at most a few 10^8 distinct words, a few GB), and it is the
   sufficient statistic for every subsequent round.
2. Each merge round is a small distributed job over that cached table:
   explode adjacent symbol pairs (weighted by word count), aggregate,
   and collect ONLY the argmax pair — an O(1)-row collect per round,
   legitimate iterative control flow (same pattern as the k-means
   driver loop in operators/similarity.py). The merge is then applied
   as a map-only literal string replace; no shuffle.

Symbol-string representation: a word is its characters joined by single
spaces plus a final ``</w>`` end-of-word marker symbol (the classic
encoding — symbols never contain spaces, so a merge of pair (l, r) is
the literal replacement of ``" l r "`` with ``" lr "`` on the
space-padded string). Replacement semantics are LEFT-TO-RIGHT
NON-OVERLAPPING applied TWICE per round: a single pass consumes the
boundary space of a run ("a a a a" → "aa a a"), a second pass converges
runs up to length 4 exactly like the canonical greedy scan; longer
same-symbol runs may tokenize slightly differently from the canonical
implementation, but both TRAINING and ENCODING here use the identical
rule, so the tokenizer is self-consistent — and the rule is plain
``replace``, available verbatim in any SQL engine (the DuckDB oracle
replays the whole training loop with the same primitive).

Determinism: pair counts are exact integer sums; ties break on
(count DESC, left ASC, right ASC) under binary string order — identical
across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORD_MARKER = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """One-scan ``(word, cnt)`` aggregation — the sufficient statistic
    for BPE training. Tokenization is the engine's shared whitespace
    rule (operators.text.tokens), so the trainer splits words exactly
    like every other E5 operator; empty tokens dropped."""
    from mrt_data_integration_spark.operators.text import tokens

    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        docs.select(F.explode(tokens(col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word_col) -> "F.Column":
    # "hello" -> "h e l l o </w>": one space between every character
    # ('.' is safe — words contain no whitespace), then the marker.
    return F.concat(
        F.trim(F.regexp_replace(word_col, "(.)", "$1 ")),
        F.lit(" " + WORD_MARKER),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair totals over the symbol strings, weighted by word
    count. Map + partial-agg; the result is at most O(vocab²) but in
    practice O(distinct adjacent pairs) — small."""
    syms = F.split(F.col("s"), " ")
    pairs = F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("cnt").alias("total"))
    )


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    # Literal replace (F.replace with lit args — no regex quoting
    # hazards whatever characters the corpus contains), two passes on
    # the space-padded string; see module docstring for the run
    # semantics. Map-only: no shuffle per round.
    pat, rep = F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
    padded = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
    return words.withColumn(
        "s", F.trim(F.replace(F.replace(padded, pat, rep), pat, rep))
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_count: int = 2,
    return_state: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns a DataFrame ``(rank int, left, right, merged, pair_count)``
    — the merge table IS the trained tokenizer (O(n_merges) rows, built
    on the driver from one argmax row per round; the corpus-scale work
    stays distributed). Stops early if no pair reaches
    ``min_pair_count``.

    With ``return_state=True`` also returns the final symbol table
    ``(s, cnt)`` — which IS the training corpus encoded under the
    learned merges (the trainer already computed it; re-encoding from
    scratch would pay the corpus scan and every merge pass a second
    time). The state DataFrame is handed over still cached; the caller
    owns its lifetime (evicted → recomputes through lineage, one scan).
    """
    spark = docs.sparkSession
    cur = word_frequencies(docs, text_col, lowercase).select(
        _initial_symbols(F.col("word")).alias("s"), "cnt"
    )
    cur = cur.cache()
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            # ONE job per round: this argmax action also materializes
            # cur's cache (it is cur's first action), after which the
            # predecessor cache — needed only to build cur — can go.
            top = (
                _pair_counts(cur)
                .orderBy(F.desc("total"), "left", "right")
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0]["total"] < min_pair_count:
                break
            l, r, total = top[0]["left"], top[0]["right"], int(top[0]["total"])
            merges.append((rank, l, r, l + r, total))
            prev, cur = cur, _apply_merge(cur, l, r).cache()
    except BaseException:
        cur.unpersist()  # error path: never leak the state cache
        raise
    finally:
        if prev is not None:
            prev.unpersist()
    if not return_state:
        cur.unpersist()
    merges_df = spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, pair_count bigint",
    )
    return (merges_df, cur) if return_state else merges_df


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge table to a word table carrying initial
    symbol strings in ``s`` — merges in rank order, same replace rule as
    training, map-only. By induction the training corpus re-encodes to
    exactly the trainer's final symbol table (pinned in tests)."""
    for left, right in merges:
        words = _apply_merge(words, left, right)
    return words


def token_frequencies(encoded_words: DataFrame) -> DataFrame:
    """Corpus token frequencies under a learned tokenizer: explode the
    encoded symbol strings, weight by word count. One partial-agg
    shuffle on the token key; the input is the (already tiny)
    word-frequency table, never the corpus."""
    return (
        encoded_words.select(
            F.explode(F.split(F.col("s"), " ")).alias("token"), "cnt"
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("n_occurrences"))
    )
