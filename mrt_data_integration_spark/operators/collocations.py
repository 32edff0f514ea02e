"""PMI collocation extraction — corpus-level term-term co-occurrence
scoring (Church & Hanks 1990; the phrase-detection statistic behind
word2vec's phraser, Mikolov et al. 2013): rank ordered word pairs
(w1 before w2, within ``window`` tokens) by pointwise mutual
information between the pair distribution and the unigram
distributions.

The engine's other text statistics are doc-term (TF-IDF, BM25, quality
features); this is the TERM-TERM surface — collocations, multiword
expressions, tokenizer-merge candidates — a standard corpus-analysis
pass over a training corpus.

Scale shape: pair generation is a map-side array expression (slide the
token array against itself per offset — no self-join, no shuffle of
doc bodies); pair and unigram counts are partial-agg hash aggregates
keyed on words (counts shuffle, bodies never do); the ``min_count``
floor prunes the pair tail BEFORE the two unigram joins (Zipf: the
overwhelming majority of distinct pairs are hapax — at web scale the
floor cuts the join input by orders of magnitude); ranking is a global
TakeOrdered(k). Totals ride 1-row broadcasts (the DSIR pattern).

Cross-engine determinism: PMI combines logs of INTEGER counts only —
each ln rounds to 12 decimals before combining and the score to 6
(the engine's log discipline), ties break on (w1, w2).

Reference basis: the reference repo has no text surface; this extends
SURVEY.md §2 E5 alongside TF-IDF / BM25 / the BPE trainer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.cache_registry import attach_cache, track_cache
from mrt_data_integration_spark.operators.text import tokens


def _ln12(x: Column) -> Column:
    return F.round(F.log(x), 12)


def word_pairs(
    df: DataFrame, text_col: str = "text", window: int = 2
) -> DataFrame:
    """One row per ordered co-occurrence (w1, w2): w1 precedes w2 by
    1..``window`` positions. Pure map-side: per offset j the token
    array zips against itself shifted by j —
    ``arrays_zip(slice(toks, 1, n−j), slice(toks, j+1, n−j))`` — all
    codegen-friendly built-ins evaluating the tokenizer a CONSTANT
    number of times per row. The first draft built the same pairs with
    ``transform(sequence(1, n−j), i -> struct(element_at(toks, i),
    ...))``; lambda HOFs run interpreted and re-evaluate the ``toks``
    sub-expression per element, turning the tokenizer O(n²) per doc —
    measured 9.8 s vs 1.7 s for the zip form on the same single-split
    sf0.1 scan (the k-means assignment-kernel lesson again: measure
    the expression form, don't assume). ``slice`` length clamps at 0
    (``greatest``) so docs shorter than the offset contribute nothing;
    NULL texts contribute nothing."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = tokens(text_col)
    sz = F.size(toks)

    def pairs_at(j: int) -> Column:
        ln = F.greatest(sz - F.lit(j), F.lit(0))
        return F.arrays_zip(
            F.slice(toks, 1, ln).alias("w1"),
            F.slice(toks, F.lit(j + 1), ln).alias("w2"),
        )

    all_pairs = F.flatten(
        F.array(*[pairs_at(j) for j in range(1, window + 1)])
    )
    return df.select(F.explode(all_pairs).alias("__p__")).select(
        F.col("__p__.w1").alias("w1"), F.col("__p__.w2").alias("w2")
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n_pair, n_w1, n_w2, pmi) for every ordered pair with
    ``n_pair >= min_count``:

        pmi = [ln n_pair − ln N_pairs] − [ln n_w1 − ln N_words]
                                       − [ln n_w2 − ln N_words]

    i.e. ln( p(w1,w2) / (p(w1)·p(w2)) ) with the pair probability under
    the windowed co-occurrence distribution and the unigram
    probabilities under the token distribution. Positive ⇒ the words
    attract (collocation); 0 ⇒ independence. Each ln rounds to 12
    before combining; pmi rounds to 6. The caller ranks/limits (total
    order on (pmi DESC, w1, w2) is engine-independent)."""
    pair_counts = (
        word_pairs(df, text_col, window)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        # the Zipf tail dies HERE, before anything joins
        .filter(F.col("n_pair") >= int(min_count))
    )
    # three consumers (both sides of the pair join + the mass total):
    # persist the vocab-bounded counts so the corpus-wide token explode
    # runs once (the DSIR two-consumer-lineage discipline)
    uni = track_cache(
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .persist()
    )
    # full pair mass: Σ_docs Σ_j max(n_tokens − j, 0) — a closed form
    # over token counts, ONE cheap scan instead of re-aggregating the
    # exploded pairs (and exact even after the min_count prune, which
    # must NOT shrink the denominator)
    sz = F.size(tokens(text_col))
    mass = F.lit(0)
    for j in range(1, window + 1):
        mass = mass + F.greatest(sz - F.lit(j), F.lit(0))
    tot_p = df.agg(F.sum(mass).cast("long").alias("np"))
    tot_w = uni.agg(F.sum("n_w").alias("nw"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    scored = (
        pair_counts.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot_p))  # 1 row: map-side constant
        .crossJoin(F.broadcast(tot_w))  # 1 row: map-side constant
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.round(
                (_ln12(F.col("n_pair")) - _ln12(F.col("np")))
                - (_ln12(F.col("n_w1")) - _ln12(F.col("nw")))
                - (_ln12(F.col("n_w2")) - _ln12(F.col("nw"))),
                6,
            ).alias("pmi"),
        )
    )
    return attach_cache(scored, [uni])
