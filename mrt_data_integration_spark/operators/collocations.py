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


def ppmi_vectors(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 2,
    top_contexts: int | None = None,
) -> DataFrame:
    """Sparse PPMI context vectors — the count-based distributional
    word representation (positive pointwise mutual information over a
    symmetric co-occurrence window; Church & Hanks 1990, surveyed as
    the strong count baseline in Levy, Goldberg & Dagan 2015): one row
    per (w, c) with PPMI > 0,

        ppmi = max over nothing — simply ln n_wc + ln N − ln n_w −
        ln n_c (each ln rounded 12, the engine's log discipline),
        rounded 6, kept only when positive,

    where the marginals and total are those of the min_count-PRUNED
    symmetric co-occurrence matrix (the consistent-universe convention
    the capped dedup metrics use: marginals and cells see the same
    matrix). ``top_contexts`` keeps each word's strongest k contexts
    (ppmi DESC, c tie-break) — the sparsity knob that bounds every
    downstream vector operation.

    Scale shape: co-occurrence generation is :func:`word_pairs`' pure
    map-side slide (bodies never shuffle), symmetrized by a union
    before ONE (w, c) hash aggregate; marginals are a w-grain
    aggregate of the vocab-bounded matrix; the total rides a 1-row
    broadcast; the optional top-k is a per-word window over that
    word's contexts (vocab-bounded partitions)."""
    ordered = word_pairs(df, text_col, window)
    cooc = (
        ordered.select(F.col("w1").alias("w"), F.col("w2").alias("c"))
        .unionByName(
            ordered.select(F.col("w2").alias("w"), F.col("w1").alias("c"))
        )
        .groupBy("w", "c")
        .agg(F.count(F.lit(1)).alias("n_wc"))
        .filter(F.col("n_wc") >= int(min_count))
    )
    # three consumers (marginals, total, the cells themselves): persist
    # the vocab²-bounded matrix so the corpus-wide pair explode runs
    # once (the pmi_collocations discipline). Deliberately LAZY: the
    # marginal/total consumers are broadcast builds that sequence the
    # scans; a 5-pair eager A/B read consistently worse (opt r14).
    cooc = track_cache(cooc.persist())
    marg = cooc.groupBy("w").agg(F.sum("n_wc").cast("long").alias("n_w"))
    tot = cooc.agg(F.sum("n_wc").cast("long").alias("n_t"))
    mc = marg.select(F.col("w").alias("c"), F.col("n_w").alias("n_c"))
    vec = (
        cooc.join(marg, "w")
        .join(mc, "c")
        .crossJoin(F.broadcast(tot))  # 1 row: map-side constant
        .select(
            "w",
            "c",
            "n_wc",
            F.round(
                _ln12(F.col("n_wc"))
                + _ln12(F.col("n_t"))
                - _ln12(F.col("n_w"))
                - _ln12(F.col("n_c")),
                6,
            ).alias("ppmi"),
        )
        .filter(F.col("ppmi") > 0)
    )
    if top_contexts is not None:
        from pyspark.sql import Window

        w_rank = Window.partitionBy("w").orderBy(
            F.desc("ppmi"), F.asc("c")
        )
        vec = (
            vec.withColumn("__r__", F.row_number().over(w_rank))
            .filter(F.col("__r__") <= int(top_contexts))
            .drop("__r__")
        )
    return attach_cache(vec, [cooc])


def ppmi_word_similarity(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 2,
    threshold: float = 0.2,
    top_contexts: int | None = None,
    max_context_df: int | None = None,
) -> DataFrame:
    """Distributional word-word similarity: cosine between sparse PPMI
    context vectors, computed ENTIRELY as distributed sparse linear
    algebra — no dense matrix, no driver-side vocabulary. One row per
    unordered word pair (w1 < w2) with cosine ≥ ``threshold``:
    (w1, w2, n_shared, cosine), cosine rounded 6.

    Scale shape: the dot products come from a CONTEXT-keyed equi-join
    of the sparse rows (the inverted-index form of a sparse
    matrix-matrix product — pairs exist only where a context is
    shared), so the join's fan-out per context is |words sharing it|²;
    ``top_contexts`` (per-word sparsification) and ``max_context_df``
    (drop contexts shared by more than that many words — the
    containment family's df cap, THE fan-out control for this join)
    bound it at corpus scale. Both float reductions are order-pinned:
    each pair's dot and each word's squared norm fold SEQUENTIALLY
    over context-sorted arrays (the zipf/token_diversity discipline),
    and cosine = dot / (√n2₁ · √n2₂) is single float ops after.

    The probability space is the min_count-pruned matrix and, under
    ``max_context_df``, similarities see the capped context universe
    (norms and dots both — the same-universe convention)."""
    vec = ppmi_vectors(df, text_col, window, min_count, top_contexts)
    # capture the persisted deps NOW — the joins below return new
    # frames that do not carry the __graft_cached__ attribute
    cached = list(getattr(vec, "__graft_cached__", ()))
    if max_context_df is not None:
        hot = (
            vec.groupBy("c")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > int(max_context_df))
            .select("c")
        )
        vec = vec.join(F.broadcast(hot), "c", "left_anti")
    # three consumers below (norms + both join sides): persist the
    # vocab-bounded PPMI cells so the marginal joins behind them run
    # once, not three times (opt r14 — the idf_cosine_topk discipline;
    # together with the norm hoist below: 48 jobs -> 20 measured at
    # bench scale, same 301 rows); lazy — the norms broadcast build
    # sequences the three scans (eager A/B'd worse, opt r14)
    vec = track_cache(vec.persist())
    cached.append(vec)
    # order-pinned squared norms: fold ppmi² in context order per word
    sq = F.sort_array(
        F.collect_list(F.struct(F.col("c"), (F.col("ppmi") * F.col("ppmi")).alias("p2")))
    )
    n2 = F.aggregate(
        sq, F.lit(0.0), lambda a, e: a + e["p2"]
    )
    norms = vec.groupBy("w").agg(n2.alias("n2"))
    # attach the (doc-grain, vocab-bounded) norms to the join INPUTS —
    # the similarity family's hoist-norms convention (opt r14, the
    # idf_cosine_topk 289aa90 precedent): cosine is then computable
    # inside the pair aggregate, so the two post-aggregate joins that
    # pushed the full pair-grain frame through two more exchanges are
    # gone. Same n2 doubles, same rounding — output identical.
    vec_n = vec.join(norms, "w")
    a = vec_n.select(
        F.col("w").alias("w1"),
        F.col("c"),
        F.col("ppmi").alias("p1"),
        F.col("n2").alias("n2_1"),
    )
    b = vec_n.select(
        F.col("w").alias("w2"),
        F.col("c"),
        F.col("ppmi").alias("p2"),
        F.col("n2").alias("n2_2"),
    )
    prods = (
        a.join(b, "c")
        .filter(F.col("w1") < F.col("w2"))
        .select(
            "w1",
            "w2",
            F.col("c"),
            (F.col("p1") * F.col("p2")).alias("prod"),
            "n2_1",
            "n2_2",
        )
    )
    # order-pinned dots: fold the shared-context products in c order
    dp = F.sort_array(
        F.collect_list(F.struct(F.col("c"), F.col("prod")))
    )
    cos = F.round(
        F.col("dot") / (F.sqrt(F.col("n2_1")) * F.sqrt(F.col("n2_2"))), 6
    )
    dots = prods.groupBy("w1", "w2").agg(
        F.aggregate(dp, F.lit(0.0), lambda acc, e: acc + e["prod"]).alias(
            "dot"
        ),
        F.count(F.lit(1)).alias("n_shared"),
        F.first("n2_1").alias("n2_1"),
        F.first("n2_2").alias("n2_2"),
    )
    out = dots.select("w1", "w2", "n_shared", cos.alias("cosine")).filter(
        F.col("cosine") >= F.lit(float(threshold))
    )
    return attach_cache(out, cached)
