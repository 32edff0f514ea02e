"""Idf-weighted shingle-cosine document similarity (SURVEY.md §2.9,
E3/E4 extension — the WEIGHTED complement of the set-overlap dedup
metrics).

Where ``ngram_jaccard_pairs`` treats every shared shingle equally and
``containment_pairs`` asymmetrically, this family weights each shingle
by its corpus rarity — idf = ln((1+N)/(1+df)) (the smoothed-idf
convention of ``tfidf_top_terms``) — and ranks, for every document,
its k nearest neighbors by cosine between the idf-weighted shingle
indicator vectors:

    cos(A, B) = Σ_{s∈A∩B} idf(s)² / ( √Σ_{s∈A} idf(s)² · √Σ_{s∈B} idf(s)² )

idf weighting is the SMOOTH alternative to the hard ``max_shingle_df``
cap for boilerplate control: a near-ubiquitous shingle ("all rights
reserved") contributes ~0 weight instead of being dropped at an
arbitrary threshold, so two documents agreeing only on boilerplate
rank near the bottom while two documents sharing rare content rank at
the top — exactly the distinction unweighted Jaccard cannot make (the
separation is pinned in tests/test_docsim.py).

Scale design (the ngram_jaccard/ppmi discipline):
- Documents shuffle as (md5-prefix shingle key, id) longs/short hex —
  bodies never shuffle (dedup.py's key discipline).
- df rides a count window over the shingle key — the SAME Exchange the
  inverted-index self-join needs, so attaching weights costs no extra
  shuffle (the n_sh-window precedent in ngram_jaccard_pairs).
- The pair join is the inverted-index sparse matrix product: fan-out
  per shingle is df², bounded by Σ df² overall; ``max_shingle_df``
  remains available as the HARD production fan-out control on top of
  the smooth idf downweighting (capped mode documented below).
- Both float reductions (per-doc squared norms, per-pair dots) fold
  SEQUENTIALLY over shingle-key-sorted arrays — bit-deterministic
  regardless of partitioning (the zipf/token_diversity discipline).
- Per-anchor ranking is a row_number window over the ROUNDED cosine
  (round 6) with the neighbor id as total-order tie-break, so the
  top-k frontier is engine-independent.

Reference parity: the reference engine ships no document-similarity
operator (its surface is the MRT estimator suite,
eastonhuch/mrt-data-integration methods/); this family belongs to the
mandated training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mrt_data_integration_spark.cache_registry import (
    attach_cache as _attach_cache,
    eager_cache,
    track_cache,
)
from mrt_data_integration_spark.operators.dedup import _spread, word_shingles


def idf_shingle_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id, shingle-key, idf weight) rows — the sparse idf-weighted
    shingle indicator vectors, one row per (document, distinct shingle).

    ``shingle`` is the 16-hex-char md5 prefix of the n-word shingle
    (dedup.py's shuffle-payload discipline; collision ~2⁻⁶⁴ per pair);
    ``w = round(ln((1+N)/(1+df)), 12)`` with N = count of documents
    with non-NULL text and df = the shingle's document frequency
    (shingles are distinct per doc, so a per-key count IS df). The ln
    is rounded 12 — the engine's cross-engine log discipline.

    Zero-weight rows (df == N ⇒ idf exactly 0) are pruned: they move
    no cosine, and a corpus-wide shingle would otherwise alone fan the
    pair join out N² — the degenerate case idf weighting exists to
    defuse. Under ``max_shingle_df`` every reported quantity downstream
    (weights, norms, dots, n_shared) sees the CAPPED shingle universe —
    the same-universe convention of the capped dedup metrics.
    """
    exploded = _spread(df.filter(F.col(text_col).isNotNull())).select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles(text_col, shingle_n),
                lambda s: F.substring(F.md5(s), 1, 16),
            )
        ).alias("shingle"),
    )
    if max_shingle_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > int(max_shingle_df))
            .select("shingle")
        )
        exploded = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    # N stays IN-PLAN as a 1-row aggregate broadcast (the
    # tfidf_top_terms/DSIR pattern — no separate .count() action).
    n = (
        df.filter(F.col(text_col).isNotNull())
        .agg(F.count(F.lit(1)).cast("double").alias("__n_docs__"))
    )
    # df via a count window over the shingle key: the same Exchange the
    # downstream self-join reuses (the ngram_jaccard n_sh precedent),
    # instead of a separate df-table join.
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    w = F.round(
        F.log((1.0 + F.col("__n_docs__")) / (1.0 + F.col("df"))), 12
    )
    return (
        exploded.withColumn("df", dfreq)
        .crossJoin(F.broadcast(n))  # 1 row: map-side constant
        .select(F.col(id_col), "shingle", w.alias("w"))
        .filter(F.col("w") != 0.0)
    )


def idf_cosine_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.05,
    shingle_n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Per-document top-k nearest neighbors under idf-weighted shingle
    cosine: one row per (doc_id, rank) with
    (doc_id, neighbor_id, rank, n_shared, cosine), cosine rounded 6,
    rank 1..k over (cosine DESC, neighbor_id ASC) among neighbors with
    cosine ≥ ``threshold``.

    The pair dots come from ONE undirected inverted-index self-join
    (a.id < b.id — half the fan-out) symmetrized at pair grain before
    ranking, so each unordered pair's dot is computed once. Both float
    reductions (norms, dots) fold sequentially over VALUE-sorted
    double arrays — order-pinned. ``max_shingle_df`` is the hard
    production fan-out control layered over the smooth idf weighting;
    the registered query runs uncapped (its oracle computes the
    textbook uncapped cosine, so the query must too).
    """
    vec = idf_shingle_weights(df, id_col, text_col, shingle_n, max_shingle_df)
    # three consumers (norms, both join sides): persist so the corpus
    # tokenize+md5+window runs once (the ngram_jaccard discipline);
    # lazy — the norms broadcast build sequences the scans here, and
    # the eager variant A/B'd as wash (opt r14)
    vec = track_cache(vec.persist())
    # order-pinned folds over VALUE-sorted double lists: the summand
    # (w², resp. wa·wb) alone determines the fold order — equal values
    # sum the same in any order, so sorting by value is as
    # deterministic as sorting by shingle key while carrying HALF the
    # struct-fold's shuffle payload (no 16-char key per element).
    sq = F.sort_array(F.collect_list(F.col("w") * F.col("w")))
    norms = vec.groupBy(id_col).agg(
        F.aggregate(sq, F.lit(0.0), lambda a, e: a + e).alias("n2")
    )
    # attach the (folded, doc-grain) norms to the join INPUTS — the
    # similarity family's hoist-norms convention: cosine is then
    # computable INSIDE the pair aggregate and the threshold prunes at
    # pair grain, before symmetrization. The alternative (joining
    # norms onto the pair frame after the aggregate) was measured ~2×
    # worse at 10×: it pushes two joins + the rank input through the
    # full raw-pair volume (~n_pairs × 2 rows) instead of one
    # doc-keyed join of the weight frame (AQE broadcasts the
    # doc-grain norms at any realistic scale).
    a = vec.select(
        F.col(id_col).alias("__a__"),
        "shingle",
        F.col("w").alias("wa"),
    )
    b = vec.select(
        F.col(id_col).alias("__b__"),
        "shingle",
        F.col("w").alias("wb"),
    )
    prods = (
        a.join(b, "shingle")
        .filter(F.col("__a__") < F.col("__b__"))
        .select(
            "__a__",
            "__b__",
            (F.col("wa") * F.col("wb")).alias("prod"),
        )
    )
    dp = F.sort_array(F.collect_list(F.col("prod")))
    cos = F.round(
        F.col("dot") / (F.sqrt(F.col("n2_a")) * F.sqrt(F.col("n2_b"))), 6
    )
    # norms attach at PAIR grain, after the aggregate and BEFORE the
    # eager cache/threshold: the doc-grain norms frame broadcasts into
    # two map-side joins over the deduped (a, b) frame, so the big
    # shingle-keyed shuffle above carries (a, b, prod) only — dropping
    # the two per-row doubles cut its bytes ~40% and removed the two
    # first() buffers from the pair aggregate (guide §2.3, A/B'd this
    # round: 41 → 25 MB shuffle write). This is NOT the variant the
    # hoist-norms note measured 2× worse in the build round — that one
    # joined norms onto the SYMMETRIZED (n_pairs × 2) frame under the
    # rank window; here the join lands pre-union inside the cached
    # frame, so the window still reads the cache.
    dots = (
        prods.groupBy("__a__", "__b__")
        .agg(
            F.aggregate(dp, F.lit(0.0), lambda acc, e: acc + e).alias("dot"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .join(norms.select(F.col(id_col).alias("__a__"), F.col("n2").alias("n2_a")), "__a__")
        .join(norms.select(F.col(id_col).alias("__b__"), F.col("n2").alias("n2_b")), "__b__")
        .select("__a__", "__b__", "n_shared", cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )
    # the symmetrize union consumes dots TWICE — persist the (already
    # threshold-pruned) pair frame so neither branch re-runs the
    # inverted-index join + aggregation (measured ~2× without it), and
    # MATERIALIZE it before the union: its two branches are concurrent
    # stages of the final job, and unmaterialized they raced the
    # join+aggregate redundantly anyway (the margin_knn_pairs lesson,
    # opt r14 — this query's executor CPU was 96 s in the job census,
    # ~2× its single-evaluation cost).
    dots = eager_cache(dots)
    scored = dots.select(
        F.col("__a__").alias(id_col),
        F.col("__b__").alias("neighbor_id"),
        "n_shared",
        "cosine",
    ).unionByName(
        dots.select(
            F.col("__b__").alias(id_col),
            F.col("__a__").alias("neighbor_id"),
            "n_shared",
            "cosine",
        )
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "neighbor_id", "rank", "n_shared", "cosine")
    )
    return _attach_cache(out, [vec, dots])


def idf_cross_topk(
    batch: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.05,
    shingle_n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Cross-corpus form of :func:`idf_cosine_topk` — for every
    document in ``batch``, its k nearest REFERENCE documents under
    idf-weighted shingle cosine: the retrieval shape ("which corpus
    documents does this new batch quote?"), machinery-identical to the
    within-corpus operator with the self-join replaced by a two-frame
    equi-join on the same shingle key (the containment_cross_pairs
    precedent).

    Weighting convention (standard retrieval): idf statistics (N, df,
    and the ``max_shingle_df`` cap) come from the REFERENCE corpus —
    the index side. Batch shingles absent from the reference universe
    carry no weight and are dropped (OOV contract: a batch document
    with no reference shingles is absent from the output), and batch
    norms are computed over the reference-weighted shingles only —
    the consistent-universe convention. A batch document identical to
    a reference document therefore scores cosine 1.0 against it.

    Output: (doc_id, ref_id, rank, n_shared, cosine), cosine rounded
    6, rank 1..k per batch document over (cosine DESC, ref_id ASC).
    """
    ref_vec = idf_shingle_weights(
        reference, id_col, text_col, shingle_n, max_shingle_df
    )
    # consumers: idf table, reference norms, the join side — all
    # broadcast-sequenced at realistic sizes, so lazy (opt r14)
    ref_vec = track_cache(ref_vec.persist())
    # w is a function of the shingle alone — one row per shingle
    idf_tab = ref_vec.select("shingle", "w").dropDuplicates(["shingle"])
    batch_sh = _spread(batch.filter(F.col(text_col).isNotNull())).select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles(text_col, shingle_n),
                lambda s: F.substring(F.md5(s), 1, 16),
            )
        ).alias("shingle"),
    )
    # OOV batch shingles drop here (inner join against the reference
    # idf table — shingle-keyed, AQE broadcasts it when small)
    bvec = batch_sh.join(idf_tab, "shingle")
    bvec = track_cache(bvec.persist())
    sq = F.sort_array(F.collect_list(F.col("w") * F.col("w")))
    fold = lambda col: F.aggregate(col, F.lit(0.0), lambda a, e: a + e)  # noqa: E731
    norms_b = bvec.groupBy(id_col).agg(fold(sq).alias("n2"))
    norms_r = ref_vec.groupBy(id_col).agg(fold(sq).alias("n2"))
    a = bvec.select(
        F.col(id_col).alias("__q__"),
        "shingle",
        F.col("w").alias("wa"),
    )
    b = ref_vec.select(
        F.col(id_col).alias("__r__"),
        "shingle",
        F.col("w").alias("wb"),
    )
    prods = a.join(b, "shingle").select(
        "__q__",
        "__r__",
        (F.col("wa") * F.col("wb")).alias("prod"),
    )
    dp = F.sort_array(F.collect_list(F.col("prod")))
    cos = F.round(
        F.col("dot") / (F.sqrt(F.col("n2_a")) * F.sqrt(F.col("n2_b"))), 6
    )
    # norms attach at pair grain after the aggregate — the big
    # shingle-keyed shuffle carries (q, r, prod) only (the
    # idf_cosine_topk change, same A/B evidence; the doc-grain norm
    # frames broadcast into two map-side joins here)
    scored = (
        prods.groupBy("__q__", "__r__")
        .agg(
            F.aggregate(dp, F.lit(0.0), lambda acc, e: acc + e).alias("dot"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .join(
            norms_b.select(
                F.col(id_col).alias("__q__"), F.col("n2").alias("n2_a")
            ),
            "__q__",
        )
        .join(
            norms_r.select(
                F.col(id_col).alias("__r__"), F.col("n2").alias("n2_b")
            ),
            "__r__",
        )
        .select(
            F.col("__q__").alias(id_col),
            F.col("__r__").alias("ref_id"),
            "n_shared",
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.desc("cosine"), F.asc("ref_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "ref_id", "rank", "n_shared", "cosine")
    )
    return _attach_cache(out, [ref_vec, bvec])
