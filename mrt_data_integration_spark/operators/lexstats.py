"""Corpus-level lexical statistics — the rank-frequency diagnostics a
data-QA pass runs per corpus release: the Zipf log-log slope over the
top ranks (natural text sits near −1; generated/keyword-stuffed
corpora flatten, template floods steepen), the hapax fraction
(once-seen share of the vocabulary — crashes when a corpus is
template-heavy), and the vocabulary/token totals. Per-document
diversity lives in :mod:`operators.diversity`; this is the CORPUS
grain (the two disagree exactly when many individually-healthy
documents are near-copies of each other).

Scale shape: one token-grain hash shuffle (counts), then the global
top-``fit_n`` via the two-phase bounded_topk (per-partition top-k
survivors first — never a vocabulary-wide single-reducer window,
the r4 straggler lesson), then the slope fit over ≤ fit_n rows folded
SEQUENTIALLY in rank order — the four regression sums (Σx, Σy, Σxy,
Σx²) accumulate over a rank-sorted array, so the float arithmetic is
order-pinned and engine-replayable (the token_diversity_stats
discipline); corpus totals ride 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.similarity import bounded_topk
from mrt_data_integration_spark.operators.text import tokens


def zipf_profile(
    docs: DataFrame,
    text_col: str = "text",
    fit_n: int = 1000,
    emit_n: int = 20,
) -> DataFrame:
    """One row per top-``emit_n`` token — (rank, token, freq) — with
    the corpus statistics as constant columns: n_tokens, n_types,
    hapax_frac (rounded 6), zipf_slope (the least-squares slope of
    ln freq on ln rank over the top ``fit_n`` ranks, rounded 6; NULL
    when fewer than 2 ranks exist). Ties rank by token ascending
    (deterministic cross-engine). NULL-text rows are excluded."""
    cnt = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    stats = cnt.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        # empty-vocabulary guard (an all-NULL-text corpus): NULL, not
        # an ANSI 0/0 — the output is empty anyway (no top ranks)
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.count(F.when(F.col("freq") == 1, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ),
        ).alias("hapax_frac"),
    )
    top = bounded_topk(
        cnt.withColumn("__k__", F.lit(0)),
        fit_n,
        "freq",
        rank_col="rank",
        key_col="__k__",
        tie_col="token",
    ).select(
        F.col("rank").cast("long").alias("rank"), "token", "freq"
    )
    # rank-ordered sequential fold of the four regression sums (the
    # order-pinned float-sum discipline: a plain agg sum would be
    # shuffle-fetch-order nondeterministic)
    xy = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("rank").alias("r"),
                F.log(F.col("rank").cast("double")).alias("x"),
                F.log(F.col("freq").cast("double")).alias("y"),
            )
        )
    )
    init = F.struct(
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxy"),
        F.lit(0.0).alias("sxx"),
    )
    folded = F.aggregate(
        xy,
        init,
        lambda a, e: F.struct(
            (a["sx"] + e["x"]).alias("sx"),
            (a["sy"] + e["y"]).alias("sy"),
            (a["sxy"] + e["x"] * e["y"]).alias("sxy"),
            (a["sxx"] + e["x"] * e["x"]).alias("sxx"),
        ),
    )
    n = F.count(F.lit(1)).cast("double")
    fit = top.agg(
        folded.alias("__s__"), n.alias("__n__")
    ).select(
        F.when(
            F.col("__n__") >= 2,
            F.round(
                (
                    F.col("__n__") * F.col("__s__.sxy")
                    - F.col("__s__.sx") * F.col("__s__.sy")
                )
                / (
                    F.col("__n__") * F.col("__s__.sxx")
                    - F.col("__s__.sx") * F.col("__s__.sx")
                ),
                6,
            ),
        ).alias("zipf_slope")
    )
    return (
        top.filter(F.col("rank") <= emit_n)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(fit))
        .select(
            "rank",
            "token",
            "freq",
            "n_tokens",
            "n_types",
            "hapax_frac",
            "zipf_slope",
        )
    )


def heaps_growth(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_checkpoints: int = 16,
) -> DataFrame:
    """Vocabulary-growth curve (Heaps'/Herdan's law V ≈ K·N^β): the
    companion corpus diagnostic to :func:`zipf_profile` — natural text
    grows its vocabulary as a sublinear power of tokens read (β ≈
    0.4–0.6); template floods flatten the curve early (β → 0), while
    near-random token streams push β toward 1. A release-over-release
    drop in β is the corpus-level signature of duplication that
    per-document diversity cannot see.

    Documents are ordered by ``id_col`` (the deterministic "reading
    order"); checkpoints are ``n_checkpoints`` equally-spaced id
    bounds ``lo + ceil(i·(hi−lo)/k)`` (integer-exact, de-duplicated —
    a short id range yields fewer rows). One output row per distinct
    checkpoint — (checkpoint, n_docs_cum, n_tokens_cum, vocab_cum) —
    with the log-log OLS fit as constant columns: ``heaps_beta`` (the
    slope of ln V on ln N) and ``heaps_k`` (exp of the intercept),
    both rounded 6, NULL when fewer than 2 distinct checkpoints or a
    degenerate x-variance. NULL-text rows are excluded.

    Scale shape: NO cumulative window and NO sort — a global
    running-vocabulary window would serialize on one reducer, so
    cumulation is re-expressed as bounded fan-out joins: each
    document's token count (doc grain) and each token's FIRST
    ``min(id)`` occurrence (one token-grain hash shuffle, the same
    grain as zipf's counts) explode against the ≤ k broadcast
    checkpoint bounds they precede (``explode(filter(cps, c -> c >=
    id))`` — map-side, fan-out ≤ k per row) and collapse by integer
    count/sum. The fit folds SEQUENTIALLY over the checkpoint-sorted
    point array (the order-pinned float-sum discipline), and the
    ≤ k-row frames ride 1-row broadcasts.
    """
    k = int(n_checkpoints)
    d = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id__"), tokens(text_col).alias("__toks__")
    )
    doc_tok = d.select("__id__", F.size("__toks__").cast("long").alias("n_tok"))
    # checkpoint bounds from the id DOMAIN (min/max only — no sort):
    # lo + ceil(i·(hi−lo)/k), exact in double for any realistic id range
    cps_row = doc_tok.agg(
        F.min("__id__").alias("__lo__"), F.max("__id__").alias("__hi__")
    ).select(
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.lit(k)),
                    lambda i: (
                        F.col("__lo__")
                        + F.floor(
                            (
                                (F.col("__hi__") - F.col("__lo__")) * i
                                + F.lit(k - 1)
                            )
                            / F.lit(float(k))
                        )
                    ).cast("long"),
                )
            )
        ).alias("__cps__")
    )

    def _cum(frame: DataFrame, at: str, aggs: list[Column]) -> DataFrame:
        # map-side bounded fan-out: each row lands in every checkpoint
        # at or after its id — the distributed form of a running total
        spread = frame.crossJoin(F.broadcast(cps_row)).select(
            F.explode(
                F.filter(F.col("__cps__"), lambda c: c >= F.col(at))
            ).alias("checkpoint"),
            *[c for c in frame.columns if c != at],
        )
        return spread.groupBy("checkpoint").agg(*aggs)

    nc = _cum(
        doc_tok,
        "__id__",
        [
            F.count(F.lit(1)).alias("n_docs_cum"),
            F.sum("n_tok").cast("long").alias("n_tokens_cum"),
        ],
    )
    first_doc = (
        d.select(
            F.col("__id__"),
            F.explode(F.array_distinct("__toks__")).alias("token"),
        )
        .groupBy("token")
        .agg(F.min("__id__").alias("__fd__"))
    )
    vc = _cum(
        first_doc.select(F.col("__fd__")),
        "__fd__",
        [F.count(F.lit(1)).alias("vocab_cum")],
    )
    pts = nc.join(vc, "checkpoint")
    # checkpoint-ordered sequential fold of the four regression sums
    xy = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("checkpoint").alias("c"),
                F.log(F.col("n_tokens_cum").cast("double")).alias("x"),
                F.log(F.col("vocab_cum").cast("double")).alias("y"),
            )
        )
    )
    init = F.struct(
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxy"),
        F.lit(0.0).alias("sxx"),
    )
    folded = F.aggregate(
        xy,
        init,
        lambda a, e: F.struct(
            (a["sx"] + e["x"]).alias("sx"),
            (a["sy"] + e["y"]).alias("sy"),
            (a["sxy"] + e["x"] * e["y"]).alias("sxy"),
            (a["sxx"] + e["x"] * e["x"]).alias("sxx"),
        ),
    )
    n = F.count(F.lit(1)).cast("double")
    s = F.col("__s__")
    beta_raw = (n_ := F.col("__n__")) * s["sxy"] - s["sx"] * s["sy"]
    var_x = n_ * s["sxx"] - s["sx"] * s["sx"]
    ok = (n_ >= 2) & (var_x != 0)
    fit = pts.agg(folded.alias("__s__"), n.alias("__n__")).select(
        F.when(ok, F.round(beta_raw / var_x, 6)).alias("heaps_beta"),
        F.when(
            ok,
            F.round(
                F.exp((s["sy"] - (beta_raw / var_x) * s["sx"]) / n_), 6
            ),
        ).alias("heaps_k"),
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "checkpoint",
        "n_docs_cum",
        "n_tokens_cum",
        "vocab_cum",
        "heaps_beta",
        "heaps_k",
    )
