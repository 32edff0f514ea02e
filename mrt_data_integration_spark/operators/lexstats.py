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

from pyspark.sql import DataFrame
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
