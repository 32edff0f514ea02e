"""Grouped robust statistics — exact per-group median / MAD and the
robust z-score outlier flags a curation pass runs per language or per
source ("flag documents whose length/quality sits more than 3.5
robust sigmas from their group's center"): the median/MAD pair is the
standard outlier detector that survives the very outliers it hunts
(Iglewicz & Hoaglin 1993; mean/stddev break down under contamination).

Scale design — the naive formulation (``percentile(col, 0.5)`` per
group) shuffles EVERY observation to its group's reducer: with a
handful of languages over a 100 TB corpus those are exactly the hot
keys the skew discipline forbids. The engine's shape instead follows
the KS-drift precedent (operators/drift.py):

1. collapse to the (group, value) GRAIN first: one partial-agg hash
   shuffle produces counts bounded by group-domain × value-DOMAIN
   (a length in characters, a bucketed score) — the value spreads the
   keys, so no reducer sees a group's whole corpus;
2. exact order statistics come from running count sums over that
   bounded table (per-group windows over the value domain — the
   sanctioned bounded-window class);
3. the ≤ |groups|-row median/MAD frame joins back to the document
   grain map-side (AQE broadcasts it unhinted).

The MAD pass repeats the same machinery over |value − median| (its
domain is at most twice the value domain). All arithmetic is integer
counts plus single float ops ((v1+v2)/2, the z ratio) — fully
SQL-replayable with no order-pinning concerns (no float accumulation
crosses a shuffle).

Continuous-valued columns must be bucketed by the caller first (the
drift/histogram family's contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the consistency constant scaling MAD to sigma under normality
MAD_SIGMA = 1.4826


def grouped_median(
    counts: DataFrame,
    group_col: str,
    value_col: str,
    cnt_col: str,
) -> DataFrame:
    """Exact per-group median from a (group, value, count) frame —
    the interpolating order-statistic definition ((v_k1 + v_k2)/2
    with k1 = ⌊(n+1)/2⌋, k2 = ⌊(n+2)/2⌋, 1-indexed): odd n gives the
    middle value, even n the average of the two middles. One
    domain-bounded window + one group-grain aggregate."""
    tot = counts.groupBy(group_col).agg(
        F.sum(cnt_col).cast("long").alias("__n__")
    )
    w = Window.partitionBy(group_col).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        F.col(group_col),
        F.col(value_col),
        F.sum(cnt_col).over(w).alias("__cum__"),
    ).join(tot, group_col)
    k1 = F.floor((F.col("__n__") + 1) / 2.0)
    k2 = F.floor((F.col("__n__") + 2) / 2.0)
    v1 = F.min(F.when(F.col("__cum__") >= k1, F.col(value_col)))
    v2 = F.min(F.when(F.col("__cum__") >= k2, F.col(value_col)))
    return cum.groupBy(group_col).agg(
        ((v1 + v2) / 2).alias("__median__"),
        F.first("__n__").alias("__n__"),
    )


def robust_outlier_flags(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    z_thresh: float = 3.5,
) -> DataFrame:
    """One row per input row — (id_col, group_col, value_col, med,
    mad, robust_z, is_outlier) — where ``med``/``mad`` are the row's
    group's exact median and median-absolute-deviation of
    ``value_col``, ``robust_z = (x − med) / (1.4826 · mad)`` rounded
    4, and ``is_outlier = |robust_z| > z_thresh`` (3.5, the
    Iglewicz–Hoaglin cut).

    Contracts: rows with a NULL value or NULL group are EXCLUDED from
    the statistics and kept in the output with NULL med/mad/robust_z
    and is_outlier=false; a zero-MAD group (over half its mass on one
    value) yields NULL robust_z and is_outlier=false for every member
    — the degenerate case the caller must split on a finer metric,
    reported honestly rather than as ±inf."""
    src = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col).cast("double").alias("__x__"),
    )
    ok = src.filter(
        F.col("__x__").isNotNull() & F.col(group_col).isNotNull()
    )
    counts = ok.groupBy(group_col, "__x__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    med = grouped_median(counts, group_col, "__x__", "__c__").select(
        F.col(group_col), F.col("__median__").alias("__med__")
    )
    dev_counts = (
        counts.join(med, group_col)
        .select(
            F.col(group_col),
            F.abs(F.col("__x__") - F.col("__med__")).alias("__d__"),
            F.col("__c__"),
        )
        .groupBy(group_col, "__d__")
        .agg(F.sum("__c__").cast("long").alias("__c__"))
    )
    mad = grouped_median(dev_counts, group_col, "__d__", "__c__").select(
        F.col(group_col), F.col("__median__").alias("__mad__")
    )
    stats = med.join(mad, group_col)
    z = F.when(
        F.col("__mad__") > 0,
        F.round(
            (F.col("__x__") - F.col("__med__"))
            / (F.lit(MAD_SIGMA) * F.col("__mad__")),
            4,
        ),
    )
    out = src.join(stats, group_col, "left").select(
        F.col(id_col),
        F.col(group_col),
        F.col("__x__").alias(value_col),
        F.when(F.col("__x__").isNotNull(), F.col("__med__")).alias("med"),
        F.when(F.col("__x__").isNotNull(), F.col("__mad__")).alias("mad"),
        F.when(F.col("__x__").isNotNull(), z).alias("robust_z"),
        F.coalesce(
            F.abs(
                F.when(F.col("__x__").isNotNull(), z)
            ) > F.lit(float(z_thresh)),
            F.lit(False),
        ).alias("is_outlier"),
    )
    return out
