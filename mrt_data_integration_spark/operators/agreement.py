"""Label-agreement auditing (pipeline-QA extension): confusion
marginals, per-class precision/recall/F1, accuracy, and Cohen's kappa
(Cohen 1960) between two label columns — the standard audit when a
cheap classifier (language ID, quality gate, heuristic filter) is
being validated against reference labels, or two classifiers against
each other, before either drives corpus-scale filtering.

Scale design: the ONLY corpus-scale operation is one (ref, pred) hash
aggregate — map-side partial, output bounded by the label-domain
product. Everything downstream (marginals, diagonal, the chance
agreement pe = Σ_c p_ref(c)·p_pred(c), kappa = (po − pe)/(1 − pe))
operates on that domain-bounded cell frame and rides 1-row broadcast
joins. The pe sum folds over the LABEL-SORTED per-class products
(order-pinned — the engine's float-reduction discipline; the products
are exact integer counts but the fold keeps the double sum
bit-deterministic at any domain size).

Honest-NULL contracts: precision is NULL for a class never predicted,
recall NULL for a class absent from the reference, F1 NULL when
either is NULL or both are 0; kappa is NULL when pe == 1 (both
raters constant on the same class — chance agreement saturates and
the statistic is undefined).

Reference parity: no agreement surface exists in the reference
engine (eastonhuch/mrt-data-integration); pipeline-extension family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def confusion_cells(
    df: DataFrame,
    ref_col: Column | str = "ref",
    pred_col: Column | str = "pred",
) -> DataFrame:
    """The mergeable sufficient statistic of :func:`label_agreement`:
    (ref, pred, n) confusion-cell counts — counts add, so partial
    cells from disjoint slices (or micro-batches; see
    streaming/agreement.py) union-sum to the corpus statistic. NULL
    labels are excluded (a NULL is an unlabeled row, not a class).
    The ONLY corpus-scale operation of the family lives here: one
    map-side-partial hash aggregate bounded by the label-domain
    product."""
    ref = F.col(ref_col) if isinstance(ref_col, str) else ref_col
    pred = F.col(pred_col) if isinstance(pred_col, str) else pred_col
    return (
        df.select(ref.alias("__r__"), pred.alias("__p__"))
        .filter(F.col("__r__").isNotNull() & F.col("__p__").isNotNull())
        .groupBy("__r__", "__p__")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def merge_confusion_cells(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Union-sum two confusion-cell frames (the streaming drain's
    per-micro-batch merge)."""
    return (
        prev.unionByName(cur)
        .groupBy("__r__", "__p__")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def agreement_from_cells(cells: DataFrame) -> DataFrame:
    """Finalize confusion cells into the agreement schema — shared
    VERBATIM between the batch path and the streaming drain (so
    stream == batch exactly, the drift-family convention)."""
    ref_m = cells.groupBy("__r__").agg(
        F.sum("n").cast("long").alias("n_ref")
    )
    pred_m = cells.groupBy("__p__").agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    diag = cells.filter(F.col("__r__") == F.col("__p__")).select(
        F.col("__r__").alias("label"), F.col("n").alias("n_correct")
    )
    labels = (
        ref_m.select(F.col("__r__").alias("label"))
        .unionByName(pred_m.select(F.col("__p__").alias("label")))
        .distinct()
    )
    per = (
        labels.join(ref_m.withColumnRenamed("__r__", "label"), "label", "left")
        .join(pred_m.withColumnRenamed("__p__", "label"), "label", "left")
        .join(diag, "label", "left")
        .select(
            "label",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("n_correct", F.lit(0)).cast("long").alias("n_correct"),
        )
    )
    # scalars: N, po from 1-row aggregates; pe folds the label-sorted
    # per-class marginal products (order-pinned)
    tot = per.agg(
        F.sum("n_ref").cast("double").alias("__n__"),
        F.sum("n_correct").cast("double").alias("__diag__"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("label"),
                        (
                            F.col("n_ref").cast("double")
                            * F.col("n_pred").cast("double")
                        ).alias("prod"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["prod"],
        ).alias("__pesum__"),
    )
    po = F.col("__diag__") / F.col("__n__")
    pe = F.col("__pesum__") / (F.col("__n__") * F.col("__n__"))
    kappa = F.when(pe != 1.0, F.round((po - pe) / (1.0 - pe), 6))
    acc = F.round(po, 6)
    prec = F.when(
        F.col("n_pred") > 0,
        F.round(F.col("n_correct") / F.col("n_pred"), 6),
    )
    rec = F.when(
        F.col("n_ref") > 0,
        F.round(F.col("n_correct") / F.col("n_ref"), 6),
    )
    # F1 from the UNROUNDED ratios (single float ops), rounded once
    p_raw = F.col("n_correct") / F.col("n_pred")
    r_raw = F.col("n_correct") / F.col("n_ref")
    f1 = F.when(
        (F.col("n_pred") > 0)
        & (F.col("n_ref") > 0)
        & ((F.col("n_correct") > 0)),
        F.round(2.0 * p_raw * r_raw / (p_raw + r_raw), 6),
    ).otherwise(
        F.when(
            (F.col("n_pred") > 0) & (F.col("n_ref") > 0), F.lit(0.0)
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(  # 1 row: map-side constant
        "label",
        "n_ref",
        "n_pred",
        "n_correct",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
        acc.alias("accuracy"),
        kappa.alias("kappa"),
    )


def label_agreement(
    df: DataFrame,
    ref_col: Column | str = "ref",
    pred_col: Column | str = "pred",
) -> DataFrame:
    """One row per label in the UNION of the two columns' domains:
    (label, n_ref, n_pred, n_correct, precision, recall, f1,
    accuracy, kappa) — the per-class columns rounded 6, accuracy and
    kappa repeated on every row (the drift family's scalar-on-rows
    convention). NULL labels are excluded (a NULL is an unlabeled
    row, not a class)."""
    return agreement_from_cells(confusion_cells(df, ref_col, pred_col))
