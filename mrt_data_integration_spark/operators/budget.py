"""Token-budget corpus selection — the dataset-assembly step that
turns "we can afford N tokens from each source" into a deterministic
document pick: rank every document within its group by quality, fill
the group's budget greedily in rank order, keep the prefix that fits
(the ordered-prefix rule used when assembling a training mix from
quality-scored pools; the per-source budgets are how target mixture
weights — "20% code, 5% forums" — become document sets).

Semantics: an ORDERED PREFIX FILL, not a knapsack — the first
document whose tokens overflow the budget is cut and so is everything
ranked below it, even if some smaller later document would still fit.
That keeps the rule monotone (raising the budget never drops a
previously selected document), deterministic, and replayable in one
window pass; bin-packing the tail is `sequence_packing`'s job, not
selection's.

Scale shape: ONE hash shuffle on the group key feeding a per-group
sort window (two running expressions share the single sort); the text
column itself never has to ride along — callers pass a precomputed
token-count column, so the window input is (id, group, quality,
tokens) narrow rows. Group cardinality is the parallelism: sources /
domains number in the thousands-to-millions at corpus scale, so the
per-group sort partitions evenly; a SINGLE global budget (one group)
would serialize — for that case compose a quality threshold from the
percentile machinery instead (exact_percentiles' sanctioned global
window), then filter.

Ordering is pinned cross-engine: quality DESC NULLS LAST, id ASC —
NULL-quality documents rank after every scored one and still consume
budget only if reached.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_budget_select(
    docs: DataFrame,
    budget: int | DataFrame,
    group_col: str,
    quality_col: str,
    tokens_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rank ``docs`` within each ``group_col`` by (``quality_col``
    DESC NULLS LAST, ``id_col`` ASC), accumulate ``tokens_col`` in
    rank order, and keep the prefix whose running total fits the
    budget.

    ``budget`` is either one int for every group, or a
    (group_col, budget) DataFrame — the production form, where target
    mixture weights become per-source budgets (e.g. ``weight_s ×
    total_token_budget``). A group absent from the budgets table has
    no allocation: its rows keep their rank/running total but
    ``selected`` is false throughout (an honest zero, not an implicit
    infinity). The budgets table is bounded by the group domain, not
    the corpus — joined without a hint (AQE broadcasts it when small,
    the hint-budget discipline).

    Returns one row per input document — (id_col, group_col,
    doc_tokens, rank, cum_tokens, selected) — so the rejected tail
    stays visible for auditing (how much quality mass the budget cut);
    filter ``selected`` for the kept set. ``rank`` and ``cum_tokens``
    are BIGINT (the sessionization HUGEINT lesson: keep integer
    representations engine-identical).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.desc_nulls_last(quality_col), F.asc(id_col)
    )
    ranked = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.col(tokens_col).cast("long").alias("doc_tokens"),
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum(F.col(tokens_col).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_tokens"),
    )
    if isinstance(budget, DataFrame):
        # The budgets table's group key MUST be unique: a duplicate row
        # would fan out every document of that group through the left
        # join (grain corruption with conflicting `selected` flags).
        # Enforce loudly and distributedly — collapse to one row per
        # group and raise at evaluation time if any group had two: the
        # guard is a count-agg over the (bounded) group domain, not a
        # corpus-sized check.
        b = budget.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("__n__"),
            F.max(F.col("budget").cast("long")).alias("__b__"),
        )
        b = b.select(
            F.col(group_col),
            F.when(F.col("__n__") == 1, F.col("__b__"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "token_budget_select: duplicate budget rows "
                            f"for {group_col}="
                        ),
                        F.col(group_col).cast("string"),
                    )
                )
            )
            .alias("__b__"),
        )
        ranked = ranked.join(b, group_col, "left")
        limit = F.col("__b__")
    else:
        limit = F.lit(int(budget))
    out = ranked.withColumn(
        "selected",
        F.coalesce(F.col("cum_tokens") <= limit, F.lit(False)),
    )
    return out.drop("__b__") if isinstance(budget, DataFrame) else out
