"""Funnel analysis over event streams (E6 extension).

First-touch funnel semantics, the standard product-analytics definition:
anchor at each user's FIRST step-1 event (t1 = min ts of step 1); stage
i+1 completes at the first step-(i+1) event strictly after stage i's
completion and within ``window`` of it. Anchoring is a definition, not
an optimization — a later step-1 event is never reconsidered, which is
what makes the measure stable under data growth and expressible as a
greedy single pass.

Spark shape: ONE user-keyed shuffle. Events collect per user, sort by
(ts, type), and a single ``aggregate`` fold walks the funnel — each
stage's slot is set exactly once, by the first qualifying event, which
on a sorted array IS the min the definition asks for. Per-user arrays
are bounded by per-user event counts (the same boundedness every
sessionization operator here assumes); for corpora where a single user
can hold unbounded history, pass ``bounded_history=False`` to run the
decomposed variant — one min-aggregate + join per stage (k user-keyed
shuffles instead of 1), same answers, no per-user array
(differential-tested fold == decomposed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    window: str = "12 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    bounded_history: bool = True,
) -> DataFrame:
    """Per-user funnel completion times: (user, t_1, ..., t_k) with
    t_i = completion timestamp of stage i (null = never reached).

    ``bounded_history=True`` (default) runs the single-shuffle sorted
    fold above — right whenever per-user event counts are bounded.
    ``bounded_history=False`` runs the decomposed min-join variant: one
    min-aggregate + join per stage (k user-keyed shuffles), never
    materializing a per-user array — the shape to point at corpora
    where one user can hold unbounded history. Differential-tested
    equal (the greedy fold's "first qualifying event on a sorted
    array" IS the min the per-stage aggregate computes, because each
    stage's anchor t_{i-1} is already fixed when stage i resolves).
    """
    if not bounded_history:
        return _funnel_stage_times_decomposed(
            events, steps, window, user_col, ts_col, type_col
        )
    iv = F.expr(f"INTERVAL {window}")
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")).alias(
            "__e__"
        ),
    )
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("__e__")).alias("__evs__")
    )
    zero = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i + 1}") for i in range(len(steps))]
    )

    def advance(acc: Column, e: Column) -> Column:
        # set the FIRST unset stage this event qualifies for; sorted
        # input makes first-qualifying == min-qualifying
        fields = []
        for i, step in enumerate(steps):
            t_i = acc[f"t{i + 1}"]
            if i == 0:
                qualifies = t_i.isNull() & (e["tp"] == step)
            else:
                t_prev = acc[f"t{i}"]
                qualifies = (
                    t_i.isNull()
                    & (e["tp"] == step)
                    & t_prev.isNotNull()
                    & (e["ts"] > t_prev)
                    & (e["ts"] <= t_prev + iv)
                )
            fields.append(
                F.when(qualifies, e["ts"]).otherwise(t_i).alias(f"t{i + 1}")
            )
        return F.struct(*fields)

    stages = per_user.select(
        user_col, F.aggregate("__evs__", zero, advance).alias("__st__")
    )
    return stages.select(
        user_col,
        *[F.col(f"__st__.t{i + 1}").alias(f"t{i + 1}") for i in range(len(steps))],
    )


def _funnel_stage_times_decomposed(
    events: DataFrame,
    steps: list[str],
    window: str,
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """The unbounded-history funnel: one min-aggregate + equi-join per
    stage instead of a per-user collect_list.

    Stage 1 anchors at min(ts of step-1 events); stage i+1 is the min
    step-(i+1) timestamp strictly after stage i's completion and within
    ``window`` of it — computed by joining that step's (user, ts) rows
    (two slim columns, never the full history) to the accumulated
    per-user stage frame and re-aggregating. k user-keyed shuffles of
    per-stage event subsets; per-task memory is O(1) rows regardless of
    how much history any single user carries."""
    iv = F.expr(f"INTERVAL {window}")
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        user_col, ts_col, type_col
    )
    # Same output domain as the fold: every user with ANY funnel event
    # gets a row (all-null stages when step 1 never fired).
    users = ev.select(user_col).distinct()
    stage1 = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    acc = users.join(stage1, user_col, "left")
    for i in range(1, len(steps)):
        prev, cur = f"t{i}", f"t{i + 1}"
        nxt = (
            ev.filter(F.col(type_col) == steps[i])
            .join(acc.select(user_col, prev), user_col)
            .filter(
                (F.col(ts_col) > F.col(prev))
                & (F.col(ts_col) <= F.col(prev) + iv)
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(cur))
        )
        acc = acc.join(nxt, user_col, "left")
    return acc.select(
        user_col, *[f"t{i + 1}" for i in range(len(steps))]
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    window: str = "12 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    bounded_history: bool = True,
) -> DataFrame:
    """Stage-level funnel report: (stage, step, n_users, conversion)
    with conversion = n_users / previous stage's n_users (stage 1:
    1.0), rounded to 6. One row per step, ordered by stage."""
    times = funnel_stage_times(
        events, steps, window, user_col, ts_col, type_col,
        bounded_history=bounded_history,
    )
    counts = times.agg(
        *[
            F.count(F.col(f"t{i + 1}")).alias(f"n{i + 1}")
            for i in range(len(steps))
        ]
    )
    rows = []
    for i, step in enumerate(steps):
        prev = F.col(f"n{i}") if i else F.col("n1")
        rows.append(
            F.struct(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(step).alias("step"),
                F.col(f"n{i + 1}").alias("n_users"),
                # try_divide: an empty previous stage yields NULL
                # conversion (same as DuckDB's x/0), not an ANSI error
                F.round(F.try_divide(F.col(f"n{i + 1}"), prev), 6).alias(
                    "conversion"
                ),
            )
        )
    return (
        counts.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.stage", "r.step", "r.n_users", "r.conversion")
        .orderBy("stage")
    )
