"""As-of (most-recent-match) join — a Spark-native implementation.

Spark has no built-in ASOF JOIN. The scalable pattern used here is the
union + last(ignoreNulls) window trick:

  1. Tag left rows (side=1) and right rows (side=0) and union them on a
     common (key, time) schema.
  2. One window per key ordered by (time, side): ``last(right_payload,
     ignoreNulls=True)`` over UNBOUNDED PRECEDING..CURRENT gives each
     left row the payload of the most recent right row with
     right.time <= left.time (side ordering makes the match inclusive).
  3. Keep the left rows.

Cost: ONE shuffle of (|L|+|R|) rows keyed by the join key — same as a
sort-merge join, with no range-explosion. This beats the naive
join-filter-rank plan (which materializes |L|×|matching R| pairs) by the
average match multiplicity, and scales to 100 TB as long as single keys
fit in a task (salt the key with a time-bucket if one key's history is
pathological).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the matching
    right row with the same key: the latest with ``right_time <=
    left_time`` (``direction="backward"``, the default — inclusive),
    the earliest with ``right_time >= left_time``
    (``direction="forward"`` — also inclusive; the same one-shuffle
    window with the time ordering reversed), or the closest by
    absolute time gap with ties going backward
    (``direction="nearest"`` — pandas ``merge_asof`` semantics,
    pinned against pandas itself; one shuffle, two sorts).

    ``tolerance`` bounds the match's time gap: a match farther than
    ``tolerance`` (in the time column's ``cast("double")`` units —
    epoch seconds for timestamps, the raw value for numerics) is
    nulled out, row kept (the pandas ``merge_asof`` contract). Dates
    cast through timestamp first; callers with exotic time types
    pre-cast.

    Right rows that tie on (key, time) must be pre-deduplicated by the
    caller (the result would otherwise be tie-broken arbitrarily).

    NULL time keys never match, in EITHER direction (the pandas
    ``merge_asof`` contract, which rejects NaN keys outright): right
    rows with a NULL ``right_time`` are dropped before the union, and
    left rows with a NULL ``left_time`` are kept with NULL payload —
    the window's null ordering is pinned nulls-first in both
    directions so a NULL left row sorts before every real right row
    and inherits nothing. (Before r14 this was asymmetric: forward's
    bare ``desc`` put NULLs LAST, so a NULL-time left row silently
    matched the smallest right_time.)
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        return _asof_nearest(
            left, right, left_key, right_key, left_time, right_time,
            payload, tolerance,
        )
    right = right.filter(F.col(right_time).isNotNull())
    l_tag = left.select(
        F.col(left_key).alias("__key__"),
        F.col(left_time).alias("__time__"),
        F.lit(1).alias("__side__"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt__"),
        *[F.col(c) for c in left.columns],
    )
    r_tag = right.select(
        F.col(right_key).alias("__key__"),
        F.col(right_time).alias("__time__"),
        F.lit(0).alias("__side__"),
        *[F.col(p) for p in payload],
        F.col(right_time).alias("__rt__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    unioned = l_tag.unionByName(r_tag)
    # nulls-first in BOTH directions (asc's default, but desc's is
    # nulls-LAST): a NULL-time left row must sort before every real
    # right row so it matches nothing — see the docstring contract.
    t_ord = (
        F.col("__time__").asc_nulls_first()
        if direction == "backward"
        else F.col("__time__").desc_nulls_first()
    )
    # side stays ascending in BOTH directions: the right row (side=0)
    # sorts before a left row at the same time, which is exactly what
    # makes the match inclusive on either side of the inequality.
    w = (
        Window.partitionBy("__key__")
        .orderBy(t_ord, "__side__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(p, ignorenulls=True).over(w).alias(p) for p in payload
    ]
    matched_t = F.last("__rt__", ignorenulls=True).over(w).alias("__mt__")
    out = (
        unioned.select("__side__", "__time__", *left.columns, *filled, matched_t)
        .filter(F.col("__side__") == 1)
        .drop("__side__")
    )
    if tolerance is not None:
        gap = F.abs(
            F.col("__time__").cast("double") - F.col("__mt__").cast("double")
        )
        keep = F.col("__mt__").isNotNull() & (gap <= F.lit(float(tolerance)))
        out = out.select(
            *left.columns,
            *[F.when(keep, F.col(p)).alias(p) for p in payload],
        )
    else:
        out = out.select(*left.columns, *payload)
    return out


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tolerance: float | None,
) -> DataFrame:
    """``direction="nearest"``: the closest right row by |Δtime|, ties
    going to the earlier (backward) match — pandas ``merge_asof``'s
    nearest semantics, pinned against pandas itself in
    tests/test_asof.py. Both legs ride ONE union and ONE hash shuffle:
    the backward leg is the standard last(ignorenulls) ascending
    window; the forward leg is first(ignorenulls) over
    [currentRow, unboundedFollowing] under the SAME partitioning with
    the side tie-break reversed (left before right at equal times
    would EXCLUDE the equal-time right row from the forward frame, so
    side orders right-first for backward and left-first for forward —
    two Sort operators sharing one Exchange). NULL-time left rows are
    guarded to match nothing (the forward frame of a nulls-first row
    would otherwise span the whole partition)."""
    right = right.filter(F.col(right_time).isNotNull())
    l_tag = left.select(
        F.col(left_key).alias("__key__"),
        F.col(left_time).alias("__time__"),
        F.lit(1).alias("__side__"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt__"),
        *[F.col(c) for c in left.columns],
    )
    r_tag = right.select(
        F.col(right_key).alias("__key__"),
        F.col(right_time).alias("__time__"),
        F.lit(0).alias("__side__"),
        *[F.col(p) for p in payload],
        F.col(right_time).alias("__rt__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    unioned = l_tag.unionByName(r_tag)
    # backward: right (side 0) sorts before left at equal time -> the
    # preceding-frame window sees it (inclusive <=)
    w_b = (
        Window.partitionBy("__key__")
        .orderBy(F.col("__time__").asc_nulls_first(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left (side 1) sorts before right at equal time -> the
    # following-frame window sees it (inclusive >=)
    w_f = (
        Window.partitionBy("__key__")
        .orderBy(F.col("__time__").asc_nulls_first(), F.col("__side__").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    has_t = F.col("__time__").isNotNull()
    cols = [
        *[
            F.when(has_t, F.last(p, ignorenulls=True).over(w_b)).alias(f"__b_{p}")
            for p in payload
        ],
        F.when(has_t, F.last("__rt__", ignorenulls=True).over(w_b)).alias("__bt__"),
        *[
            F.when(has_t, F.first(p, ignorenulls=True).over(w_f)).alias(f"__f_{p}")
            for p in payload
        ],
        F.when(has_t, F.first("__rt__", ignorenulls=True).over(w_f)).alias("__ft__"),
    ]
    both = (
        unioned.select("__side__", "__time__", *left.columns, *cols)
        .filter(F.col("__side__") == 1)
        .drop("__side__")
    )
    t = F.col("__time__").cast("double")
    gap_b = t - F.col("__bt__").cast("double")
    gap_f = F.col("__ft__").cast("double") - t
    in_tol_b = F.col("__bt__").isNotNull() & (
        F.lit(True) if tolerance is None else gap_b <= F.lit(float(tolerance))
    )
    in_tol_f = F.col("__ft__").isNotNull() & (
        F.lit(True) if tolerance is None else gap_f <= F.lit(float(tolerance))
    )
    # ties go backward (gap_b <= gap_f), the pandas contract
    pick_b = in_tol_b & (~in_tol_f | (gap_b <= gap_f))
    pick_f = ~pick_b & in_tol_f
    out = both.select(
        *left.columns,
        *[
            F.when(pick_b, F.col(f"__b_{p}"))
            .when(pick_f, F.col(f"__f_{p}"))
            .alias(p)
            for p in payload
        ],
    )
    return out
