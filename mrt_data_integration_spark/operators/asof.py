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
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the latest right
    row with the same key and ``right_time <= left_time`` (inclusive).

    Right rows that tie on (key, time) must be pre-deduplicated by the
    caller (the result would otherwise be tie-broken arbitrarily).
    """
    l_tag = left.select(
        F.col(left_key).alias("__key__"),
        F.col(left_time).alias("__time__"),
        F.lit(1).alias("__side__"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
        *[F.col(c) for c in left.columns],
    )
    r_tag = right.select(
        F.col(right_key).alias("__key__"),
        F.col(right_time).alias("__time__"),
        F.lit(0).alias("__side__"),
        *[F.col(p) for p in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__key__")
        .orderBy("__time__", "__side__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(p, ignorenulls=True).over(w).alias(p) for p in payload
    ]
    return (
        unioned.select("__side__", *left.columns, *filled)
        .filter(F.col("__side__") == 1)
        .drop("__side__")
    )
