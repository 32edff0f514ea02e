"""Bucketed range (interval) join (E6 extension).

Joining points to intervals (events to campaign windows, log lines to
deploy windows, readings to maintenance periods) is a NON-EQUI join:
``ts >= start AND ts < end``. Spark executes that as
BroadcastNestedLoopJoin — every (event, interval) pair evaluated,
O(|events| × |intervals|), a guaranteed 100 TB death even when the
interval side is small, and an outright cross-join explosion when it
is not.

The scalable rewrite is the standard bucketing trick (Spark has no
native range-join optimization; Databricks' range-join hint does
exactly this internally): quantize time into ``granularity``-second
buckets, explode each interval into the buckets it overlaps, equi-join
on bucket, then re-check the exact predicate. The join becomes a hash/
sort-merge join keyed by bucket — shuffle cost ∝ rows + intervals ×
(length/granularity), never |L| × |R|. ``granularity`` dials the
trade: coarser → fewer exploded interval rows but more false-candidate
pairs filtered after the join; the answer is identical at any setting
(tests pin granularity-invariance).

Half-open semantics ``[start, end)`` — an event at exactly ``end``
belongs to the next window, so back-to-back windows never double-count
a boundary event.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, granularity_s: int) -> Column:
    # unix_micros keeps sub-second precision (unix_timestamp truncates);
    # the cast accepts TIMESTAMP_NTZ inputs (parquet NTZ columns) — the
    # engine pins the session timezone to UTC, so it is value-identity
    return F.floor(
        F.unix_micros(ts.cast("timestamp")) / F.lit(granularity_s * 1_000_000)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    granularity_s: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row with
    ``start <= ts < end``. Columns of both inputs pass through
    (names must not collide apart from the join being on time).

    ``how`` is restricted to ``inner``/``left``/``left_semi``/
    ``left_anti``: the bucket rewrite explodes each interval into one
    row per overlapped bucket, so for right/full outer an interval that
    matches nothing would surface once PER EXPLODED BUCKET ROW
    (length/granularity duplicate null-padded rows) instead of once.
    Point-side outer variants are unaffected — points are not exploded.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"range_join how={how!r} unsupported: the bucket rewrite "
            "explodes intervals, so right/full outer would emit one "
            "null-padded row per exploded bucket for unmatched intervals. "
            "Use inner/left (point-side) joins, or dedup unmatched "
            "intervals downstream."
        )
    p = points.withColumn("__bkt__", _bucket(F.col(ts_col), granularity_s))
    iv = intervals.withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), granularity_s),
                # end is exclusive but its bucket can still contain
                # qualifying points below it — include it
                _bucket(F.col(end_col), granularity_s),
            )
        ),
    )
    out = p.join(
        iv,
        (p["__bkt__"] == iv["__bkt__"])
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col)),
        how,
    )
    return out.drop("__bkt__")
