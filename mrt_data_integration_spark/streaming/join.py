"""Watermarked stream-stream interval join (E6+): the missing member of
the Structured Streaming family (rollup, sessions, stateful funnel,
ingest dedup — and now joins).

At 100 TB the two sides of an attribution join (ad impressions, clicks)
are both unbounded streams; the batch form (operators/rangejoin.py)
would rescan the full impression history for every click batch. The
streaming form holds each side in state ONLY for the interval the join
condition can still match:

- the condition bounds ``right_ts`` inside
  ``(left_ts + lower, left_ts + upper]``, so a left row is dead once the
  right watermark passes ``left_ts + upper`` and a right row once the
  left watermark passes ``right_ts - lower`` — Spark derives exactly
  these per-side eviction horizons from the join condition, which is
  why the time bounds MUST live in the join condition itself, not a
  post-join filter (a filter keeps the answer right but can leave the
  state unbounded if the optimizer fails to push it into the join).
- state is therefore O(rows per interval+delay window) forever, on an
  unbounded stream — the same boundedness contract as
  ``streaming/dedup.py``'s watermark eviction.

Both bounds follow the funnel family's convention
(operators/funnel.py): exclusive lower, inclusive upper —
``right_ts > left_ts + lower AND right_ts <= left_ts + upper``.

No reference counterpart (the reference has no streaming surface —
SURVEY.md §2.9); engine extension mandated by the driver's scale brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_delay: str = "1 hour",
    right_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``on`` equality plus the event-time
    interval ``right_ts in (left_ts + lower, left_ts + upper]``.

    ``lower``/``upper``/``*_delay`` are SQL day-time interval strings
    (``"12 hours"``, ``"-5 minutes"``). Column names must be disjoint
    apart from ``on`` (rename before joining — silent ambiguity
    resolution is how wrong attribution joins ship); the joined frame
    carries the key once.

    Only ``how="inner"`` is supported: outer stream-stream joins emit
    their null-matched rows only when a LATER batch advances the
    watermark past the row's horizon, so an ``availableNow`` drain can
    end with correct-but-unemitted rows still in state — a completeness
    contract this engine refuses to hand to callers silently. The batch
    twin (``operators/rangejoin.py``) covers outer shapes exactly.
    """
    if how != "inner":
        raise ValueError(
            "stream_interval_join supports how='inner' only: outer "
            "stream-stream join results are emitted on watermark advance "
            "and an availableNow drain can terminate before the final "
            "horizon — use the batch range join for outer shapes"
        )
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct names — the interval "
            "condition references both sides' event time"
        )
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint apart from the "
            f"join key {on!r}; rename these before joining: {sorted(overlap)}"
        )
    lw = left.withWatermark(left_ts, left_delay)
    rw = right.withWatermark(right_ts, right_delay)
    cond = (
        (lw[on] == rw[on])
        & (F.col(right_ts) > F.col(left_ts) + F.expr(f"INTERVAL '{lower}'"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL '{upper}'"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
