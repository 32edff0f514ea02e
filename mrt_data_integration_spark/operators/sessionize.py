"""Event sessionization (SURVEY.md §2.9 E6) — gap-based sessions in batch.

Two windows over one per-user shuffle:
  1. lag(ts) per user → gap seconds → session-start flag;
  2. running sum of flags → session ordinal.

Gap comparison uses whole-second boundary counts (floor semantics) so the
result is identical to ANSI-SQL ``date_diff('second', ...)`` oracles.
At 100 TB the single shuffle is keyed by user_id (high-cardinality); for
streaming the same semantics come from ``session_window(ts, gap)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Append a ``session_id`` (1-based per user) to each event row."""
    w_order = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w_order)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new_sess__", is_new).withColumn(
        "session_id", F.sum("__new_sess__").over(w_run)
    ).drop("__new_sess__")
