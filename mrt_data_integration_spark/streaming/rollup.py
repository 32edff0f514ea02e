"""Streaming incremental aggregate maintenance (E6 × E11).

The batch half lives in ``operators.sketches``: mergeable rollup
STATES (counts add, sums add, HLL sketches union) persisted per
ingestion batch. This module is the streaming driver for the same
states — ``foreachBatch`` reduces every micro-batch to its state rows
and merges them into a versioned parquet state directory, so the
maintained aggregate is exactly what a periodic batch job would have
produced (tests pin final-state == direct-over-all-rows, HLL estimate
included), while only ever touching each raw row once as it streams
past.

Why ``foreachBatch`` rather than a stateful aggregation: the state
here is a TABLE the rest of the pipeline reads (a few rows per group,
parquet — queryable mid-stream, survives restarts by re-reading the
latest version), not per-key operator state inside a checkpoint.
Version directories are keyed by the micro-batch id (`state_v{batch_id}`),
which is what makes replays idempotent under foreachBatch's
at-least-once contract: a replayed batch re-reads the SAME predecessor
(the highest complete version with id < batch_id — never its own
partial output) and overwrites its own directory, rebuilding the
identical state instead of double-merging. Only directories whose
`_SUCCESS` marker exists count as versions, so a partially-written
directory from a mid-write crash is invisible to both the next merge
and the final read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mrt_data_integration_spark.operators import sketches as sk


def _latest_version(state_dir: str, below: int | None = None) -> int:
    """Highest COMPLETE state version (has a _SUCCESS marker), optionally
    restricted to versions strictly below ``below`` (a replaying batch
    must never read its own — possibly partial — prior output)."""
    if not os.path.isdir(state_dir):
        return -1
    versions = [
        int(d.split("_v")[1])
        for d in os.listdir(state_dir)
        if d.startswith("state_v")
        and d.split("_v")[1].isdigit()
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    ]
    if below is not None:
        versions = [v for v in versions if v < below]
    return max(versions, default=-1)


def merge_batch_into_state(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    group_cols: list[str],
    value_col: str,
    distinct_col: str,
) -> None:
    """One micro-batch merge step, idempotent under replay.

    Merges from the highest complete version BELOW this batch id and
    overwrites ``state_v{batch_id}``: replaying batch N (at-least-once
    delivery after a write-succeeded/commit-failed crash) re-reads the
    same predecessor and rebuilds the same v(N) instead of re-merging
    into its own output. Module-level (not a closure) so the replay
    contract is directly testable.
    """
    batch_state = sk.rollup_state(batch_df, group_cols, value_col, distinct_col)
    prev_v = _latest_version(state_dir, below=int(batch_id))
    if prev_v >= 0:
        prev = batch_df.sparkSession.read.parquet(
            os.path.join(state_dir, f"state_v{prev_v}")
        )
        merged = sk.merge_rollup_states(prev, batch_state)
    else:
        merged = batch_state
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"state_v{int(batch_id)}")
    )


def run_rollup_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    group_cols: list[str],
    value_col: str,
    distinct_col: str,
) -> DataFrame:
    """Drain a (bounded) event stream with ``availableNow``, maintaining
    the merged rollup state per micro-batch; returns the FINALIZED last
    state (group_cols..., n_rows, sum_value, distinct_est)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_state(
            batch_df, batch_id, state_dir, group_cols, value_col, distinct_col
        )

    q = (
        events_stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(state_dir, "_checkpoint")
        )
        .start()
    )
    q.awaitTermination()
    v = _latest_version(state_dir)
    final = spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))
    return sk.finalize_rollup(final)
