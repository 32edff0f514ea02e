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
Versioned directories (`state_v{n}`) make each merge atomic — a batch
reads v(n-1) and writes v(n), never overwriting what it reads; on
failure the last complete version remains valid, and replaying a
micro-batch just rebuilds the same v(n) (the merge is deterministic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mrt_data_integration_spark.operators import sketches as sk


def _latest_version(state_dir: str) -> int:
    if not os.path.isdir(state_dir):
        return -1
    versions = [
        int(d.split("_v")[1])
        for d in os.listdir(state_dir)
        if d.startswith("state_v") and d.split("_v")[1].isdigit()
    ]
    return max(versions, default=-1)


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
        batch_state = sk.rollup_state(
            batch_df, group_cols, value_col, distinct_col
        )
        v = _latest_version(state_dir)
        if v >= 0:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(state_dir, f"state_v{v}")
            )
            merged = sk.merge_rollup_states(prev, batch_state)
        else:
            merged = batch_state
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"state_v{v + 1}")
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
