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

The versioned-state protocol (shared — ``merge_into_versioned_state``
is also the funnel compaction's write path, streaming/funnel.py):

- Version directories are keyed by the micro-batch id
  (``state_v{batch_id}``); only directories whose ``_SUCCESS`` marker
  exists count, so a mid-write crash is invisible to both the next
  merge and the final read.
- Each version is PUBLISHED atomically (build-private-then-rename via
  sources.sinks.build_and_publish), never overwritten in place: a
  reader mid-scan on a version can never have it deleted under it by
  a replaying writer.
- Replay idempotence: batch N's content is a deterministic function
  of its WAL-pinned input and its predecessor (highest complete
  version < N), so a replayed batch that finds its version COMPLETE
  reuses it and does no work; a partial one is rebuilt from the same
  predecessor.
- Versions strictly below the merge predecessor are PRUNED after each
  publish — no future batch or replay can read them (foreachBatch
  replays only the last uncommitted batch) — so the directory holds
  at most two complete versions and storage is O(one state), not
  O(states × batches). A reader that resolved a version two
  generations back may see ENOENT and should re-resolve (the same
  transient-retry contract publish_build documents).
- A batch id BELOW an existing newer complete version (a stream
  restarted with a fresh checkpoint against an old state_dir) is a
  loud error: silently forking a new chain would serve stale reads
  while discarding accumulated state.
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


def merge_into_versioned_state(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    merge_fn,
) -> None:
    """One micro-batch step of the versioned-state protocol (module
    docstring): ``merge_fn(batch_df, prev_state_or_None)`` returns the
    new state DataFrame, which is published atomically as
    ``state_v{batch_id}``; versions below the merge predecessor are
    pruned. Module-level (not a closure) so the replay contract is
    directly testable. Shared by the rollup and funnel sinks."""
    import shutil

    from mrt_data_integration_spark.sources.sinks import build_and_publish

    bid = int(batch_id)
    path = os.path.join(state_dir, f"state_v{bid}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        # replayed batch: content is deterministic (WAL-pinned input +
        # same predecessor) — the published version IS the rebuild
        return
    latest = _latest_version(state_dir)
    if latest > bid:
        raise ValueError(
            f"state chain in {state_dir} is at v{latest} but this "
            f"stream is writing batch {bid}: a restart with a fresh "
            "checkpoint must use a fresh state_dir (a silent new chain "
            "would serve stale reads and discard accumulated state)"
        )
    prev_v = _latest_version(state_dir, below=bid)
    prev = (
        batch_df.sparkSession.read.parquet(
            os.path.join(state_dir, f"state_v{prev_v}")
        )
        if prev_v >= 0
        else None
    )
    merged = merge_fn(batch_df, prev)
    build_and_publish(
        path, "_SUCCESS", lambda tmp: merged.coalesce(1).write.parquet(tmp)
    )
    for d in os.listdir(state_dir):
        tail = d.split("_v")[-1]
        if d.startswith("state_v") and tail.isdigit() and int(tail) < prev_v:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def merge_batch_into_state(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    group_cols: list[str],
    value_col: str,
    distinct_col: str,
) -> None:
    """Rollup instantiation of ``merge_into_versioned_state``: reduce
    the batch to mergeable rollup state rows and union-merge them with
    the predecessor (counts add, sums add, HLL sketches union)."""

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        batch_state = sk.rollup_state(b, group_cols, value_col, distinct_col)
        if prev is None:
            return batch_state
        return sk.merge_rollup_states(prev, batch_state)

    merge_into_versioned_state(batch_df, batch_id, state_dir, merge)


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
