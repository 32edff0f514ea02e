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


def _version_dirs(state_dir: str) -> list[tuple[int, str, bool]]:
    """Parse every state-version directory name in one place — the
    protocol's directory grammar must not be re-implemented per caller
    (read and prune would drift). Returns (version_id, dir_name,
    is_complete) for plain ``state_v{N}`` dirs AND their crash debris
    (``state_v{N}.build-xxxx`` from a killed builder,
    ``state_v{N}.debris.xxxx`` from a publish race) — debris parses to
    its version id but is never complete-eligible, so reads skip it
    and pruning reclaims it."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if not d.startswith("state_v"):
            continue
        head = d[len("state_v") :].split(".", 1)
        if not head[0].isdigit():
            continue
        plain = len(head) == 1
        complete = plain and os.path.exists(
            os.path.join(state_dir, d, "_SUCCESS")
        )
        out.append((int(head[0]), d, complete))
    return out


def _latest_version(state_dir: str, below: int | None = None) -> int:
    """Highest COMPLETE state version (has a _SUCCESS marker), optionally
    restricted to versions strictly below ``below`` (a replaying batch
    must never read its own — possibly partial — prior output)."""
    versions = [
        v
        for v, _d, complete in _version_dirs(state_dir)
        if complete and (below is None or v < below)
    ]
    return max(versions, default=-1)


_CHAIN_MARKER = "_chain"


def checkpoint_chain_token(checkpoint_dir: str) -> str:
    """Chain identity for ``merge_into_versioned_state``: the streaming
    checkpoint's ``metadata`` file holds the query's persistent UUID —
    stable across restarts FROM that checkpoint (where batch-id reuse
    is a true replay), fresh for a new checkpoint (where batch-id reuse
    is a collision). Falls back to the path if the file is unreadable
    (pre-start call) — still distinguishes different checkpoint dirs."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as fh:
            return fh.read().strip()
    except OSError:
        return os.path.abspath(checkpoint_dir)


def merge_into_versioned_state(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    merge_fn,
    chain: str | None = None,
) -> None:
    """One micro-batch step of the versioned-state protocol (module
    docstring): ``merge_fn(batch_df, prev_state_or_None)`` returns the
    new state DataFrame, which is published atomically as
    ``state_v{batch_id}``; versions (and crash debris) below the merge
    predecessor are pruned. Module-level (not a closure) so the replay
    contract is directly testable. Shared by the rollup and funnel
    sinks.

    ``chain`` identifies the WRITER'S chain (pass the checkpoint
    location — ``run_rollup_stream`` does): the complete-version reuse
    on replay is only sound when the redelivered batch is the SAME
    batch (same WAL offsets), which holds within one checkpoint
    lifetime but not across a fresh-checkpoint restart whose batch ids
    restart at 0 — there, reuse would silently discard the new
    stream's data into an id-colliding old version. The first merge
    records the token; a later mismatch is a loud error even when the
    ids happen to collide. ``None`` skips the check (single-process
    direct drivers of the protocol, e.g. tests)."""
    import shutil

    from mrt_data_integration_spark.sources.sinks import build_and_publish

    bid = int(batch_id)
    if chain is not None:
        os.makedirs(state_dir, exist_ok=True)
        marker = os.path.join(state_dir, _CHAIN_MARKER)
        if os.path.exists(marker):
            with open(marker) as fh:
                recorded = fh.read()
            if recorded != chain:
                raise ValueError(
                    f"state_dir {state_dir} belongs to chain "
                    f"{recorded!r} but this stream is {chain!r}: a "
                    "restart with a fresh checkpoint must use a fresh "
                    "state_dir (id-colliding versions from the old "
                    "chain would silently swallow this stream's data)"
                )
        else:
            with open(marker, "w") as fh:
                fh.write(chain)
    path = os.path.join(state_dir, f"state_v{bid}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        # replayed batch WITHIN the chain: content is deterministic
        # (WAL-pinned input + same predecessor) — the published version
        # IS the rebuild
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
    published = build_and_publish(
        path, "_SUCCESS", lambda tmp: merged.coalesce(1).write.parquet(tmp)
    )
    if published != path:
        # publish_build's contention fallbacks (serving tmp or debris)
        # mean state_v{bid} never gained its marker — the next batch
        # would silently merge from the older predecessor and drop this
        # batch's contribution. Concurrent writers on one state_dir are
        # a misconfiguration: fail loudly.
        raise RuntimeError(
            f"publishing {path} was contended (got {published}); "
            "two writers share this state_dir"
        )
    for v, d, _complete in _version_dirs(state_dir):
        if v < prev_v:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def merge_batch_into_state(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    group_cols: list[str],
    value_col: str,
    distinct_col: str,
    chain: str | None = None,
) -> None:
    """Rollup instantiation of ``merge_into_versioned_state``: reduce
    the batch to mergeable rollup state rows and union-merge them with
    the predecessor (counts add, sums add, HLL sketches union)."""

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        batch_state = sk.rollup_state(b, group_cols, value_col, distinct_col)
        if prev is None:
            return batch_state
        return sk.merge_rollup_states(prev, batch_state)

    merge_into_versioned_state(batch_df, batch_id, state_dir, merge, chain)


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

    ck = os.path.join(state_dir, "_checkpoint")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_state(
            batch_df,
            batch_id,
            state_dir,
            group_cols,
            value_col,
            distinct_col,
            # chain token = the checkpoint's persistent query UUID
            # (read per batch — the file exists once the stream runs):
            # a fresh checkpoint against this state_dir fails loudly
            # instead of colliding with the old chain's batch ids
            chain=checkpoint_chain_token(ck),
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
