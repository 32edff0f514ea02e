"""Streaming SCD2 dimension maintenance.

The batch half lives in ``operators/scd.py``; this module keeps an
SCD2 history CURRENT against an unbounded change stream: each
micro-batch of change observations is folded into a versioned parquet
history table via ``scd2_merge`` — the standard CDC-ingest →
dimension-table pipeline, with the same versioned-state publication /
replay / pruning protocol every other stateful sink in this engine
uses (``streaming/rollup.py`` module docstring).

Ordering contract, stated plainly: ``scd2_merge`` assumes each batch's
observations are strictly later (by the sequence columns) than the
history's current rows. foreachBatch delivers batches in order within
a checkpoint lifetime, so the contract holds when the SOURCE is
ordered (e.g. a CDC log). Out-of-order events ACROSS micro-batches
would need the watermarked re-fold pattern (streaming/funnel.py)
instead — rejected here because a dimension changelog is an ordered
log by construction, and re-folding the full history per batch costs
O(history) where the merge costs O(affected keys).

At 100 TB the history table is the big side and each micro-batch is
tiny: the merge's broadcast semi/anti prune means a batch touching k
keys rewrites only those keys' version rows. Two state layouts:

- :func:`merge_scd2_updates` — the FLAT versioned-state copy
  (untouched closed rows are rewritten into each version). Right for
  small dimensions: below ~1M state rows the copy is cheaper than the
  bucketed path's bookkeeping (measured, results/LATE_R9_NOTES.md).
- :func:`merge_scd2_updates_bucketed` — the BUCKET-PARTITIONED state
  (streaming/rollup.py): a batch rewrites only the buckets holding
  its keys, everything else is carried by manifest reference. Per-
  batch cost is flat in history size (measured: at 4M rows the flat
  copy is already ~2× and grows without bound). The production path
  for large dimensions; the driver query routes through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mrt_data_integration_spark.operators.scd import (
    changelog_to_scd2,
    scd2_merge,
)


def merge_scd2_updates(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: list[str],
    tracked_cols: list[str],
    seq_cols: list[str],
    ts_col: str,
    chain: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
) -> None:
    """Compacting foreachBatch sink: fold one micro-batch of change
    observations into the versioned SCD2 history at ``state_dir``.

    First batch (no prior state) builds the history from scratch with
    ``changelog_to_scd2``; later batches fold incrementally with
    ``scd2_merge``. Publication, replay idempotence (a redelivered
    batch id reuses its complete version instead of re-merging), and
    version pruning are the shared protocol in
    ``streaming.rollup.merge_into_versioned_state``.

    ``op_col``/``delete_op`` (late r11) pass straight through to the
    batch operators: a CDC stream carrying delete tombstones maintains
    the same history the one-shot collapse of its full log would
    produce (stream == batch, deletes included — pinned by test).
    """
    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_versioned_state,
    )

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        if prev is None:
            return changelog_to_scd2(
                b, key_cols, tracked_cols, seq_cols, ts_col,
                op_col=op_col, delete_op=delete_op,
            )
        return scd2_merge(
            prev, b, key_cols, tracked_cols, seq_cols, ts_col,
            op_col=op_col, delete_op=delete_op,
        )

    merge_into_versioned_state(batch_df, batch_id, state_dir, merge, chain)


def read_scd2_history(spark, state_dir: str) -> DataFrame:
    """Latest complete SCD2 history (same reader contract as
    ``streaming.funnel.read_funnel_state``: lazy over a version the
    writer prunes only after two newer versions publish; a lingering
    reader that sees ENOENT re-calls)."""
    import os

    from mrt_data_integration_spark.streaming.rollup import _latest_version

    v = _latest_version(state_dir)
    if v < 0:
        raise FileNotFoundError(f"no complete SCD2 history in {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))


def stage_ordered_changelog(
    df: DataFrame, path: str, ts_col: str, cuts: list[str]
) -> None:
    """Write ``df`` as ``len(cuts)+1`` time-ordered parquet parts under
    ``path`` (part0..partN, split at the ``cuts`` boundary values of
    ``ts_col``), stamping strictly increasing file mtimes so a
    ``maxFilesPerTrigger=1`` file stream delivers them oldest-first.

    This is the staging half of the merge ordering contract (module
    doc): every part is strictly later by ``ts_col`` than the one
    before, so each micro-batch satisfies ``scd2_merge``'s
    strictly-later requirement by construction. Shared by the driver
    query (queries/joins.py streaming_scd2_history) and the scaling
    harness so the contract lives in ONE place.
    """
    import os

    from pyspark.sql import functions as F

    lo = None
    for i, hi in enumerate(list(cuts) + [None]):
        chunk = df
        if lo is not None:
            chunk = chunk.filter(F.col(ts_col) >= F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col(ts_col) < F.lit(hi))
        chunk.coalesce(1).write.parquet(os.path.join(path, f"part{i}"))
        lo = hi
    t0 = 1_600_000_000
    for i in range(len(cuts) + 1):
        d = os.path.join(path, f"part{i}")
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (t0 + 100 * i, t0 + 100 * i))


def merge_scd2_updates_bucketed(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: list[str],
    tracked_cols: list[str],
    seq_cols: list[str],
    ts_col: str,
    n_buckets: int = 16,
    chain: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
) -> None:
    """:func:`merge_scd2_updates` through the BUCKET-PARTITIONED
    versioned-state protocol (streaming/rollup.py) — the evolution the
    flat path's docstring names, now code: a micro-batch touching k
    keys reads and rewrites only the buckets holding those keys'
    version rows; every other bucket is carried by manifest reference.
    Per-batch cost drops from O(history) to O(history ×
    touched_buckets / n_buckets) — measured flat in total state size
    for fixed-width batches (results/LATE_R9_NOTES.md).

    Correct for the same reason the flat path is: ``scd2_merge``
    receives the prior state restricted to the affected buckets — a
    superset of the batch's keys within those buckets — and returns
    the full new history for exactly that keyspace (untouched keys in
    an affected bucket pass through inside the merge)."""
    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_bucketed_state,
    )

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        if prev is None:
            return changelog_to_scd2(
                b, key_cols, tracked_cols, seq_cols, ts_col,
                op_col=op_col, delete_op=delete_op,
            )
        return scd2_merge(
            prev, b, key_cols, tracked_cols, seq_cols, ts_col,
            op_col=op_col, delete_op=delete_op,
        )

    merge_into_bucketed_state(
        batch_df, batch_id, state_dir, merge, key_cols, n_buckets, chain
    )


def read_scd2_history_bucketed(spark, state_dir: str) -> DataFrame:
    """Latest complete bucketed SCD2 history (reader contract =
    rollup.read_bucketed_state)."""
    from mrt_data_integration_spark.streaming.rollup import (
        read_bucketed_state,
    )

    return read_bucketed_state(spark, state_dir)


def merge_cdc_updates_bucketed(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str | None = None,
    delete_op: str = "D",
    n_buckets: int = 16,
    chain: str | None = None,
) -> None:
    """SCD TYPE 1 through the bucket-partitioned state: fold each CDC
    micro-batch (upserts + deletes) into a current-row snapshot whose
    per-batch cost is O(touched buckets), not O(snapshot).

    This is the consumer the bucketed protocol's merge-side DELETION
    contract exists for (streaming/rollup.py, r10): a delete-heavy
    batch can empty a bucket's keyspace, and the manifest drops that
    bucket instead of resurrecting its stale prior rows — a semantics
    the SCD2 and funnel merge_fns (append-only keyspaces) never
    exercise. ``apply_cdc_changes`` is the merge_fn verbatim; its
    broadcast anti prune runs WITHIN the affected buckets' state.

    Ordering contract: batches apply in non-decreasing ``seq_cols``
    order per key (the module-doc CDC-log assumption); under it the
    drained snapshot equals the one-shot latest-event collapse —
    pinned by the stream==collapse identity test.
    """
    from mrt_data_integration_spark.operators.scd import apply_cdc_changes
    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_bucketed_state,
    )

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        return apply_cdc_changes(
            prev, b, key_cols, seq_cols, op_col, delete_op
        )

    merge_into_bucketed_state(
        batch_df, batch_id, state_dir, merge, key_cols, n_buckets, chain
    )


def read_cdc_snapshot_bucketed(spark, state_dir: str) -> DataFrame:
    """Latest complete bucketed type-1 snapshot (reader contract =
    rollup.read_bucketed_state)."""
    from mrt_data_integration_spark.streaming.rollup import (
        read_bucketed_state,
    )

    return read_bucketed_state(spark, state_dir)
