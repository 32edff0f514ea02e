"""Streaming constraint-audit maintenance — data-quality monitoring
run AS ingest happens instead of as a batch pass ("did this hour's
files break the quantity range?"): each micro-batch reduces to the
audit's mergeable sufficient statistic (constraint-grain
n_rows/n_violations counts — counts add), merges it into the
versioned state the rollup drain pioneered, and the finalized state
feeds the SAME finalize as the batch operator
(operators/quality_audit.audit_from_counts), so the drained stream's
audit is IDENTICAL to the batch audit over the union of all batches
(stream == batch pinned in tests/test_streaming_audit.py).

Scope — honestly stated: the drain maintains ROW-LEVEL constraint
classes (the one-scan conditional sums), whose statistic is a pure
count merge. Uniqueness and referential integrity need KEYED state
(seen-key sets / parent membership) and belong to batch-side
maintenance or a dedup-style stateful stream — the same boundary
streaming/scd.py documents for its history maintenance.

Scale shape per micro-batch: one constraint-grain aggregate of the
BATCH (map-side partial, output bounded by the constraint count),
then a state merge of two constraint-count frames — O(constraints)
per batch regardless of corpus size; the versioned-state publish is
O(constraints) too.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession

from mrt_data_integration_spark.operators.quality_audit import (
    audit_from_counts,
    merge_check_counts,
    row_check_counts,
)
from mrt_data_integration_spark.streaming.rollup import (
    _latest_version,
    checkpoint_chain_token,
    merge_into_versioned_state,
)


def merge_audit_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    table_name: str,
    checks: list[tuple[str, Column]],
    chain: str | None = None,
) -> None:
    """Audit instantiation of ``merge_into_versioned_state``: reduce
    the batch to constraint-grain counts and union-sum them with the
    predecessor state. ``checks`` predicates must be built from
    ``F.col`` (unbound), so the same spec drives batch and stream."""

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        batch_state = row_check_counts(b, table_name, checks)
        if prev is None:
            return batch_state
        return merge_check_counts(prev, batch_state)

    merge_into_versioned_state(batch_df, batch_id, state_dir, merge, chain)


def run_constraint_audit_stream(
    spark: SparkSession,
    rows_stream: DataFrame,
    state_dir: str,
    table_name: str,
    checks: list[tuple[str, Column]],
) -> DataFrame:
    """Drain a (bounded) row stream with ``availableNow``, maintaining
    the merged constraint-count state per micro-batch; returns the
    FINALIZED audit — (check_name, table_name, n_rows, n_violations,
    violation_rate, passed), identical to the batch
    :func:`~mrt_data_integration_spark.operators.quality_audit.row_checks`
    over the same rows."""
    ck = os.path.join(state_dir, "_checkpoint")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_audit_batch(
            batch_df,
            batch_id,
            state_dir,
            table_name,
            checks,
            chain=checkpoint_chain_token(ck),
        )

    q = (
        rows_stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(state_dir)
    if v < 0:
        raise RuntimeError(
            "run_constraint_audit_stream: no micro-batch was drained "
            f"(empty stream) — no state under {state_dir!r}"
        )
    state = spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))
    return audit_from_counts(state)
