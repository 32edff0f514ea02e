"""Streaming label-agreement maintenance — classifier-vs-reference
monitoring run AS ingest happens ("is the cheap language-ID still
agreeing with the labeled slice this hour?"): each micro-batch
reduces to the agreement family's mergeable sufficient statistic
(confusion-cell counts — counts add), merges it into the versioned
state the rollup drain pioneered, and the finalized state feeds the
SAME finalize as the batch operator
(operators/agreement.agreement_from_cells), so the drained stream's
agreement profile — per-class precision/recall/F1, accuracy, kappa —
is IDENTICAL to the batch profile over the union of all batches
(stream == batch pinned in tests/test_streaming_agreement.py).

Scale shape per micro-batch: one (ref, pred) hash aggregate of the
BATCH (map-side partial, bounded by the label-domain product), then a
state merge of two cell frames — O(label domain²) per batch
regardless of corpus size; the versioned-state publish is the same
bound.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession

from mrt_data_integration_spark.operators.agreement import (
    agreement_from_cells,
    confusion_cells,
    merge_confusion_cells,
)
from mrt_data_integration_spark.streaming.rollup import (
    _latest_version,
    checkpoint_chain_token,
    merge_into_versioned_state,
)


def merge_agreement_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    ref_col: "Column | str",
    pred_col: "Column | str",
    chain: str | None = None,
) -> None:
    """Agreement instantiation of ``merge_into_versioned_state``:
    reduce the batch to confusion cells and union-sum them with the
    predecessor state. Column arguments must be unbound (``F.col`` /
    column names), so the same spec drives batch and stream."""

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        batch_state = confusion_cells(b, ref_col, pred_col)
        if prev is None:
            return batch_state
        return merge_confusion_cells(prev, batch_state)

    merge_into_versioned_state(batch_df, batch_id, state_dir, merge, chain)


def run_agreement_stream(
    spark: SparkSession,
    rows_stream: DataFrame,
    state_dir: str,
    ref_col: "Column | str" = "ref",
    pred_col: "Column | str" = "pred",
) -> DataFrame:
    """Drain a (bounded) row stream with ``availableNow``, maintaining
    the merged confusion-cell state per micro-batch; returns the
    FINALIZED agreement profile — (label, n_ref, n_pred, n_correct,
    precision, recall, f1, accuracy, kappa), identical to the batch
    :func:`~mrt_data_integration_spark.operators.agreement.label_agreement`
    over the same rows."""
    ck = os.path.join(state_dir, "_checkpoint")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_agreement_batch(
            batch_df,
            batch_id,
            state_dir,
            ref_col,
            pred_col,
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
            "run_agreement_stream: no micro-batch was drained "
            f"(empty stream) — no state under {state_dir!r}"
        )
    state = spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))
    return agreement_from_cells(state)
