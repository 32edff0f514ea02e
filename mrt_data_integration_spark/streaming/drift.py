"""Streaming categorical-drift maintenance — the monitoring use the
drift family exists for ("did this hour's ingest move the language
mix?") run AS ingest happens instead of as a batch pass: each
micro-batch reduces to the profile's mergeable sufficient statistic
(per-category slice counts — counts add), merges it into the
versioned state the rollup drain pioneered, and the finalized state
feeds the SAME profile expressions as the batch operator — so the
drained stream's profile is IDENTICAL to the batch profile over the
union of all batches (stream == batch pinned in
tests/test_streaming_drift.py), not merely close.

Scale shape per micro-batch: one category-grain partial-agg shuffle
of the BATCH (bounded by the label domain), then a state merge whose
input is two label-domain-bounded frames — O(label domain) per batch
regardless of corpus size; the flat versioned-state publish cost is
O(label domain) too, so the rollup module's O(history) caveat is
moot here by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession

from mrt_data_integration_spark.operators.drift import (
    category_counts,
    ks_profile_from_value_counts,
    merge_category_counts,
    merge_value_counts,
    profile_from_category_counts,
    value_counts,
)
from mrt_data_integration_spark.streaming.rollup import (
    _latest_version,
    checkpoint_chain_token,
    merge_into_versioned_state,
)


def merge_drift_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    cat_col: str,
    in_a: Column,
    chain: str | None = None,
) -> None:
    """Drift instantiation of ``merge_into_versioned_state``: reduce
    the batch to (category, n_a, n_b) counts and union-sum them with
    the predecessor state."""

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        batch_state = category_counts(b, cat_col, in_a)
        if prev is None:
            return batch_state
        return merge_category_counts(prev, batch_state)

    merge_into_versioned_state(batch_df, batch_id, state_dir, merge, chain)


def run_category_drift_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    cat_col: str,
    in_a: Column,
) -> DataFrame:
    """Drain a (bounded) document stream with ``availableNow``,
    maintaining the merged count state per micro-batch; returns the
    FINALIZED drift profile — (cat_col, n_a, n_b, frac_a, frac_b,
    psi_term, chi2_term), identical to the batch
    :func:`~mrt_data_integration_spark.operators.drift.category_drift_profile`
    over the same rows."""
    ck = os.path.join(state_dir, "_checkpoint")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_drift_batch(
            batch_df,
            batch_id,
            state_dir,
            cat_col,
            in_a,
            chain=checkpoint_chain_token(ck),
        )

    q = (
        docs_stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(state_dir)
    if v < 0:
        raise RuntimeError(
            "run_category_drift_stream: no micro-batch was drained "
            f"(empty stream) — no state under {state_dir!r}"
        )
    state = spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))
    return profile_from_category_counts(state, cat_col)


def run_ks_drift_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    value_col: str,
    in_a: Column,
) -> DataFrame:
    """The KS complement of :func:`run_category_drift_stream`: drain a
    (bounded) document stream maintaining the VALUE-grain count state
    (the KS profile's mergeable sufficient statistic — per-value slice
    counts add); the finalized state feeds the batch operator's
    expressions verbatim, so the drained stream's CDF-difference
    profile equals the batch `two_sample_ks_profile` exactly. State
    per batch is bounded by the value DOMAIN (a length in characters),
    the same bound that makes the batch window sanctioned."""
    ck = os.path.join(state_dir, "_checkpoint")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
            batch_state = value_counts(b, value_col, in_a)
            if prev is None:
                return batch_state
            return merge_value_counts(prev, batch_state)

        merge_into_versioned_state(
            batch_df,
            batch_id,
            state_dir,
            merge,
            checkpoint_chain_token(ck),
        )

    q = (
        docs_stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(state_dir)
    if v < 0:
        raise RuntimeError(
            "run_ks_drift_stream: no micro-batch was drained "
            f"(empty stream) — no state under {state_dir!r}"
        )
    state = spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))
    return ks_profile_from_value_counts(state, value_col)
