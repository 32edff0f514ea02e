"""Streaming first-touch funnel (E6): the stateful twin of
``operators.funnel`` over an unbounded event stream.

Per-user state is the list of funnel-step events seen so far; every
micro-batch merges its new events and re-runs the SAME greedy fold the
batch operator uses on the sorted union, emitting the user's refreshed
stage times. Re-folding from state (rather than folding incrementally)
is what makes the result arrival-order independent: a step-1 event
arriving LATE with an earlier timestamp lowers the anchor and can
invalidate previously resolved stages — an incremental fold would have
discarded the step-2 candidates needed to re-resolve them, the re-fold
has them in state. Boundedness contract: state per user is its funnel-
step events only (the same per-user-bounded assumption the batch fold's
``collect_list`` makes, documented there), and the POPULATION of users
holding state is bounded by ``idle_timeout_seconds`` — idle users are
evicted, the way ``streaming/dedup.py`` bounds its keys by watermark —
so an open-ended stream accumulates state only for recently-active
users, not every user ever seen. Point truly unbounded per-user
streams at the batch ``bounded_history=False`` decomposition over a
table instead.

Output mode is ``update``: each batch emits one row per touched user
stamped with (``last_ts``, ``n_seen``); the CURRENT answer is the row
with the greatest such pair per user (``latest_stage_times`` wraps
this — event-time first, so it stays correct across a TTL eviction
where ``n_seen`` restarts).
Differential contract: after draining a bounded stream, stage times
equal the batch ``funnel_stage_times`` on the same rows exactly —
pinned by test and by the ``streaming_funnel_conversion`` query, whose
DuckDB oracle is the same 3-level min-join twin the batch query uses.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from mrt_data_integration_spark.streaming.stateful import arm_event_time_timeout


def _output_schema(n_steps: int) -> StructType:
    return StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_seen", LongType()),
            # max event time in state: the PRIMARY recency key for
            # reducing update-mode emissions. n_seen alone is not monotone
            # across a TTL eviction (a returning user restarts at 1), so
            # max_by(n_seen) would pin the stale pre-eviction row forever;
            # (last_ts, n_seen) is monotone in both regimes — event time
            # only moves forward across an eviction gap, and n_seen breaks
            # ties within a batch run where a late event leaves max ts
            # unchanged but revises stages.
            StructField("last_ts", TimestampType()),
        ]
        + [
            StructField(f"t{i + 1}", TimestampType())
            for i in range(n_steps)
        ]
    )


_NAT = np.datetime64("NaT", "us")

_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("tp_idx", ArrayType(LongType())),
    ]
)


def _fold(ts_us: list, tp_idx: list, steps: list[str], window_us: int):
    """The batch operator's greedy fold: events sorted by
    (ts, step-name string) — same tie order as array_sort over
    struct(ts, tp) — each stage set once by the first qualifying
    event."""
    order = sorted(range(len(ts_us)), key=lambda i: (ts_us[i], steps[int(tp_idx[i])]))
    stages: list = [None] * len(steps)
    for i in order:
        t, s = ts_us[i], int(tp_idx[i])
        if s == 0:
            if stages[0] is None:
                stages[0] = t
        else:
            prev = stages[s - 1]
            if (
                stages[s] is None
                and prev is not None
                and t > prev
                and t <= prev + window_us
            ):
                stages[s] = t
    return stages


def funnel_stream(
    events_stream: DataFrame,
    steps: list[str],
    window_seconds: int = 12 * 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    idle_timeout_seconds: float | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Stateful streaming funnel: emits (user_id, n_seen, last_ts,
    t1..tk) rows in update mode; the greatest-(last_ts, n_seen) row per
    user is the current answer.

    ``idle_timeout_seconds`` bounds state on an OPEN-ENDED stream (r6
    verdict): without it, per-user state persists for every user ever
    seen — a one-touch visitor who never returns still occupies the
    state store forever. With it, a user is EVICTED once the WATERMARK
    passes (their latest funnel event + TTL) — event-time timeout, not
    wall-clock, chosen deliberately: eviction is then a deterministic
    function of the data (replay/backfill produce identical state at
    every batch), and an ``availableNow`` drain terminates (a
    processing-time timeout keeps an availableNow query scheduling
    empty wall-clock batches forever). Eviction calls ``state.remove()``
    and emits nothing — the user's last update-mode row remains the
    standing answer downstream. The trade, stated honestly: an evicted
    user who DOES return restarts with empty history, so pick a TTL ≥
    ``window_seconds``: any post-eviction event is ≥ TTL of event time
    past the user's last event, hence outside the window of every
    resolved stage — it could only have started a NEW funnel, which an
    empty re-fold handles correctly. ``watermark_delay`` is the late-
    data horizon (events later than this are the same watermark trade
    ``streaming/dedup.py`` documents). Default ``None`` keeps the
    unbounded exact behavior for finite backfills; truly unbounded
    per-user histories belong to the batch ``bounded_history=False``
    decomposition (module docstring).
    """
    window_us = window_seconds * 1_000_000
    idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)
    out_schema = _output_schema(n_steps)
    timeout_ms = int(idle_timeout_seconds * 1000) if idle_timeout_seconds else 0

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if timeout_ms and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ts_us, tp_idx = state.get
            ts_us, tp_idx = list(ts_us), list(tp_idx)
        else:
            ts_us, tp_idx = [], []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            ts_us.extend(
                pdf[ts_col].astype("datetime64[us]").astype("int64").tolist()
            )
            tp_idx.extend(int(idx[t]) for t in pdf[type_col])
            state.update((ts_us, tp_idx))
        if timeout_ms and ts_us:
            # Re-arm per invocation: deadline = latest event + TTL in
            # EVENT time (shared clamp protocol — see
            # streaming.stateful.arm_event_time_timeout).
            arm_event_time_timeout(state, max(ts_us), timeout_ms)
        stages = _fold(ts_us, tp_idx, steps, window_us)
        # One tiny frame per group per batch: build it from dtype-typed
        # numpy arrays. pd.DataFrame([dict]) + astype costs ~1 ms per
        # group — at 10³+ users per micro-batch that construction alone
        # dominated the whole drain (measured 1.07 ms → 0.10 ms here).
        data = {
            # pd.array handles a null group key (np.array(int64) would
            # throw on None — the old dict-row path accepted it)
            "user_id": pd.array([user_id], dtype="Int64"),
            "n_seen": np.array([len(ts_us)], dtype="int64"),
            "last_ts": np.array(
                [_NAT if not ts_us else max(ts_us)], dtype="datetime64[us]"
            ),
        }
        for i, t in enumerate(stages):
            data[f"t{i + 1}"] = np.array(
                [_NAT if t is None else t], dtype="datetime64[us]"
            )
        yield pd.DataFrame(data)

    filtered = events_stream.filter(
        F.col(type_col).isin(list(steps))
    ).select(F.col(user_col).alias("user_id"), ts_col, type_col)
    if timeout_ms:
        filtered = filtered.withWatermark(ts_col, watermark_delay)
    return filtered.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout,
    )


def merge_funnel_updates(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    ttl_seconds: float | None = None,
    chain: str | None = None,
) -> None:
    """Compacting foreachBatch sink for the funnel's update stream:
    merges each micro-batch's per-user update rows into a versioned
    parquet state table, keeping only the greatest-(last_ts, n_seen)
    row per user. An append-only update log grows as O(updates) on an
    open-ended stream and every \"current state\" read rescans all of
    it; the compacted table plus the protocol's version pruning keeps
    disk at O(retained users) — AT MOST TWO versions exist at a time.

    ``ttl_seconds`` bounds the RETAINED population the way
    ``idle_timeout_seconds`` bounds the operator's internal state:
    without it, a drive-by visitor's last row is carried into every
    future version forever, so a single version still grows as
    O(users ever seen) on a high-churn stream. With it, rows whose
    ``last_ts`` is older than (max last_ts in the merged state − TTL)
    are dropped at each merge — event-time, hence deterministic under
    replay, computed in a single global-window pass over the compacted
    state (one task, matched to a table the protocol writes as one
    file; the inline note covers the at-scale alternative). Pair it
    with the operator's own TTL (same horizon) so the serving table
    and the state store expire together.

    Versioning/replay/pruning/stale-chain semantics are the shared
    protocol in ``streaming.rollup.merge_into_versioned_state`` (see
    that module's docstring). At corpus scale, swap the single-file
    write for a user-bucketed partitioned write; the merge stays one
    shuffle."""
    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_versioned_state,
    )

    rec = F.struct(F.col("last_ts"), F.col("n_seen"))

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        cols = b.columns
        merged_in = b if prev is None else b.unionByName(prev.select(cols))
        compacted = (
            merged_in.groupBy("user_id")
            .agg(F.max_by(F.struct(*cols), rec).alias("r"))
            .select("r.*")
        )
        # `is not None`, not truthiness: ttl_seconds=0 means "evict
        # everything older than the max timestamp", matching the
        # bucketed reader (r10 — the two paths must serve the same set
        # at every parameter value, including 0).
        if ttl_seconds is not None:
            # single pass: a global window computes the cutoff without
            # re-executing the union+compaction lineage (an agg +
            # cross-join would run it twice). The empty partitionBy
            # funnels the state through one task — fine for a table the
            # protocol writes as ONE file anyway; at a scale where that
            # bites, derive the horizon from the operator's watermark
            # instead.
            from pyspark.sql import Window as W

            cutoff = F.max("last_ts").over(
                W.partitionBy()
            ) - F.make_interval(secs=F.lit(float(ttl_seconds)))
            compacted = (
                # window expressions are not allowed in WHERE — project
                # the cutoff first, then filter on the plain column
                compacted.withColumn("__cutoff__", cutoff)
                .where(F.col("last_ts") >= F.col("__cutoff__"))
                .drop("__cutoff__")
            )
        return compacted

    merge_into_versioned_state(batch_df, batch_id, state_dir, merge, chain)


def read_funnel_state(spark, state_dir: str) -> DataFrame:
    """Latest complete compacted funnel state (one row per retained
    user, with the recency columns still attached — feed to
    ``latest_stage_times`` or select t1..tk directly; for a compacted
    table they agree).

    Reader contract: the returned DataFrame is lazy over a version the
    writer prunes only after TWO newer versions publish, so a reader
    that consumes promptly (within a micro-batch interval) never loses
    its snapshot; one that lingers past the pruning horizon can see
    ENOENT mid-scan and should re-call this function — the same
    transient-retry contract publish_build documents."""
    import os

    from mrt_data_integration_spark.streaming.rollup import _latest_version

    v = _latest_version(state_dir)
    if v < 0:
        raise FileNotFoundError(f"no complete funnel state in {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))


def latest_stage_times(updates: DataFrame, n_steps: int) -> DataFrame:
    """Reduce the update stream's emissions to the current per-user
    stage times: the row with the greatest (last_ts, n_seen) wins.
    Event-time-first ordering makes the reduction correct ACROSS a TTL
    eviction — a returning user's fresh rows carry later event time and
    supersede the stale pre-eviction rows even though their n_seen
    restarted at 1 (max_by(n_seen) alone would report the abandoned
    pre-eviction funnel forever)."""
    recency = F.struct(F.col("last_ts"), F.col("n_seen"))
    return updates.groupBy("user_id").agg(
        *[
            F.max_by(f"t{i + 1}", recency).alias(f"t{i + 1}")
            for i in range(n_steps)
        ]
    )


def merge_funnel_updates_bucketed(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    n_buckets: int = 16,
    chain: str | None = None,
) -> None:
    """:func:`merge_funnel_updates` through the BUCKET-PARTITIONED
    versioned-state protocol (streaming/rollup.py — the "user-bucketed
    partitioned write" the flat docstring names): a micro-batch
    rewrites only the buckets holding its users' rows; per-batch cost
    is flat in the retained population (measured for the SCD2 twin in
    results/LATE_R9_NOTES.md — parity below ~1M state rows, the flat
    copy doubles by 4M).

    TTL is NOT a merge-side parameter here: the flat path's eviction
    cutoff is a GLOBAL max(last_ts), which a merge that sees only the
    affected buckets cannot compute — and rewriting every bucket to
    evict would reintroduce the O(history) copy. Evict at READ time
    instead (:func:`read_funnel_state_bucketed`'s ``ttl_seconds``):
    the final serving set is IDENTICAL (cutoff horizons are monotone
    in event time, so any row an earlier merge-side horizon dropped is
    also outside the final read-side horizon); the difference is
    disk-residency of expired rows in untouched buckets, bounded by
    touch frequency."""
    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_bucketed_state,
    )

    rec = F.struct(F.col("last_ts"), F.col("n_seen"))

    def merge(b: DataFrame, prev: DataFrame | None) -> DataFrame:
        cols = b.columns
        merged_in = b if prev is None else b.unionByName(prev.select(cols))
        return (
            merged_in.groupBy("user_id")
            .agg(F.max_by(F.struct(*cols), rec).alias("r"))
            .select("r.*")
        )

    merge_into_bucketed_state(
        batch_df, batch_id, state_dir, merge, ["user_id"], n_buckets, chain
    )


def read_funnel_state_bucketed(
    spark, state_dir: str, ttl_seconds: float | None = None
) -> DataFrame:
    """Latest complete bucketed funnel state, with optional READ-side
    TTL eviction (see :func:`merge_funnel_updates_bucketed` for why
    eviction moves to the read in the bucketed layout)."""
    from mrt_data_integration_spark.streaming.rollup import (
        read_bucketed_state,
    )

    state = read_bucketed_state(spark, state_dir)
    # `is not None`, not truthiness: ttl_seconds=0 means "evict
    # everything older than the max timestamp", not TTL-disabled
    # (ADVICE r9). The global max(last_ts) is a partial-aggregated
    # 1-row frame crossJoined back (plans as BroadcastNestedLoopJoin
    # over one row — the engine's sanctioned stats-broadcast pattern),
    # NOT an unpartitioned window: W.partitionBy() funnels the ENTIRE
    # state through one reducer at serve time, defeating the bucketed
    # layout's reason to exist (ADVICE r9).
    if ttl_seconds is not None:
        cutoff = state.agg(
            (
                F.max("last_ts")
                - F.make_interval(secs=F.lit(float(ttl_seconds)))
            ).alias("__cutoff__")
        )
        state = (
            state.crossJoin(F.broadcast(cutoff))
            .where(F.col("last_ts") >= F.col("__cutoff__"))
            .drop("__cutoff__")
        )
    return state
