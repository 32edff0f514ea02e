"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9 E6 — the seam Structured Streaming's built-in windows
can't express; reference batch semantics in operators/sessionize.py).

Two operators:

- ``capped_sessionize_stream``: gap-based sessions with a MAXIMUM
  session duration. ``session_window`` merges any chain of events with
  gaps ≤ g into one unbounded session; production sessionization
  (and the reference's 30-minute analytics convention) usually also
  cuts a session at a hard cap (e.g. 4 h) to bound dwell-time skew.
  That cut depends on each session's running start — per-key state, not
  a window expression — so it needs the arbitrary-state API.
- ``user_running_totals_stream``: per-user lifetime counters carried
  across micro-batches (n_events, sum_value) — the streaming twin of a
  batch ``groupBy(user).agg`` that emits refreshed totals every batch.

Scale design: state is keyed by user_id (high-cardinality → even
distribution over state-store partitions); each key holds O(1) numbers,
so the state store is O(users), never O(events) — and with
``idle_timeout_seconds`` set, O(recently-active users): a key idle for
that much EVENT time is evicted once the watermark passes its deadline
(r6 verdict; the same boundedness ``streaming/dedup.py`` gets from its
watermark, and deterministic under replay — a wall-clock timeout would
make state depend on drain pacing and never let an ``availableNow``
backfill terminate). Arrow batches flow
per group — no row-at-a-time Python. A group's micro-batch rows arrive
as multiple Arrow chunks in arbitrary order, so the sessionizer
materializes the group and sorts ONCE by (ts, event_id) before the
sequential pass (micro-batch order is not event order); ties break on
event_id like the batch operator.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_ordinal", LongType()),
        StructField("session_start", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

# (session_ordinal, session_start_us, last_ts_us, n_events, session_value)
_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("ordinal", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value", DoubleType()),
    ]
)

TOTALS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_TOTALS_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("sum_value", DoubleType())]
)


def arm_event_time_timeout(
    state: GroupState, last_event_us: int, timeout_ms: int
) -> None:
    """Arm this group's EVENT-time timeout at (latest event + TTL).

    The one shared clamp protocol for every stateful operator (funnel,
    capped sessions, running totals): Spark rejects a deadline at or
    below the current watermark — reachable whenever a group's newest
    event is already older than (watermark − TTL) — so such a deadline
    is clamped to watermark + 1 ms. The group then lingers exactly one
    more watermark advance before evicting, instead of erroring the
    batch. ``last_event_us`` is epoch MICROseconds (the operators'
    common state unit); GroupState deadlines are epoch milliseconds.
    """
    state.setTimeoutTimestamp(
        max(
            int(last_event_us) // 1000 + timeout_ms,
            state.getCurrentWatermarkMs() + 1,
        )
    )


def _capped_session_fn(gap_seconds: int, cap_seconds: int, timeout_ms: int = 0):
    gap_us = gap_seconds * 1_000_000
    cap_us = cap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if timeout_ms and state.hasTimedOut:
            # Idle eviction: the open session's latest snapshot was
            # already emitted (update mode re-emits on every growth), so
            # dropping state closes it without changing any emitted row.
            state.remove()
            return
        if state.exists:
            ordinal, start_us, last_us, n_events, value = state.get
        else:
            ordinal, start_us, last_us, n_events, value = 0, None, None, 0, 0.0
        out: list[tuple] = []
        # applyInPandasWithState delivers a group's micro-batch rows as
        # MULTIPLE Arrow chunks (default ~10k rows each) in arbitrary
        # order. Sorting each chunk independently would process events
        # out of time order across chunk boundaries exactly when groups
        # are large, so materialize the whole group, then sort ONCE.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            # normalize to epoch MICROS regardless of the pandas
            # datetime unit this Arrow batch carries (ns vs us differs
            # across pandas/Arrow versions)
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            vals = pdf["value"].to_numpy()
            for t, v in zip(ts_us, vals):
                new_session = (
                    last_us is None
                    or (t - last_us) > gap_us
                    or (t - start_us) > cap_us
                )
                if new_session:
                    if last_us is not None:
                        out.append(
                            (user_id, ordinal, start_us, last_us, n_events, value)
                        )
                    ordinal += 1
                    start_us, n_events, value = t, 0, 0.0
                last_us = t
                n_events += 1
                value += float(v)
        # Emit the still-open session's current snapshot too, so the
        # sink always has the latest per-session aggregate (update-mode
        # semantics; the next batch re-emits it if it grows).
        if last_us is not None:
            out.append((user_id, ordinal, start_us, last_us, n_events, value))
        state.update((ordinal, int(start_us), int(last_us), int(n_events), value))
        if timeout_ms and last_us is not None:
            arm_event_time_timeout(state, last_us, timeout_ms)
        if out:
            res = pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_ordinal",
                    "session_start",
                    "last_ts",
                    "n_events",
                    "session_value",
                ],
            )
            res["session_start"] = pd.to_datetime(res["session_start"], unit="us")
            res["last_ts"] = pd.to_datetime(res["last_ts"], unit="us")
            res["session_value"] = res["session_value"].round(4)
            yield res

    return fn


def capped_sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    cap_seconds: int = 4 * 3600,
    idle_timeout_seconds: float | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap + max-duration sessionization over an event stream.

    A new session starts when the inactivity gap exceeds
    ``gap_seconds`` OR the session would exceed ``cap_seconds`` from
    its start — the latter is the clause ``session_window`` cannot
    express. Emits an updated (user_id, session_ordinal) aggregate row
    whenever a session grows or closes; downstream consumers keep the
    last row per (user_id, session_ordinal).

    ``idle_timeout_seconds`` (r6 verdict): evicts a user's state once
    the WATERMARK passes (their last event + TTL) — event-time, so
    eviction is deterministic under replay and an ``availableNow``
    backfill terminates. Safe whenever TTL ≥ ``gap_seconds`` + the
    late-data horizon: an evicted user's next event would have started
    a new session anyway (the gap already exceeded ``gap_seconds``), so
    no session's BOUNDARIES or AGGREGATES ever change. The ordinal
    counter, however, restarts at 1 for a returning user (the count
    lived in the evicted state) — so when a TTL is set, consumers must
    key sessions by the collision-free (user_id, session_start) pair
    that every emitted row carries, NOT by (user_id, session_ordinal):
    a keep-last-per-ordinal consumer would overwrite the user's
    historical session 1 with the post-eviction session. Without a TTL
    the ordinal is a valid per-user key, as the bundled
    `stateful_capped_sessions` query (no TTL) uses it.
    """
    timeout_ms = int(idle_timeout_seconds * 1000) if idle_timeout_seconds else 0
    if timeout_ms:
        events = events.withWatermark("ts", watermark_delay)
    return events.groupBy("user_id").applyInPandasWithState(
        _capped_session_fn(gap_seconds, cap_seconds, timeout_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout,
    )


def _totals_fn_factory(timeout_ms: int = 0):
    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if timeout_ms and state.hasTimedOut:
            # The user's last emitted totals row stands; dropping state
            # frees the slot. A returning user restarts from zero — the
            # documented trade for bounded state (caller's TTL choice).
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        last_ts_us = None
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
            if timeout_ms and len(pdf):
                m = int(pd.Timestamp(pdf["ts"].max()).value) // 1_000
                last_ts_us = m if last_ts_us is None else max(last_ts_us, m)
        state.update((int(n), float(s)))
        if timeout_ms and last_ts_us is not None:
            arm_event_time_timeout(state, last_ts_us, timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 4)]}
        )

    return fn


def user_running_totals_stream(
    events: DataFrame,
    idle_timeout_seconds: float | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Per-user lifetime (n_events, sum_value), refreshed every
    micro-batch — O(1) state per user; with ``idle_timeout_seconds``
    set, O(recently-active users) state total (a user whose last event
    is that much event-time behind the watermark is evicted, their last
    emission standing — lifetime exactness then holds only for users
    never idle longer than the TTL)."""
    timeout_ms = int(idle_timeout_seconds * 1000) if idle_timeout_seconds else 0
    if timeout_ms:
        events = events.withWatermark("ts", watermark_delay)
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn_factory(timeout_ms),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    df: DataFrame,
    fingerprint_col,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``operators.dedup.exact_dedup``: keep the first
    event per fingerprint, with dedup state bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — exact within the late-data
    horizon, O(distinct keys inside the watermark) state instead of
    O(stream); the batch operator is the unbounded-history reference).
    """
    return (
        df.withColumn("__fp__", fingerprint_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp__"])
        .drop("__fp__")
    )
