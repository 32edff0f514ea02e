"""Structured Streaming twins vs their batch counterparts: the stream
(availableNow over a parquet directory) must produce the same hourly
rollup the batch query produces, and session_window sessionization must
agree with the lag-gap batch operator on session counts.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.sessionize import sessionize
from mrt_data_integration_spark.queries.timeseries import events_hourly_rollup
from mrt_data_integration_spark.sources import load_table
from mrt_data_integration_spark.streaming.windows import (
    hourly_rollup_stream,
    read_event_stream,
    run_to_memory,
    sessionize_stream,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Materialize sf0.001 events as a streamable parquet directory
    (micro-timestamp form, multiple files → multiple micro-batches)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_hourly_rollup_stream_matches_batch(spark, stream_dir):
    stream = hourly_rollup_stream(read_event_stream(spark, stream_dir))
    got = run_to_memory(stream, "hourly_mem", spark).toPandas()
    want = (
        events_hourly_rollup(spark, "/root/testdata/sf0.001")
        .drop("n_users")
        .toPandas()
    )
    key = ["hour_key", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["n_events"].to_numpy() == w["n_events"].to_numpy()).all()
    assert abs(g["sum_value"].to_numpy() - w["sum_value"].to_numpy()).max() < 1e-9


def test_sessionize_stream_matches_batch(spark, stream_dir):
    stream = sessionize_stream(read_event_stream(spark, stream_dir))
    got = run_to_memory(stream, "sess_mem", spark)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    batch = sessionize(ev, gap_seconds=1800).groupBy("user_id", "session_id").count()
    # same number of sessions per user (window semantics are equivalent
    # for gap-based sessions; boundary conventions both use > gap).
    got_per_user = got.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    want_per_user = (
        batch.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    )
    assert got_per_user.sort_index().equals(want_per_user.sort_index())


def test_stream_is_incremental(spark, stream_dir):
    # availableNow over 4 files must process all input (files count > 1
    # proves multi-batch capability of the source setup).
    n_files = len([f for f in os.listdir(stream_dir) if f.endswith(".parquet")])
    assert n_files >= 2

def test_user_running_totals_stateful(spark, stream_dir):
    """applyInPandasWithState totals must equal the batch groupBy after
    the stream drains (state carries across micro-batches)."""
    from mrt_data_integration_spark.streaming.stateful import (
        user_running_totals_stream,
    )

    stream = user_running_totals_stream(read_event_stream(spark, stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("totals_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("totals_mem")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            # latest snapshot = most events; max(sum_value) breaks on
            # negative event values
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert got["n_events"].equals(want["n_events"])
    assert (got["sum_value"] - want["sum_value"]).abs().max() < 1e-6


def test_capped_sessionize_stateful(spark, stream_dir):
    """The stateful gap+cap sessionizer must agree with a local pandas
    reference on final per-session aggregates, and a tight cap must
    produce at least as many sessions as the uncapped gap rule."""
    from mrt_data_integration_spark.streaming.stateful import (
        capped_sessionize_stream,
    )

    gap_s, cap_s = 1800, 3600
    stream = capped_sessionize_stream(
        read_event_stream(spark, stream_dir), gap_seconds=gap_s, cap_seconds=cap_s
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("capped_sess_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("capped_sess_mem")
        .groupBy("user_id", "session_ordinal")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("session_value", "n_events").alias("session_value"),
        )
        .toPandas()
        .sort_values(["user_id", "session_ordinal"])
        .reset_index(drop=True)
    )

    # local reference: same sequential rule over the sorted events
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    rows = []
    for uid, g in ev.groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = g["value"].to_numpy()
        ordinal, start, last, n, v = 0, None, None, 0, 0.0
        for t, val in zip(ts, vals):
            if last is None or (t - last) > gap_s * 1e6 or (t - start) > cap_s * 1e6:
                if last is not None:
                    rows.append((uid, ordinal, n, round(v, 4)))
                ordinal += 1
                start, n, v = t, 0, 0.0
            last = t
            n += 1
            v += float(val)
        rows.append((uid, ordinal, n, round(v, 4)))
    import pandas as pd

    want = (
        pd.DataFrame(rows, columns=["user_id", "session_ordinal", "n_events", "session_value"])
        .sort_values(["user_id", "session_ordinal"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["n_events"].equals(want["n_events"])
    assert (got["session_value"] - want["session_value"]).abs().max() < 1e-6

    # the cap can only split sessions, never merge them
    n_uncapped = (
        sessionize(load_table(spark, "/root/testdata/sf0.001", "events"), gap_seconds=gap_s)
        .select("user_id", "session_id")
        .distinct()
        .count()
    )
    assert len(got) >= n_uncapped


def test_capped_session_fn_multichunk_order(spark):
    """applyInPandasWithState hands a group's rows to the UDF as MULTIPLE
    Arrow chunks in arbitrary order. Feed the sessionizer the same events
    split across shuffled chunks and as one chunk — the emitted sessions
    must be identical (the group is materialized and sorted once, not
    per-chunk)."""
    import pandas as pd

    from mrt_data_integration_spark.streaming.stateful import _capped_session_fn

    class FakeState:
        exists = False

        def update(self, value):
            self.exists = True
            self.value = value

        @property
        def get(self):
            return self.value

    # 12 events, 1 min apart -> one gap-session, but a 5-min cap splits it.
    base = 1_700_000_000_000_000  # epoch micros
    ev = pd.DataFrame(
        {
            "user_id": 7,
            "ts": pd.to_datetime([base + i * 60_000_000 for i in range(12)], unit="us"),
            "event_id": range(12),
            "value": [float(i) for i in range(12)],
        }
    )
    fn = _capped_session_fn(gap_seconds=1800, cap_seconds=300)

    def run(chunks):
        state = FakeState()
        out = pd.concat(list(fn((7,), chunks, state)), ignore_index=True)
        # update-mode re-emits growing sessions; keep the last snapshot
        return (
            out.groupby(["user_id", "session_ordinal"])
            .last()
            .reset_index()
            .sort_values("session_ordinal")
            .reset_index(drop=True)
        )

    whole = run([ev])
    # chunks delivered newest-first, each internally shuffled
    shuffled = [
        ev.iloc[[11, 8, 10, 9]].reset_index(drop=True),
        ev.iloc[[5, 7, 4, 6]].reset_index(drop=True),
        ev.iloc[[2, 0, 3, 1]].reset_index(drop=True),
    ]
    split = run(shuffled)
    pd.testing.assert_frame_equal(whole, split)
    # 12 events / 5-min cap at 1-min spacing -> 6-event sessions -> 2 total
    assert list(whole["n_events"]) == [6, 6]


def test_dedup_stream_drops_replayed_events(spark, tmp_path):
    """Exact streaming dedup: a source containing every event TWICE (two
    file sets -> duplicates across micro-batches) must emit each
    fingerprint once (state keyed by fingerprint, watermark-bounded)."""
    from mrt_data_integration_spark.streaming.stateful import dedup_stream

    d = str(tmp_path / "doubled")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(2).write.mode("overwrite").parquet(d)
    ev.repartition(3).write.mode("append").parquet(d)
    stream = dedup_stream(
        read_event_stream(spark, d),
        fingerprint_col=F.concat_ws("|", "event_id", "user_id"),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_mem")
    total = ev.count()
    assert got.count() == total  # doubled input, each event emitted once
    assert got.select("event_id").distinct().count() == total


def test_checkpoint_restart_exactly_once(spark, stream_dir, tmp_path):
    """Kill-and-resume: drain one micro-batch with a checkpoint, stop,
    restart from the same checkpoint — the final totals must equal the
    batch aggregate with no double-counting (file-source offsets +
    state store recover exactly-once)."""
    from mrt_data_integration_spark.streaming.stateful import (
        user_running_totals_stream,
    )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start(stop_after_first: bool):
        src = (
            spark.readStream.schema(
                load_table(spark, "/root/testdata/sf0.001", "events").schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            user_running_totals_stream(src)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if stop_after_first:
            while q.recentProgress == [] and q.isActive:
                pass  # wait for the first batch to commit
            q.stop()
            q.awaitTermination()
        else:
            q.awaitTermination()

    start(stop_after_first=True)   # partial drain, then kill
    start(stop_after_first=False)  # resume from checkpoint
    got = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .set_index("user_id")["n_events"]
        .sort_index()
    )
    want = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .sort_index()
    )
    assert got.equals(want)


def test_streaming_rollup_merge_equals_direct(spark, sf_smoke, tmp_path):
    """The streaming-maintained state after draining all micro-batches
    must equal one batch pass over all rows — counts and sums exactly
    (mod float rounding), the HLL distinct estimate IDENTICALLY (sketch
    union is drift-free) — and the state directory must show one
    version per micro-batch (4 source files → 4 merges)."""
    import os

    from pyspark.sql import functions as F

    from mrt_data_integration_spark.operators import sketches as sk
    from mrt_data_integration_spark.sources import load_table
    from mrt_data_integration_spark.streaming.rollup import run_rollup_stream

    ev = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    state = str(tmp_path / "state")
    final = run_rollup_stream(
        spark,
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        state,
        ["event_type"],
        "value",
        "user_id",
    )
    got = {
        r["event_type"]: (r["n_rows"], round(r["sum_value"], 4), r["distinct_est"])
        for r in final.collect()
    }
    direct = {
        r["event_type"]: (r["n_rows"], round(r["sum_value"], 4), r["distinct_est"])
        for r in sk.finalize_rollup(
            sk.rollup_state(ev, ["event_type"], "value", "user_id")
        ).collect()
    }
    assert got == direct and len(got) == 5
    versions = [d for d in os.listdir(state) if d.startswith("state_v")]
    # pruning keeps at most the latest version and its merge
    # predecessor — storage is O(one state), not O(states x batches)
    assert sorted(versions) == ["state_v2", "state_v3"]


def test_rollup_replay_is_idempotent(spark, sf_smoke, tmp_path):
    """foreachBatch is at-least-once: re-delivering a micro-batch after
    its parquet write succeeded but the checkpoint commit failed must
    rebuild the SAME state, not double-count — and a partially-written
    version directory (no _SUCCESS) must be invisible to the merge."""
    import os
    import shutil

    from mrt_data_integration_spark.operators import sketches as sk
    from mrt_data_integration_spark.sources import load_table
    from mrt_data_integration_spark.streaming.rollup import (
        _latest_version,
        merge_batch_into_state,
    )

    ev = load_table(spark, sf_smoke, "events")
    batches = [ev.filter(F.pmod(F.col("user_id"), F.lit(3)) == i) for i in range(3)]
    state = str(tmp_path / "state")
    for i, b in enumerate(batches):
        merge_batch_into_state(b, i, state, ["event_type"], "value", "user_id")

    def snapshot():
        return {
            r["event_type"]: (r["n_rows"], round(r["sum_value"], 4), r["distinct_est"])
            for r in sk.finalize_rollup(
                spark.read.parquet(os.path.join(state, f"state_v{_latest_version(state)}"))
            ).collect()
        }

    before = snapshot()
    # Replay the LAST batch (the crash-after-write case): the complete
    # published version IS the rebuild — reused, never double-merged.
    merge_batch_into_state(batches[2], 2, state, ["event_type"], "value", "user_id")
    assert snapshot() == before
    # Replay a MIDDLE batch: its version is complete -> no-op; v2 (the
    # latest complete state) untouched.
    merge_batch_into_state(batches[1], 1, state, ["event_type"], "value", "user_id")
    assert snapshot() == before
    # A partial (no-_SUCCESS) directory with a higher id must be ignored.
    partial = os.path.join(state, "state_v99")
    shutil.copytree(os.path.join(state, "state_v2"), partial)
    os.remove(os.path.join(partial, "_SUCCESS"))
    assert _latest_version(state) == 2
    merge_batch_into_state(batches[2], 2, state, ["event_type"], "value", "user_id")
    assert snapshot() == before


def test_streaming_dedup_matches_batch(spark, sf_smoke, tmp_path):
    """Ingest-time exact dedup: a stream carrying re-delivered copies
    (same payload, new event_id) must come out with exactly the batch
    dedup's row set — both the global variant and the watermarked
    variant under a delay long enough that no state evicts."""
    from mrt_data_integration_spark.streaming.dedup import (
        fingerprint,
        streaming_dedup_global,
        streaming_dedup_within_watermark,
    )
    from mrt_data_integration_spark.streaming.windows import (
        EVENTS_STREAM_SCHEMA,
        read_event_stream,
    )

    ev = load_table(spark, sf_smoke, "events").limit(2000)
    dupes = ev.withColumn("event_id", F.col("event_id") + 10_000_000)
    src = str(tmp_path / "src")
    ev.unionByName(dupes).repartition(4).write.parquet(src)
    payload = ["ts", "user_id", "event_type", "value", "props"]

    def drain(stream_df, name):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start()
        )
        q.awaitTermination()
        return spark.table(name)

    want = (
        fingerprint(ev.unionByName(dupes), payload)
        .dropDuplicates(["__fp__"])
        .count()
    )
    assert want == ev.count()  # every copy is a true duplicate
    got_g = drain(
        streaming_dedup_global(read_event_stream(spark, src), payload), "dd_g"
    )
    assert got_g.count() == want
    got_w = drain(
        streaming_dedup_within_watermark(
            read_event_stream(spark, src), payload, delay="365 days"
        ),
        "dd_w",
    )
    assert got_w.count() == want
    # payload sets agree with batch exactly (first-arrival-wins on a
    # duplicate pair is payload-identical by construction)
    b = set(map(tuple, fingerprint(ev, payload).select("__fp__").distinct().collect()))
    s = set(map(tuple, fingerprint(got_g, payload).select("__fp__").distinct().collect()))
    assert b == s


def test_fingerprint_distinguishes_null_and_bleed(spark):
    """Delimiter + null sentinel: (1.5, 'promo') vs (NULL, '1.5promo')
    and NULL vs '' must get DIFFERENT fingerprints."""
    from mrt_data_integration_spark.streaming.dedup import fingerprint

    df = spark.createDataFrame(
        [(1, 1.5, "promo"), (2, None, "1.5promo"), (3, None, ""), (4, None, None)],
        "id long, value double, props string",
    )
    fps = {r["id"]: r["__fp__"] for r in fingerprint(df, ["value", "props"]).collect()}
    assert len(set(fps.values())) == 4


def test_streaming_funnel_matches_batch(spark, sf_smoke, tmp_path):
    """Stateful streaming funnel drained over a multi-batch source must
    reproduce the batch fold's per-user stage times EXACTLY — including
    users whose anchor event arrives in a later micro-batch than their
    step-2 event (the re-fold-from-state case)."""
    from mrt_data_integration_spark.operators.funnel import funnel_stage_times
    from mrt_data_integration_spark.streaming.funnel import (
        funnel_stream,
        latest_stage_times,
    )

    steps = ["view", "click", "purchase"]
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "src")
    # random file split → funnel events of one user scatter across
    # micro-batches in arbitrary time order
    ev.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    updates = funnel_stream(stream, steps)
    q = (
        updates.writeStream.format("memory")
        .queryName("funnel_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, latest_stage_times(spark.table("funnel_mem"), 3).collect())
    )
    want = sorted(map(tuple, funnel_stage_times(ev, steps, "12 hours").collect()))
    assert got == want and len(got) > 0


def test_streaming_funnel_fuzz_arrival_order_and_ties(spark, tmp_path):
    """Deterministic fuzz: random small event sets (with timestamp TIES
    across step types and users) split into random micro-batch orders
    must reproduce the batch fold exactly — the arrival-order and
    tie-order contract of the stateful re-fold."""
    import datetime as dt
    import random

    from mrt_data_integration_spark.operators.funnel import funnel_stage_times
    from mrt_data_integration_spark.streaming.funnel import (
        funnel_stream,
        latest_stage_times,
    )

    steps = ["view", "click", "purchase"]
    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)
    for trial in range(3):
        rows = []
        eid = 0
        for u in range(6):
            for _ in range(rng.randint(1, 10)):
                # coarse minute grid → frequent exact-ts ties
                ts = base + dt.timedelta(minutes=rng.randint(0, 30))
                rows.append((eid, ts, u, rng.choice(steps), 0.0, "{}"))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string"
        )
        src = str(tmp_path / f"src{trial}")
        # random partitioning → random batch composition and order
        ev.repartition(rng.randint(2, 5)).write.parquet(src)
        updates = funnel_stream(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            steps,
            window_seconds=3600,
        )
        q = (
            updates.writeStream.format("memory")
            .queryName(f"fz{trial}")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck{trial}"))
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, latest_stage_times(
            spark.table(f"fz{trial}"), 3
        ).collect()))
        want = sorted(map(tuple, funnel_stage_times(
            ev, steps, "1 hour"
        ).collect()))
        assert got == want, f"trial {trial}"


def test_funnel_stream_idle_timeout_evicts_state(spark, tmp_path):
    """State TTL (r6 verdict): with ``idle_timeout_seconds`` set, a user
    whose latest event falls TTL behind the watermark is EVICTED — their
    next appearance re-folds from EMPTY state (n_seen restarts, stage-1
    time is the new event, not the forgotten original) — while a user
    active before their deadline keeps exact funnel times. Event-time
    timeout makes this fully deterministic: the watermark is driven by
    the staged data, never wall-clock, so there are no sleeps and the
    same files always evict the same users at the same batch."""
    import datetime as dt

    import pandas as pd

    from mrt_data_integration_spark.streaming.funnel import funnel_stream

    steps = ["view", "click", "purchase"]
    schema = "user_id long, ts timestamp, event_type string"
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    t0 = dt.datetime(2024, 1, 1)
    minute, hour = dt.timedelta(minutes=1), dt.timedelta(hours=1)

    def add_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = funnel_stream(
            spark.readStream.schema(schema).parquet(src),
            steps,
            idle_timeout_seconds=3600,  # 1 h of EVENT time
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: A completes stages 1-2 (deadline t0+70m); B starts
    # (t0+60m); a NULL user id forms its own group (the emission path
    # must pass the null key through, not crash on an int64 array)
    add_file([(1, t0, "view"), (1, t0 + 10 * minute, "click"),
              (2, t0, "view"), (None, t0, "view")])
    drain()
    # batch 2: B extends BEFORE its deadline → state kept, t2 resolves
    # against the original view; B's deadline re-arms to t0+90m
    add_file([(2, t0 + 30 * minute, "click")])
    drain()
    # batch 3: watermark pusher → watermark t0+3h (past both deadlines)
    add_file([(3, t0 + 3 * hour, "view")])
    drain()
    # batch 4: sees watermark t0+3h → A and B time out and are evicted
    # (C, deadline t0+4h, survives); the D row just makes the batch run
    add_file([(4, t0 + 5 * hour, "view")])
    drain()
    # batch 5: A returns — state was evicted, so the re-fold starts empty
    new_ts = t0 + 6 * hour
    add_file([(1, new_ts, "view")])
    drain()

    got = spark.read.parquet(out).toPandas()
    a = got[got.user_id == 1]
    # eviction proof: A's emissions are n_seen ∈ {2, 1} — the return row
    # re-counts from zero (an unbounded-state run would emit n_seen=3)
    assert sorted(a.n_seen.tolist()) == [1, 2]
    returned = a[a.n_seen == 1].iloc[0]
    assert pd.Timestamp(returned.t1) == new_ts, "stage-1 must be the NEW view"
    assert pd.isna(returned.t2)
    before = a[a.n_seen == 2].iloc[0]
    assert pd.Timestamp(before.t2) == t0 + 10 * minute
    # active-user proof: B's state survived batch 2 (extension arrived
    # before its event-time deadline), so its click resolved stage 2
    # against the ORIGINAL view time
    b = got[got.user_id == 2]
    final_b = b.loc[b.n_seen.idxmax()]
    assert final_b.n_seen == 2
    assert pd.Timestamp(final_b.t1) == t0
    assert pd.Timestamp(final_b.t2) == t0 + 30 * minute


def test_stateful_ttl_eviction_unit():
    """The session and running-totals operators share the funnel's
    eviction contract: a timed-out invocation removes state and emits
    NOTHING (the user's last update-mode row must remain the standing
    answer — emitting zeros here would corrupt max/last-row consumers),
    and touches no other state API."""
    from mrt_data_integration_spark.streaming.stateful import (
        _capped_session_fn,
        _totals_fn_factory,
    )

    class FakeTimedOutState:
        exists = True
        hasTimedOut = True

        def __init__(self):
            self.removed = False

        @property
        def get(self):
            raise AssertionError("eviction must not read state")

        def update(self, v):
            raise AssertionError("eviction must not write state")

        def setTimeoutTimestamp(self, ms):
            raise AssertionError("eviction must not re-arm the timeout")

        def getCurrentWatermarkMs(self):
            raise AssertionError("eviction must not consult the watermark")

        def remove(self):
            self.removed = True

    for fn in (
        _capped_session_fn(1800, 4 * 3600, timeout_ms=1000),
        _totals_fn_factory(timeout_ms=1000),
    ):
        st = FakeTimedOutState()
        assert list(fn((7,), iter([]), st)) == []
        assert st.removed


def test_funnel_ttl_bounds_state_store_rows(spark, tmp_path):
    """The boundedness claim, MEASURED: drain the same three batches
    (50 early one-touch users, then two later cohorts that advance the
    watermark far past their deadlines) with and without a TTL, and
    read the state operator's numRowsTotal from the final batch's
    progress. Without a TTL the store holds every user ever seen; with
    it, only the cohorts still inside their event-time deadline."""
    import datetime as dt

    from mrt_data_integration_spark.streaming.funnel import funnel_stream

    schema = "user_id long, ts timestamp, event_type string"
    t0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)

    def run(ttl):
        tag = "ttl" if ttl else "nottl"
        src = str(tmp_path / f"src_{tag}")
        ckpt = str(tmp_path / f"ck_{tag}")
        last_rows = None
        batches = [
            [(u, t0, "view") for u in range(1, 51)],          # one-touch cohort
            [(u, t0 + 10 * day, "view") for u in range(51, 61)],
            [(u, t0 + 20 * day, "view") for u in range(61, 71)],
        ]
        for rows in batches:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q = (
                funnel_stream(
                    spark.readStream.schema(schema).parquet(src),
                    ["view", "click", "purchase"],
                    idle_timeout_seconds=ttl,
                )
                .writeStream.format("noop")
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            for p in q.recentProgress:
                ops = p.get("stateOperators") or []
                if ops:
                    last_rows = ops[0]["numRowsTotal"]
        return last_rows

    unbounded = run(None)
    bounded = run(24 * 3600)  # 1 day of event time
    assert unbounded == 70, f"NoTimeout must hold every user ever: {unbounded}"
    # cohort 1 (deadline t0+1d) and cohort 2 (t0+11d) are both past the
    # final watermark (t0+20d) -> evicted; only cohort 3 remains
    assert bounded == 10, f"TTL must evict idle cohorts: {bounded}"


def test_batch_count_sink_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: calling the dedup query's count
    sink TWICE with the same batch id (a replayed batch) must not
    change the summed totals — the read side collapses replays on
    (bid, group) before summing across batches."""
    from mrt_data_integration_spark.queries.timeseries import (
        _batch_count_sink,
        _sum_batch_counts,
    )

    agg_out = str(tmp_path / "agg")
    sink = _batch_count_sink(agg_out, "event_type")
    b0 = spark.createDataFrame(
        [("view",), ("view",), ("click",)], "event_type string"
    )
    b1 = spark.createDataFrame([("view",), ("buy",)], "event_type string")
    sink(b0, 0)
    sink(b1, 1)
    once = {
        r.event_type: r.n_unique
        for r in _sum_batch_counts(spark, agg_out, "event_type").collect()
    }
    assert once == {"view": 3, "click": 1, "buy": 1}
    sink(b1, 1)  # replay of batch 1
    replayed = {
        r.event_type: r.n_unique
        for r in _sum_batch_counts(spark, agg_out, "event_type").collect()
    }
    assert replayed == once, "replayed batch double-counted"


def test_sized_state_partitions_floor_and_cap(spark, tmp_path):
    """Volume-based stateful-shuffle sizing: floored at 8 for small
    batches, ceil(rows/4000) in between, capped OUTERMOST at the
    session default AND the store-count ceiling (r15 — per-store
    commit fixed costs grow super-linearly with concurrent stores on
    small micro-batches); a caller-supplied cap (the interval join's
    stores-per-partition correction) beats everything."""
    from mrt_data_integration_spark.queries import timeseries as ts

    src = str(tmp_path / "staged")
    spark.range(100).write.parquet(src)
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ceiling = ts._MAX_DRAIN_STATE_PARTITIONS
    # tiny staged corpus -> floor (test session default is 8+ cores)
    assert ts._sized_state_partitions(spark, src, 2) == min(
        ceiling, default, 8
    )
    # count is cached per (immutable) staged dir — poke the cache to
    # exercise the formula's middle and ceiling regimes
    ts._STAGED_ROW_COUNTS[src] = 80_000
    assert ts._sized_state_partitions(spark, src, 2) == min(
        ceiling, default, 10
    )
    ts._STAGED_ROW_COUNTS[src] = 4_000_000
    assert ts._sized_state_partitions(spark, src, 2) == min(ceiling, default)
    # per-caller cap (stores-per-partition correction) wins outermost
    assert ts._sized_state_partitions(spark, src, 2, cap=4) == min(4, default)
    del ts._STAGED_ROW_COUNTS[src]


def test_drain_no_data_batches_off_same_output_and_conf_restored(
    spark, tmp_path
):
    """The r15 drain optimization's emission argument, pinned: an
    arrival-emitting stateful drain (stream-stream INNER join) yields
    the IDENTICAL pair set with the trailing no-data micro-batch
    disabled — the skipped batch only evicts state the availableNow
    termination discards — and the session conf is restored either
    way."""
    import datetime as dt

    from mrt_data_integration_spark.queries.timeseries import _drain_stream
    from mrt_data_integration_spark.streaming.join import (
        stream_interval_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    left = [(1, t0), (1, t0 + 30 * m), (2, t0)]
    right = [(1, t0 + 5 * m, 1.0), (1, t0 + 40 * m, 2.0), (2, t0 + 90 * m, 3.0)]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(left, "k long, lts timestamp").repartition(
        2
    ).write.parquet(lsrc)
    spark.createDataFrame(
        right, "k long, rts timestamp, v double"
    ).repartition(2).write.parquet(rsrc)

    def drain(no_data_batches):
        joined = stream_interval_join(
            spark.readStream.schema("k long, lts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(lsrc),
            spark.readStream.schema("k long, rts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(rsrc),
            on="k",
            left_ts="lts",
            right_ts="rts",
            upper="1 hour",
            left_delay="10 days",
            right_delay="10 days",
        )
        out = str(tmp_path / f"out_{no_data_batches}")
        _drain_stream(
            joined,
            lambda df, bid: df.write.mode("append").parquet(out),
            mode="append",
            state_partitions=2,
            no_data_batches=no_data_batches,
        )
        return sorted(
            (r.k, r.lts, r.rts, r.v)
            for r in spark.read.parquet(out).collect()
        )

    ndb_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    before = spark.conf.get(ndb_key)
    with_batch = drain(True)
    without_batch = drain(False)
    assert with_batch == without_batch, (
        "disabling the trailing no-data batch changed an inner "
        "stream-stream join's emitted pairs"
    )
    # k=1: t0→{+5m,+40m}, t0+30m→{+40m}; k=2's click is outside the hour
    assert len(with_batch) == 3
    assert spark.conf.get(ndb_key) == before, "conf must be restored"


def test_funnel_compacting_sink_matches_update_log(spark, tmp_path):
    """The compacting state sink: final compacted table == reducing the
    full append-only update log; table size is O(users) regardless of
    batch count; replaying a batch rebuilds identical state."""
    import datetime as dt

    from mrt_data_integration_spark.streaming.funnel import (
        funnel_stream,
        latest_stage_times,
        merge_funnel_updates,
        read_funnel_state,
    )

    schema = "user_id long, ts timestamp, event_type string"
    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = []
    for u in range(1, 31):
        rows.append((u, t0 + u * h, "view"))
        if u % 2 == 0:
            rows.append((u, t0 + u * h + h, "click"))
        if u % 4 == 0:
            rows.append((u, t0 + u * h + 2 * h, "purchase"))
    src = str(tmp_path / "src")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        spark.createDataFrame(rows[i::3], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state_dir = str(tmp_path / "state")
    log_dir = str(tmp_path / "log")

    def both_sinks(df, bid):
        df.persist()
        df.write.mode("append").parquet(log_dir)
        merge_funnel_updates(df, bid, state_dir)
        df.unpersist()

    q = (
        funnel_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            ["view", "click", "purchase"],
        )
        .writeStream.foreachBatch(both_sinks)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = read_funnel_state(spark, state_dir)
    # O(users), not O(updates): the log holds one row per touched user
    # per batch, the compacted table exactly one per user
    assert state.count() == 30
    assert spark.read.parquet(log_dir).count() > 30

    from_log = latest_stage_times(spark.read.parquet(log_dir), 3)
    from_state = latest_stage_times(state, 3)
    key = ["user_id", "t1", "t2", "t3"]
    assert sorted(map(tuple, from_state.select(key).collect())) == sorted(
        map(tuple, from_log.select(key).collect())
    )

    # at most two versions on disk (latest + its merge predecessor)
    import os as _os

    from mrt_data_integration_spark.streaming.rollup import _latest_version

    vdirs = [d for d in _os.listdir(state_dir) if d.startswith("state_v")]
    assert len(vdirs) <= 2, f"version pruning failed: {vdirs}"
    last_bid = _latest_version(state_dir)
    before = sorted(map(tuple, state.select(key).collect()))
    # replayed batch id: the protocol's complete-version reuse path —
    # merge_fn must not even run (a second writer of the same bid is a
    # foreachBatch retry), so the state is byte-identical
    merge_funnel_updates(state, last_bid, state_dir)
    assert _latest_version(state_dir) == last_bid
    after = sorted(
        map(
            tuple,
            read_funnel_state(spark, state_dir).select(key).collect(),
        )
    )
    assert after == before, "replayed merge changed the compacted state"
    # duplicate-content worst case, actually exercising the merge: feed
    # the compacted state back in as a NEW batch (every row already
    # present in the predecessor) — max_by compaction must keep exactly
    # the same winner per user, so the new version equals the old
    merge_funnel_updates(
        read_funnel_state(spark, state_dir), last_bid + 1, state_dir
    )
    assert _latest_version(state_dir) == last_bid + 1, (
        "duplicate-content merge must still publish a new version"
    )
    after_dup = sorted(
        map(
            tuple,
            read_funnel_state(spark, state_dir).select(key).collect(),
        )
    )
    assert after_dup == before, "all-duplicate merge changed the state"


def test_funnel_compaction_ttl_expires_idle_users(spark, tmp_path):
    """ttl_seconds bounds the RETAINED population: a drive-by visitor
    whose last_ts falls behind (max last_ts - TTL) is dropped at the
    merge, while recent users survive with stages intact."""
    import datetime as dt

    from mrt_data_integration_spark.streaming.funnel import (
        merge_funnel_updates,
        read_funnel_state,
    )

    schema = (
        "user_id long, n_seen long, last_ts timestamp, "
        "t1 timestamp, t2 timestamp, t3 timestamp"
    )
    t0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    b0 = spark.createDataFrame(
        [(1, 1, t0, t0, None, None), (2, 1, t0, t0, None, None)], schema
    )
    b1 = spark.createDataFrame(
        [(3, 2, t0 + 10 * day, t0 + 10 * day, None, None)], schema
    )
    state = str(tmp_path / "st")
    ttl = 24 * 3600.0
    merge_funnel_updates(b0, 0, state, ttl_seconds=ttl)
    assert read_funnel_state(spark, state).count() == 2
    merge_funnel_updates(b1, 1, state, ttl_seconds=ttl)
    kept = read_funnel_state(spark, state)
    assert [r.user_id for r in kept.collect()] == [3], (
        "users 1,2 are 10 days idle past a 1-day TTL and must be dropped"
    )


def test_versioned_state_rejects_stale_chain_restart(spark, tmp_path):
    """A stream restarted with a fresh checkpoint (batch ids reset to
    0) against a state_dir already at a higher version must fail loudly
    instead of silently forking a new chain under stale readers."""
    import pytest as _pytest

    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_versioned_state,
    )

    df = spark.createDataFrame([(1,)], "k long")
    state = str(tmp_path / "st")
    ident = lambda b, prev: b  # noqa: E731
    merge_into_versioned_state(df, 5, state, ident)
    with _pytest.raises(ValueError, match="fresh state_dir"):
        merge_into_versioned_state(df, 0, state, ident)


def test_versioned_state_rebuilds_after_crash_before_publish(
    spark, sf_smoke, tmp_path
):
    """The replay-REBUILD branch (not the complete-version reuse): a
    crash before state_v{N} published leaves it absent/partial; the
    redelivered batch must rebuild it from the same predecessor,
    yielding the identical state."""
    import os
    import shutil

    from mrt_data_integration_spark.operators import sketches as sk
    from mrt_data_integration_spark.sources import load_table
    from mrt_data_integration_spark.streaming.rollup import (
        _latest_version,
        merge_batch_into_state,
    )

    ev = load_table(spark, sf_smoke, "events")
    batches = [ev.filter(F.pmod(F.col("user_id"), F.lit(2)) == i) for i in range(2)]
    state = str(tmp_path / "state")
    for i, b in enumerate(batches):
        merge_batch_into_state(b, i, state, ["event_type"], "value", "user_id")

    def snapshot():
        return {
            r["event_type"]: (r["n_rows"], round(r["sum_value"], 4))
            for r in sk.finalize_rollup(
                spark.read.parquet(
                    os.path.join(state, f"state_v{_latest_version(state)}")
                )
            ).collect()
        }

    before = snapshot()
    # crash-before-publish: v1 vanishes entirely (rename never happened)
    shutil.rmtree(os.path.join(state, "state_v1"))
    assert _latest_version(state) == 0
    merge_batch_into_state(batches[1], 1, state, ["event_type"], "value", "user_id")
    assert _latest_version(state) == 1
    assert snapshot() == before, "rebuild from predecessor diverged"


def test_versioned_state_rejects_chain_collision(spark, tmp_path):
    """The id-COLLISION case the latest>bid guard cannot see: a fresh
    checkpoint restarts batch ids at 0 against a state_dir whose v0
    already exists from an old chain — with a chain token the reuse
    path becomes a loud error instead of silently swallowing the new
    stream's batch 0."""
    import pytest as _pytest

    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_versioned_state,
    )

    df = spark.createDataFrame([(1,)], "k long")
    state = str(tmp_path / "st")
    ident = lambda b, prev: b  # noqa: E731
    merge_into_versioned_state(df, 0, state, ident, chain="query-uuid-A")
    # same chain, same id: replay no-op, no error
    merge_into_versioned_state(df, 0, state, ident, chain="query-uuid-A")
    with _pytest.raises(ValueError, match="belongs to chain"):
        merge_into_versioned_state(df, 0, state, ident, chain="query-uuid-B")


def test_version_pruning_reclaims_crash_debris(spark, tmp_path):
    """Orphaned build/debris directories (killed builder, publish race)
    parse to their version id and are reclaimed by the same pruning
    pass as plain versions — disk stays bounded across crashes."""
    import os

    from mrt_data_integration_spark.streaming.rollup import (
        merge_into_versioned_state,
    )

    df = spark.createDataFrame([(1,)], "k long")
    state = str(tmp_path / "st")
    ident = lambda b, prev: b  # noqa: E731
    merge_into_versioned_state(df, 0, state, ident)
    # fake a killed builder's leftover for v0
    os.makedirs(os.path.join(state, "state_v0.build-deadbeef"))
    os.makedirs(os.path.join(state, "state_v0.debris.cafe0000"))
    merge_into_versioned_state(df, 1, state, ident)
    merge_into_versioned_state(df, 2, state, ident)  # prunes < v1
    left = sorted(
        d for d in os.listdir(state) if d.startswith("state_v")
    )
    assert left == ["state_v1", "state_v2"], left


def test_bucketed_funnel_state_equals_flat_incl_read_side_ttl(
    spark, tmp_path
):
    """The bucketed funnel serving state must equal the flat path's —
    including TTL, which the bucketed layout applies at READ time (a
    bucket-local merge cannot compute the global cutoff): horizons are
    monotone in event time, so read-side eviction lands on exactly the
    flat merge-side result."""
    import datetime as dt

    from mrt_data_integration_spark.streaming.funnel import (
        merge_funnel_updates,
        merge_funnel_updates_bucketed,
        read_funnel_state,
        read_funnel_state_bucketed,
    )

    schema = (
        "user_id long, n_seen long, last_ts timestamp, "
        "t1 timestamp, t2 timestamp, t3 timestamp"
    )
    t0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    batches = [
        [(u, 1, t0, t0, None, None) for u in range(1, 9)],
        [(3, 2, t0 + day, t0, t0 + day, None), (9, 1, t0 + day, t0 + day, None, None)],
        [(4, 2, t0 + 10 * day, t0, t0 + 10 * day, None)],
    ]
    ttl = 5 * 24 * 3600.0
    flat, bucketed = str(tmp_path / "flat"), str(tmp_path / "bkt")
    for bid, rows in enumerate(batches):
        b = spark.createDataFrame(rows, schema)
        merge_funnel_updates(b, bid, flat, ttl_seconds=ttl)
        merge_funnel_updates_bucketed(b, bid, bucketed, n_buckets=4)
    want = sorted(
        map(tuple, read_funnel_state(spark, flat).collect())
    )
    got = sorted(
        map(
            tuple,
            read_funnel_state_bucketed(
                spark, bucketed, ttl_seconds=ttl
            ).collect(),
        )
    )
    assert got == want
    # and without TTL both hold every user's compacted row
    got_all = read_funnel_state_bucketed(spark, bucketed).count()
    assert got_all == 9
    # ttl_seconds=0 means "evict everything strictly older than the
    # max last_ts", NOT TTL-disabled (the r9 ADVICE truthiness bug):
    # only user 4 (the sole batch-2 row) carries the max timestamp
    zero_ttl = read_funnel_state_bucketed(
        spark, bucketed, ttl_seconds=0
    ).collect()
    assert [r.user_id for r in zero_ttl] == [4]
    # the serve-time eviction must not plan an unpartitioned window
    # (one-reducer serve): the cutoff is a 1-row aggregate broadcast
    plan = (
        read_funnel_state_bucketed(spark, bucketed, ttl_seconds=ttl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan


def test_flat_funnel_merge_ttl_zero_means_evict_to_max(spark, tmp_path):
    """ttl_seconds=0 on the FLAT merge path must evict everything
    strictly older than the max last_ts — matching the bucketed
    reader's r10 semantics, not silently disabling TTL."""
    import datetime as dt

    from mrt_data_integration_spark.streaming.funnel import (
        merge_funnel_updates,
        read_funnel_state,
    )

    schema = (
        "user_id long, n_seen long, last_ts timestamp, "
        "t1 timestamp, t2 timestamp, t3 timestamp"
    )
    t0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    state = str(tmp_path / "flat0")
    rows = [
        (1, 1, t0, t0, None, None),
        (2, 1, t0 + day, t0 + day, None, None),
    ]
    merge_funnel_updates(
        spark.createDataFrame(rows, schema), 0, state, ttl_seconds=0
    )
    got = [r.user_id for r in read_funnel_state(spark, state).collect()]
    assert got == [2], got
