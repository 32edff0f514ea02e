"""Watermarked stream-stream interval join (streaming/join.py): the
stream twin must produce EXACTLY the batch interval join's row set when
no watermark evicts, carry join state across micro-batches, and drop
late rows once the global watermark passes them — the state-boundedness
contract that makes the join runnable on two unbounded streams."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.sources import load_table
from mrt_data_integration_spark.streaming.join import stream_interval_join

T0 = dt.datetime(2024, 1, 1)
MIN = dt.timedelta(minutes=1)
VIEW_SCHEMA = "user_id long, v_ts timestamp, view_id long"
CLICK_SCHEMA = "user_id long, c_ts timestamp, value double"


def _drain_to_memory(spark, joined, name, ckpt):
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _drain_to_parquet(joined, ckpt, out):
    """Resumable drain: memory sinks cannot recover from a checkpoint,
    so the incremental (multi-drain, one checkpoint) tests append each
    batch's output to parquet via foreachBatch instead."""
    q = (
        joined.writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_out(spark, out, schema):
    import os

    if not os.path.isdir(out):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(out)


def _batch_twin(views, clicks, lower="0 seconds", upper="12 hours"):
    return views.join(
        clicks,
        (views["user_id"] == clicks["user_id"])
        & (F.col("c_ts") > F.col("v_ts") + F.expr(f"INTERVAL '{lower}'"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL '{upper}'")),
        "inner",
    ).drop(clicks["user_id"])


def test_stream_join_matches_batch(spark, sf_smoke, tmp_path):
    """No-eviction run (365-day delay) over real events: stream == batch
    row-for-row, including pairs whose two sides land in different
    micro-batches (4 files per side, 1 per trigger)."""
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value"
    )
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.repartition(4).write.parquet(vsrc)
    clicks.repartition(4).write.parquet(csrc)
    joined = stream_interval_join(
        spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vsrc),
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(csrc),
        on="user_id",
        left_ts="v_ts",
        right_ts="c_ts",
        upper="12 hours",
        left_delay="365 days",
        right_delay="365 days",
    )
    got = _drain_to_memory(spark, joined, "ssj_batch_eq", str(tmp_path / "ck"))
    want = _batch_twin(views, clicks)
    assert got.count() == want.count() > 0
    cols = sorted(want.columns)
    g = set(map(tuple, got.select(*cols).collect()))
    w = set(map(tuple, want.select(*cols).collect()))
    assert g == w


def test_stream_join_matches_across_batches(spark, tmp_path):
    """A view ingested in micro-batch 1 must match a click arriving in
    micro-batch 2 — the left row is served from JOIN STATE, not the
    current batch."""
    src_v, src_c = str(tmp_path / "v"), str(tmp_path / "c")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    out_schema = "user_id long, v_ts timestamp, view_id long, c_ts timestamp, value double"

    def add(path, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    def drain():
        joined = stream_interval_join(
            spark.readStream.schema(VIEW_SCHEMA).parquet(src_v),
            spark.readStream.schema(CLICK_SCHEMA).parquet(src_c),
            on="user_id",
            left_ts="v_ts",
            right_ts="c_ts",
            upper="1 hour",
            left_delay="10 minutes",
            right_delay="10 minutes",
        )
        _drain_to_parquet(joined, ckpt, out)

    # batch 1: the view alone (plus a click for an absent user so the
    # right side is non-empty)
    add(src_v, VIEW_SCHEMA, [(1, T0, 100)])
    add(src_c, CLICK_SCHEMA, [(99, T0, 0.5)])
    drain()
    assert _read_out(spark, out, out_schema).count() == 0
    # batch 2: the matching click, 10 minutes after the stored view
    add(src_c, CLICK_SCHEMA, [(1, T0 + 10 * MIN, 2.5)])
    add(src_v, VIEW_SCHEMA, [(98, T0 + 10 * MIN, 101)])
    drain()
    rows = _read_out(spark, out, out_schema).collect()
    assert [(r.user_id, r.view_id, r.value) for r in rows] == [(1, 100, 2.5)]


def test_stream_join_drops_rows_behind_watermark(spark, tmp_path):
    """State boundedness: once the GLOBAL watermark (min of both sides)
    passes a row's join horizon, a late arrival no longer matches — the
    batch twin keeps the pair, the stream (correctly, by its contract)
    does not. This is the eviction that keeps state O(interval window)
    on an unbounded stream."""
    src_v, src_c = str(tmp_path / "v"), str(tmp_path / "c")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    out_schema = "user_id long, v_ts timestamp, view_id long, c_ts timestamp, value double"
    h2 = T0 + dt.timedelta(hours=2)

    def add(path, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    def drain():
        joined = stream_interval_join(
            spark.readStream.schema(VIEW_SCHEMA).parquet(src_v),
            spark.readStream.schema(CLICK_SCHEMA).parquet(src_c),
            on="user_id",
            left_ts="v_ts",
            right_ts="c_ts",
            upper="1 hour",
            left_delay="10 minutes",
            right_delay="10 minutes",
        )
        _drain_to_parquet(joined, ckpt, out)

    # batch 1: user 1's view at T0; both sides carry a t0+2h pusher so
    # the global watermark advances to t0+1h50m at the batch boundary
    add(src_v, VIEW_SCHEMA, [(1, T0, 100), (2, h2, 200)])
    add(src_c, CLICK_SCHEMA, [(97, h2, 0.1)])
    drain()
    # batch 2: user 1's click at T0+30m is now BEHIND the watermark →
    # dropped; user 2's click at t0+2h+5m is fresh → joins
    add(src_c, CLICK_SCHEMA, [(1, T0 + 30 * MIN, 9.9), (2, h2 + 5 * MIN, 1.5)])
    add(src_v, VIEW_SCHEMA, [(96, h2 + 5 * MIN, 300)])
    drain()
    got = _read_out(spark, out, out_schema).collect()
    assert [(r.user_id, r.view_id, r.value) for r in got] == [(2, 200, 1.5)]
    # the batch twin over the same files HAS the late pair — the
    # difference is the stream's documented eviction, not a wrong join
    views = spark.read.parquet(src_v)
    clicks = spark.read.parquet(src_c)
    pairs = {
        (r.user_id, r.view_id)
        for r in _batch_twin(views, clicks, upper="1 hour").collect()
    }
    assert (1, 100) in pairs and (2, 200) in pairs


def test_stream_join_validations(spark, tmp_path):
    views = spark.createDataFrame([], VIEW_SCHEMA)
    clicks = spark.createDataFrame([], CLICK_SCHEMA)
    with pytest.raises(ValueError, match="inner"):
        stream_interval_join(
            views, clicks, on="user_id", left_ts="v_ts", right_ts="c_ts",
            how="leftOuter",
        )
    with pytest.raises(ValueError, match="disjoint"):
        stream_interval_join(
            views,
            clicks.withColumn("view_id", F.lit(1)),
            on="user_id",
            left_ts="v_ts",
            right_ts="c_ts",
        )
    with pytest.raises(ValueError, match="distinct"):
        stream_interval_join(
            views.withColumnRenamed("v_ts", "ts"),
            clicks.withColumnRenamed("c_ts", "ts"),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
        )
