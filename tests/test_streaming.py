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