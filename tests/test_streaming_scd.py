"""Streaming SCD2 maintenance (streaming/scd.py): stream==rebuild
identity over micro-batched change logs, replay idempotence, reader
contract."""

from __future__ import annotations

import datetime as dt

import pytest

from mrt_data_integration_spark.operators.scd import changelog_to_scd2
from mrt_data_integration_spark.streaming.scd import (
    merge_scd2_updates,
    read_scd2_history,
)

_SCHEMA = "k long, attr string, ts timestamp, rid long"
_ARGS = dict(
    key_cols=["k"],
    tracked_cols=["attr"],
    seq_cols=["ts", "rid"],
    ts_col="ts",
)


def _ts(d):
    return dt.datetime(2024, 1, d)


def _rows():
    """An ordered change log: version changes, no-op repeats, a
    reverting key, a key that appears mid-stream."""
    return [
        (1, "A", _ts(1), 1),
        (2, "X", _ts(1), 2),
        (1, "A", _ts(2), 3),  # no-op repeat
        (1, "B", _ts(3), 4),
        (3, "Q", _ts(4), 5),  # new key mid-stream
        (2, "Y", _ts(5), 6),
        (1, "A", _ts(6), 7),  # reverts → third version
        (3, "Q", _ts(7), 8),  # no-op
    ]


def _hist_tuples(df):
    return sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in df.collect()
    )


def test_stream_merge_equals_full_rebuild(spark, tmp_path):
    """Draining the ordered log through merge_scd2_updates in
    micro-batches must leave EXACTLY the history a one-shot
    changelog_to_scd2 over the full log builds."""
    rows = _rows()
    src = str(tmp_path / "src")
    # 4 ordered files → 4 micro-batches with maxFilesPerTrigger=1.
    # Ordered SPLITS (not round-robin): the merge contract requires
    # each batch to be later than the last.
    for i in range(4):
        spark.createDataFrame(rows[2 * i: 2 * i + 2], _SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(f"{src}/part{i}")
    state_dir = str(tmp_path / "state")

    def sink(df, bid):
        merge_scd2_updates(df, bid, state_dir, **_ARGS)

    q = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _hist_tuples(read_scd2_history(spark, state_dir))
    want = _hist_tuples(
        changelog_to_scd2(
            spark.createDataFrame(rows, _SCHEMA), **_ARGS
        )
    )
    assert got == want
    # O(versions), not O(observations): the two no-op repeats collapsed
    assert len(got) == 6


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: redelivering the SAME batch id
    must not open duplicate versions (the protocol reuses the complete
    version instead of re-merging)."""
    state_dir = str(tmp_path / "state")
    b0 = spark.createDataFrame(_rows()[:4], _SCHEMA)
    b1 = spark.createDataFrame(_rows()[4:], _SCHEMA)
    merge_scd2_updates(b0, 0, state_dir, **_ARGS)
    merge_scd2_updates(b1, 1, state_dir, **_ARGS)
    once = _hist_tuples(read_scd2_history(spark, state_dir))
    merge_scd2_updates(b1, 1, state_dir, **_ARGS)  # replay
    assert _hist_tuples(read_scd2_history(spark, state_dir)) == once


def test_reader_requires_a_complete_version(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_scd2_history(spark, str(tmp_path / "nope"))
