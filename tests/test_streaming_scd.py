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


def test_bucketed_stream_merge_equals_full_rebuild(spark, tmp_path):
    """The bucketed protocol must produce EXACTLY the flat path's
    history (== the one-shot rebuild) while only rewriting the buckets
    each batch touches."""
    rows = _rows()
    state_dir = str(tmp_path / "bstate")
    from mrt_data_integration_spark.streaming.scd import (
        merge_scd2_updates_bucketed,
        read_scd2_history_bucketed,
    )

    for bid in range(4):
        b = spark.createDataFrame(rows[2 * bid: 2 * bid + 2], _SCHEMA)
        merge_scd2_updates_bucketed(
            b, bid, state_dir, n_buckets=8, **_ARGS
        )
    got = _hist_tuples(read_scd2_history_bucketed(spark, state_dir))
    want = _hist_tuples(
        changelog_to_scd2(spark.createDataFrame(rows, _SCHEMA), **_ARGS)
    )
    assert got == want
    assert len(got) == 6


def test_bucketed_replay_is_idempotent(spark, tmp_path):
    from mrt_data_integration_spark.streaming.scd import (
        merge_scd2_updates_bucketed,
        read_scd2_history_bucketed,
    )

    state_dir = str(tmp_path / "bstate")
    b0 = spark.createDataFrame(_rows()[:4], _SCHEMA)
    b1 = spark.createDataFrame(_rows()[4:], _SCHEMA)
    merge_scd2_updates_bucketed(b0, 0, state_dir, n_buckets=8, **_ARGS)
    merge_scd2_updates_bucketed(b1, 1, state_dir, n_buckets=8, **_ARGS)
    once = _hist_tuples(read_scd2_history_bucketed(spark, state_dir))
    merge_scd2_updates_bucketed(b1, 1, state_dir, n_buckets=8, **_ARGS)
    assert _hist_tuples(read_scd2_history_bucketed(spark, state_dir)) == once


def test_bucketed_untouched_buckets_are_referenced_not_rewritten(
    spark, tmp_path
):
    """The protocol's point: a batch touching ONE key rewrites only
    that key's bucket — the other buckets' parquet dirs stay under the
    version that wrote them (manifest reference), byte-untouched."""
    import json
    import os

    from mrt_data_integration_spark.streaming.scd import (
        merge_scd2_updates_bucketed,
        read_scd2_history_bucketed,
    )

    state_dir = str(tmp_path / "bstate")
    # batch 0: 40 keys spread over 8 buckets
    b0 = spark.createDataFrame(
        [(k, "A", _ts(1), k) for k in range(1, 41)], _SCHEMA
    )
    merge_scd2_updates_bucketed(b0, 0, state_dir, n_buckets=8, **_ARGS)
    v0_buckets = {
        d for d in os.listdir(f"{state_dir}/state_v0") if d.startswith("bucket=")
    }
    assert len(v0_buckets) > 1  # keys actually spread
    # batch 1: ONE key changes
    b1 = spark.createDataFrame([(1, "B", _ts(5), 99)], _SCHEMA)
    merge_scd2_updates_bucketed(b1, 1, state_dir, n_buckets=8, **_ARGS)
    with open(f"{state_dir}/state_v1/manifest.json") as fh:
        manifest = json.load(fh)["buckets"]
    owners = set(manifest.values())
    assert "state_v0" in owners and "state_v1" in owners
    v1_buckets = {
        d for d in os.listdir(f"{state_dir}/state_v1") if d.startswith("bucket=")
    }
    assert len(v1_buckets) == 1  # only key 1's bucket rewritten
    # v0's referenced buckets still on disk, and the read is correct
    for b, owner in manifest.items():
        assert os.path.isdir(f"{state_dir}/{owner}/bucket={b}")
    hist = _hist_tuples(read_scd2_history_bucketed(spark, state_dir))
    assert (1, "B", _ts(5), None, 2, True) in hist
    assert (1, "A", _ts(1), _ts(5), 1, False) in hist
    assert (40, "A", _ts(1), None, 1, True) in hist
    assert len(hist) == 41


def test_bucketed_pruning_reclaims_unreferenced_buckets(spark, tmp_path):
    """After enough batches, a superseded version keeps ONLY the bucket
    dirs newer manifests still reference; fully-superseded versions
    disappear. The reader stays correct throughout."""
    import os

    from mrt_data_integration_spark.streaming.scd import (
        merge_scd2_updates_bucketed,
        read_scd2_history_bucketed,
    )

    state_dir = str(tmp_path / "bstate")
    b0 = spark.createDataFrame(
        [(k, "A", _ts(1), k) for k in range(1, 17)], _SCHEMA
    )
    merge_scd2_updates_bucketed(b0, 0, state_dir, n_buckets=4, **_ARGS)
    # touch every bucket twice more so version 0's dirs lose all refs
    for bid, day in ((1, 5), (2, 9)):
        b = spark.createDataFrame(
            [(k, f"X{bid}", _ts(day), 100 * bid + k) for k in range(1, 17)],
            _SCHEMA,
        )
        merge_scd2_updates_bucketed(b, bid, state_dir, n_buckets=4, **_ARGS)
    assert not os.path.isdir(f"{state_dir}/state_v0"), (
        "fully superseded version must be reclaimed"
    )
    hist = _hist_tuples(read_scd2_history_bucketed(spark, state_dir))
    assert len(hist) == 48  # 16 keys x 3 versions


def test_bucketed_batch0_bulk_load_fans_out_across_writers(spark, tmp_path):
    """A batch-0 bulk load spanning many buckets must be written by
    MULTIPLE tasks (one write partition per affected bucket), not
    funneled through a repartition(1) straggler (r9 verdict, What's
    wrong #2). Part-file indexes record the writing task: a single
    writer stamps every bucket dir part-00000; the fan-out stamps
    distinct indexes."""
    import os

    from mrt_data_integration_spark.streaming.scd import (
        merge_scd2_updates_bucketed,
        read_scd2_history_bucketed,
    )

    rows = [(k, "A", _ts(1 + (k % 20)), k) for k in range(200)]
    b0 = spark.createDataFrame(rows, _SCHEMA)
    state_dir = str(tmp_path / "bstate")
    merge_scd2_updates_bucketed(b0, 0, state_dir, n_buckets=8, **_ARGS)
    v0 = os.path.join(state_dir, "state_v0")
    part_ids = set()
    for d in os.listdir(v0):
        if d.startswith("bucket="):
            for f in os.listdir(os.path.join(v0, d)):
                if f.startswith("part-"):
                    part_ids.add(f.split("-")[1])
    assert len(part_ids) > 1, (
        f"batch-0 bulk load wrote through a single task: {part_ids}"
    )
    assert read_scd2_history_bucketed(spark, state_dir).count() == 200


def test_bucketed_merge_side_eviction_drops_empty_buckets(spark, tmp_path):
    """A merge_fn that deletes every row of an affected bucket's
    keyspace must remove that bucket from the manifest — the stale
    prior bucket must NOT be resurrected by reference (r9 ADVICE)."""
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.streaming.rollup import (
        _bucket_col,
        merge_into_bucketed_state,
        read_bucketed_state,
    )

    schema = "k long, v long"
    b0 = spark.createDataFrame([(k, 0) for k in range(32)], schema)
    kmap = {
        r.k: r.b
        for r in b0.select("k", _bucket_col(["k"], 4).alias("b")).collect()
    }
    assert len(set(kmap.values())) == 4  # all four buckets populated
    state = str(tmp_path / "estate")
    merge_into_bucketed_state(
        b0, 0, state, lambda batch, prev: batch, ["k"], n_buckets=4
    )
    # batch 1 re-touches every key but keeps only bucket 0's keyspace:
    # buckets 1-3 are affected and left empty → dropped, not carried
    keep = sorted(k for k, b in kmap.items() if b == 0)
    merge_into_bucketed_state(
        b0,
        1,
        state,
        lambda batch, prev: batch.filter(F.col("k").isin(keep)),
        ["k"],
        n_buckets=4,
    )
    got = sorted(r.k for r in read_bucketed_state(spark, state).collect())
    assert got == keep, "evicted buckets resurrected from stale manifest"


def test_bucketed_merge_rejects_rows_outside_touched_buckets(spark, tmp_path):
    """merge_fn output landing in a bucket the batch never touched must
    raise: that bucket's previous state was never loaded, so writing it
    would silently REPLACE it."""
    import pytest as _pytest

    from mrt_data_integration_spark.streaming.rollup import (
        _bucket_col,
        merge_into_bucketed_state,
    )

    schema = "k long, v long"
    all_keys = spark.createDataFrame([(k, 0) for k in range(32)], schema)
    kmap = {
        r.k: r.b
        for r in all_keys.select(
            "k", _bucket_col(["k"], 4).alias("b")
        ).collect()
    }
    in_b0 = [k for k, b in kmap.items() if b == 0]
    out_b = next(k for k, b in kmap.items() if b != 0)
    state = str(tmp_path / "sstate")
    batch = spark.createDataFrame([(k, 0) for k in in_b0], schema)
    stray = spark.createDataFrame([(out_b, 0)], schema)
    with _pytest.raises(ValueError, match="untouched buckets"):
        merge_into_bucketed_state(
            batch,
            0,
            state,
            lambda b, prev: b.unionByName(stray),
            ["k"],
            n_buckets=4,
        )


def test_bucketed_cdc_snapshot_equals_one_shot_collapse(spark, tmp_path):
    """SCD type 1 through the bucketed state: draining a CDC log
    (upserts + deletes, including deletes that empty an entire
    bucket's keyspace — the merge-side eviction contract's consumer)
    must leave EXACTLY the one-shot latest-event collapse of the full
    log."""
    from mrt_data_integration_spark.operators.scd import apply_cdc_changes
    from mrt_data_integration_spark.streaming.rollup import _bucket_col
    from mrt_data_integration_spark.streaming.scd import (
        merge_cdc_updates_bucketed,
        read_cdc_snapshot_bucketed,
    )

    schema = "k long, attr string, seq long, op string"
    keys = list(range(24))
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    kmap = {
        r.k: r.b
        for r in kdf.select("k", _bucket_col(["k"], 4).alias("b")).collect()
    }
    bucket0 = [k for k in keys if kmap[k] == 0]
    assert bucket0, "need at least one key in bucket 0"
    # batch 0: insert every key; batch 1: update half; batch 2: delete
    # ALL of bucket 0's keys (empties that bucket) + revive one key
    events = (
        [(k, "A", k, "U") for k in keys]
        + [(k, "B", 100 + k, "U") for k in keys if k % 2 == 0]
        + [(k, "B", 200 + k, "D") for k in bucket0]
        + [(bucket0[0], "Z", 300, "U")]
    )
    batches = [
        [e for e in events if e[2] < 100],
        [e for e in events if 100 <= e[2] < 200],
        [e for e in events if e[2] >= 200],
    ]
    state = str(tmp_path / "cdc_state")
    for bid, rows in enumerate(batches):
        merge_cdc_updates_bucketed(
            spark.createDataFrame(rows, schema),
            bid,
            state,
            key_cols=["k"],
            seq_cols=["seq"],
            op_col="op",
            n_buckets=4,
        )
    got = sorted(
        map(tuple, read_cdc_snapshot_bucketed(spark, state).collect())
    )
    want = sorted(
        map(
            tuple,
            apply_cdc_changes(
                None,
                spark.createDataFrame(events, schema),
                key_cols=["k"],
                seq_cols=["seq"],
                op_col="op",
            ).collect(),
        )
    )
    assert got == want
    # the deleted-but-not-revived bucket-0 keys are really gone
    surviving = {t[0] for t in got}
    assert surviving & set(bucket0) == {bucket0[0]}


def test_stream_merge_with_tombstones_equals_full_rebuild(
    spark, tmp_path
):
    """A CDC stream carrying DELETE tombstones (op_col pass-through,
    late r11) maintains exactly the history the one-shot collapse of
    the full log builds — deletes close versions across micro-batch
    boundaries (a batch ending ON a tombstone leaves the key with no
    current row, and the re-insert arriving in a LATER batch opens a
    new version numbered past the gap)."""
    schema = "k long, attr string, ts timestamp, rid long, op string"
    rows = [
        (1, "A", _ts(1), 1, "U"),
        (2, "X", _ts(1), 2, "U"),
        (1, None, _ts(3), 3, "D"),   # batch 1 ends with key 1 deleted
        (2, "Y", _ts(4), 4, "U"),
        (1, "A", _ts(5), 5, "U"),    # re-insert, same value as v1
        (2, None, _ts(6), 6, "D"),
        (3, "Q", _ts(7), 7, "U"),
        (2, "Z", _ts(8), 8, "U"),    # re-insert after delete
    ]
    src = str(tmp_path / "src")
    for i in range(4):
        spark.createDataFrame(rows[2 * i: 2 * i + 2], schema).coalesce(
            1
        ).write.mode("append").parquet(f"{src}/part{i}")
    state_dir = str(tmp_path / "state")
    args = dict(_ARGS, op_col="op")

    def sink(df, bid):
        merge_scd2_updates(df, bid, state_dir, **args)

    q = (
        spark.readStream.schema(schema)
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
            spark.createDataFrame(rows, schema), op_col="op", **_ARGS
        )
    )
    assert got == want
    # spot semantics: key 1 = v1 closed at the delete + v2 re-insert
    # (current); key 2 = v1, v2 (closed, the second by its delete),
    # v3 current
    by_key = {}
    for k, attr, _, vt, ver, cur in got:
        by_key.setdefault(k, []).append((ver, attr, vt, cur))
    assert [(v, a, c) for v, a, _, c in sorted(by_key[1])] == [
        (1, "A", False), (2, "A", True)
    ]
    assert by_key[1][0][2] == _ts(3)  # closed BY the tombstone
    assert [v for v, _, _, _ in sorted(by_key[2])] == [1, 2, 3]


def test_stream_merge_with_before_image_tombstones(spark, tmp_path):
    """The r12 boundary fix through the STREAMING path: tombstones
    carrying the prior row's values (Debezium-style before-image CDC
    deletes) must close the open version across micro-batch
    boundaries — before the fix an equal-valued tombstone vanished in
    the merge's collapse and the key stayed current forever."""
    from mrt_data_integration_spark.operators.scd import (
        changelog_to_scd2,
    )
    from mrt_data_integration_spark.streaming.scd import (
        merge_scd2_updates,
        read_scd2_history,
    )

    schema = "k long, attr string, ts timestamp, rid long, op string"
    rows = [
        (1, "A", _ts(1), 1, "U"),
        (2, None, _ts(1), 2, "U"),   # NULL-valued upsert
        (1, "A", _ts(3), 3, "D"),    # before-image: same attr as v1
        (2, None, _ts(4), 4, "D"),   # NULL -> NULL-carrying delete
        (1, "A", _ts(5), 5, "U"),    # re-insert across the gap
        (3, "Q", _ts(6), 6, "U"),
    ]
    src = str(tmp_path / "src")
    for i in range(3):
        spark.createDataFrame(rows[2 * i: 2 * i + 2], schema).coalesce(
            1
        ).write.mode("append").parquet(f"{src}/part{i}")
    state_dir = str(tmp_path / "state")
    args = dict(_ARGS, op_col="op")

    def sink(df, bid):
        merge_scd2_updates(df, bid, state_dir, **args)

    q = (
        spark.readStream.schema(schema)
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
            spark.createDataFrame(rows, schema), op_col="op", **_ARGS
        )
    )
    assert got == want
    by_key = {}
    for k, attr, _, vt, ver, cur in got:
        by_key.setdefault(k, []).append((ver, attr, vt, cur))
    # key 1: v1 closed BY the equal-valued tombstone, v2 current
    assert [(v, a, c) for v, a, _, c in sorted(by_key[1])] == [
        (1, "A", False), (2, "A", True)
    ]
    assert sorted(by_key[1])[0][2] == _ts(3)
    # key 2: its only version closed by the NULL->NULL delete; no
    # current row survives
    assert [(v, c) for v, _, _, c in sorted(by_key[2])] == [(1, False)]
