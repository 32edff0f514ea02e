"""State-store config A/B for the streaming drains (guide §1 / §5).

Runs a named drain under a matrix of state-store configs in one
session, reporting wall + per-batch durations. Monkeypatches
_sized_state_partitions where a partition-count variant is requested.
Measurement only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrt_data_integration_spark.queries import QUERIES  # noqa: E402
from mrt_data_integration_spark.queries import timeseries  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402

ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

_PROGRESS: list[dict] = []
_orig_drain = timeseries._drain_stream
_orig_sized = timeseries._sized_state_partitions
_FORCE_PARTS: list = [None]


def _drain_with_diag(updates, sink, mode="update", state_partitions=None, no_data_batches=True):
    import shutil
    import tempfile

    spark = updates.sparkSession
    if _FORCE_PARTS[0] is not None:
        state_partitions = _FORCE_PARTS[0]
    orig = (
        spark.conf.get("spark.sql.shuffle.partitions")
        if state_partitions
        else None
    )
    ck = tempfile.mkdtemp(prefix="graft_drain_ck_")
    try:
        if state_partitions:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(state_partitions)
            )
        q = (
            updates.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            dm = p.get("durationMs") or {}
            _PROGRESS.append(
                {
                    "batchId": p["batchId"],
                    "rows": p.get("numInputRows"),
                    "trigger": dm.get("triggerExecution"),
                    "addBatch": dm.get("addBatch"),
                    "commit_sum": sum(
                        so.get("commitTimeMs") or 0
                        for so in p.get("stateOperators", [])
                    ),
                }
            )
    finally:
        if orig is not None:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
        shutil.rmtree(ck, ignore_errors=True)


VARIANTS = [
    ("baseline_hdfs", {}, None),
    ("rocksdb", {"spark.sql.streaming.stateStore.providerClass": ROCKS}, None),
    (
        "rocksdb_changelog",
        {
            "spark.sql.streaming.stateStore.providerClass": ROCKS,
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled": "true",
        },
        None,
    ),
    ("hdfs_parts32", {}, 32),
    ("hdfs_parts2", {}, 2),
    (
        "hdfs_nodata_off",
        {"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
        None,
    ),
]


def main() -> None:
    names = sys.argv[1:] or ["streaming_dedup_ingest"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-state-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").selectExpr(
        "sum(id)"
    ).collect()

    timeseries._drain_stream = _drain_with_diag
    try:
        for name in names:
            # warm the staged dir + session once
            QUERIES[name](spark, sf_dir).collect()
            for tag, confs, parts in VARIANTS:
                olds = {}
                for k, v in confs.items():
                    try:
                        olds[k] = spark.conf.get(k)
                    except Exception:
                        olds[k] = None
                    spark.conf.set(k, v)
                _FORCE_PARTS[0] = parts
                walls = []
                batches = None
                for _ in range(2):
                    _PROGRESS.clear()
                    t0 = time.perf_counter()
                    rows = QUERIES[name](spark, sf_dir).collect()
                    walls.append(round(time.perf_counter() - t0, 3))
                    batches = list(_PROGRESS)
                    _ = len(rows)
                for k, v in olds.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
                _FORCE_PARTS[0] = None
                print(
                    json.dumps(
                        {
                            "query": name,
                            "variant": tag,
                            "walls": walls,
                            "last_rep_batches": batches,
                        }
                    )
                )
                sys.stdout.flush()
    finally:
        timeseries._drain_stream = _orig_drain
        timeseries._sized_state_partitions = _orig_sized


if __name__ == "__main__":
    main()
