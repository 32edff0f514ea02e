"""Streaming-drain decomposition (guide §1): per-micro-batch
durationMs from StreamingQueryProgress for each streaming drain query.

Usage:
    python scripts/stream_diag.py [--reps N] streaming_dedup_ingest ...

Wraps queries.timeseries._drain_stream (every drain routes through it,
including streaming_scd2_history which imports it lazily) to record
``q.recentProgress`` after termination; prints per-batch durationMs
(addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets / triggerExecution) plus wall-clock per rep. Measurement
only — no engine behavior changes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrt_data_integration_spark.queries import QUERIES  # noqa: E402
from mrt_data_integration_spark.queries import timeseries  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402

_PROGRESS: list[dict] = []

_orig_drain = timeseries._drain_stream


def _drain_with_diag(
    updates, sink, mode="update", state_partitions=None, no_data_batches=True
):
    import shutil
    import tempfile

    spark = updates.sparkSession
    orig = (
        spark.conf.get("spark.sql.shuffle.partitions")
        if state_partitions
        else None
    )
    _NDB = "spark.sql.streaming.noDataMicroBatches.enabled"
    orig_ndb = spark.conf.get(_NDB) if not no_data_batches else None
    ck = tempfile.mkdtemp(prefix="graft_drain_ck_")
    try:
        if state_partitions:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(state_partitions)
            )
        if not no_data_batches:
            spark.conf.set(_NDB, "false")
        q = (
            updates.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            _PROGRESS.append(
                {
                    "batchId": p["batchId"],
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "numRowsTotal",
                                "numRowsUpdated",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            )
    finally:
        if orig is not None:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
        if orig_ndb is not None:
            spark.conf.set(_NDB, orig_ndb)
        shutil.rmtree(ck, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-diag")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").selectExpr(
        "sum(id)"
    ).collect()

    timeseries._drain_stream = _drain_with_diag
    try:
        for name in args.queries:
            for rep in range(args.reps):
                _PROGRESS.clear()
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, sf_dir).collect()
                wall = round(time.perf_counter() - t0, 3)
                print(
                    json.dumps(
                        {
                            "query": name,
                            "rep": rep,
                            "wall_s": wall,
                            "rows": len(rows),
                            "batches": _PROGRESS,
                        }
                    )
                )
                sys.stdout.flush()
    finally:
        timeseries._drain_stream = _orig_drain


if __name__ == "__main__":
    main()
