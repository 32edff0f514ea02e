"""Deterministic per-query job census (guide §1 / §7.1, REST flavor).

Usage:
    python scripts/job_census.py q1 q2 ...

For each named query: runs ONE evaluation (collect) with a unique job
description, then reads the local Spark UI REST API to sum, over
exactly the jobs of that evaluation: job count, stage count, task
count, executorRunTime, executorCpuTime, shuffle read/write bytes and
input bytes. Counts and shuffle bytes are DETERMINISTIC (identical on
a calm or contended box — the property the r14 contention windows
force us to lean on); CPU/run time are reported for context only
(this box's guest CPU counters inflate under host steal, see
OPTIMIZATION_r14.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrt_data_integration_spark.queries import QUERIES  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402


def census(spark, name: str, sf_dir: str) -> dict:
    """Sums over exactly this evaluation's jobs, via the JVM-side
    AppStatusStore (the UI's backing store — works with the UI server
    disabled, which the engine's session factory does)."""
    desc = f"census::{name}"
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    seen_jobs = {j.jobId() for j in _scala_list(store.jobsList(None))}
    sc.setJobDescription(desc)
    rows = QUERIES[name](spark, sf_dir).collect()
    sc.setJobDescription(None)
    mine = [
        j
        for j in _scala_list(store.jobsList(None))
        if j.jobId() not in seen_jobs
        and j.description().isDefined()
        and j.description().get() == desc
    ]
    stage_ids = sorted(
        {int(s) for j in mine for s in _scala_list(j.stageIds())}
    )
    out = {
        "rows": len(rows),
        "jobs": len(mine),
        "stages": 0,
        "tasks": 0,
        "executorRunTime_s": 0.0,
        "executorCpuTime_s": 0.0,
        "inputBytes": 0,
        "shuffleReadBytes": 0,
        "shuffleWriteBytes": 0,
    }
    for sid in stage_ids:
        try:
            st = store.lastStageAttempt(sid)
        except Exception:
            continue  # stage skipped (reused exchange): never ran
        out["stages"] += 1
        out["tasks"] += st.numCompleteTasks()
        out["executorRunTime_s"] += st.executorRunTime() / 1e3
        out["executorCpuTime_s"] += st.executorCpuTime() / 1e9
        out["inputBytes"] += st.inputBytes()
        out["shuffleReadBytes"] += st.shuffleReadBytes()
        out["shuffleWriteBytes"] += st.shuffleWriteBytes()
    for k in ("executorRunTime_s", "executorCpuTime_s"):
        out[k] = round(out[k], 2)
    return out


def _scala_list(seq):
    it = seq.iterator()
    items = []
    while it.hasNext():
        items.append(it.next())
    return items


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-census")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    for name in sys.argv[1:]:
        print(json.dumps({name: census(spark, name, sf_dir)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
