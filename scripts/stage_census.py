"""Per-stage census of one warmed query evaluation (guide §1/§7.1).

Usage: python scripts/stage_census.py <query> [sf_dir]

Runs the query once to warm, then once labelled; prints each stage's
tasks / CPU / run / input / shuffle bytes from the AppStatusStore
(works with the UI server disabled). Counts and bytes are
deterministic; times are context.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrt_data_integration_spark.queries import QUERIES  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402


def _slist(seq):
    it = seq.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("stage-census")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    QUERIES[name](spark, sf_dir).collect()  # warm shot
    seen = {j.jobId() for j in _slist(store.jobsList(None))}
    sc.setJobDescription("census")
    rows = QUERIES[name](spark, sf_dir).collect()
    sc.setJobDescription(None)
    mine = [
        j
        for j in _slist(store.jobsList(None))
        if j.jobId() not in seen
        and j.description().isDefined()
        and j.description().get() == "census"
    ]
    sids = sorted({int(s) for j in mine for s in _slist(j.stageIds())})
    print(f"rows={len(rows)} jobs={len(mine)}")
    print(
        f"{'sid':>4} {'tasks':>5} {'cpu_s':>7} {'run_s':>7} {'inMB':>6} "
        f"{'shRdMB':>7} {'shWrMB':>7}"
    )
    tot = [0.0, 0.0]
    for sid in sids:
        try:
            st = store.lastStageAttempt(sid)
        except Exception:
            continue
        cpu = st.executorCpuTime() / 1e9
        if cpu < 0.05 and st.numCompleteTasks() == 0:
            continue
        tot[0] += cpu
        tot[1] += st.executorRunTime() / 1e3
        print(
            f"{sid:>4} {st.numCompleteTasks():>5} {cpu:>7.1f} "
            f"{st.executorRunTime() / 1e3:>7.1f} "
            f"{st.inputBytes() / 1e6:>6.1f} "
            f"{st.shuffleReadBytes() / 1e6:>7.1f} "
            f"{st.shuffleWriteBytes() / 1e6:>7.1f}"
        )
    print(f"total cpu={tot[0]:.1f} run={tot[1]:.1f}")


if __name__ == "__main__":
    main()
