"""Optimization-round measurement harness (guide §1).

Usage:
    python scripts/opt_measure.py [--plans DIR] [--reps N] [--tag TAG] q1 q2 ...
    python scripts/opt_measure.py --canary          # contention canary only

For each named query: captures ``.explain("formatted")`` to
``plans/r14/<q>_<tag>.txt`` and times ``reps`` shots with the same
methodology as bench.py (collect of the declared result; queries are
small-result by contract so collect == compute+tiny transfer). Runs the
``pricing_summary`` contention canary first — if its median is not
within ~2x of 0.6 s the box is host-contended and numbers should be
discarded (results/LATE_R14_NOTES.md protocol).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrt_data_integration_spark.queries import QUERIES  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402


def _time_query(spark, name, sf_dir, reps):
    fn = QUERIES[name]
    shots = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        shots.append(round(time.perf_counter() - t0, 3))
        _ = len(rows)
    shots.sort()
    return shots[(len(shots) - 1) // 2], shots


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--canary", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-measure")
    # same warmup as bench.py
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.sources import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    load_table(spark, sf_dir, "region").collect()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").selectExpr(
        "sum(id)"
    ).collect()

    med, shots = _time_query(spark, "pricing_summary", sf_dir, 3)
    print(json.dumps({"canary_pricing_summary": {"median": med, "shots": shots}}))
    if args.canary and not args.queries:
        return

    out = {}
    for name in args.queries:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            spark.sparkContext.setJobDescription(f"opt_measure plan: {name}")
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"opt_measure time: {name}")
        med, shots = _time_query(spark, name, sf_dir, args.reps)
        out[name] = {"median": med, "shots": shots}
        print(json.dumps({name: out[name]}))
        sys.stdout.flush()
    print(json.dumps({"medians": {k: v["median"] for k, v in out.items()}}))


if __name__ == "__main__":
    main()
