"""Dump .explain("formatted") for every registered query (guide §1.3).

Usage: python scripts/dump_plans.py <outdir> [sf_dir]

Builds each registered query's DataFrame and writes its formatted
physical plan to <outdir>/<name>.txt. Building a query can itself run
jobs (kmeans training loops, streaming drains, in-plan collects) —
that is the declared build cost, paid here exactly as the driver pays
it.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrt_data_integration_spark.queries import QUERIES  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    failed = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        except Exception as e:  # noqa: BLE001
            failed.append((name, str(e)[:200]))
        print(name, flush=True)
    if failed:
        print("FAILED:", failed)


if __name__ == "__main__":
    main()
