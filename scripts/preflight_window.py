"""Driver-replica window preflight: run the EXACT first 50 registered
queries (the driver-recorded window) Spark-vs-DuckDB at sf0.01 in a
fresh session — rows/schema/value-hash compare where an oracle exists,
execute-only otherwise. The end-of-round ritual that de-risks forced
first rows (the standing practice since r8: fresh-session hazards like
repr-drift in unrolled-CTE constants only show up OUTSIDE a warm
pytest session).

Usage: python scripts/preflight_window.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from mrt_data_integration_spark.queries import ORACLES, QUERIES  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from oracle_utils import compare_frames, run_oracle  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("preflight")
    names = list(QUERIES)[:50]
    t0 = time.time()
    n_hash = n_rows_only = 0
    fails: list = []
    for name in names:
        try:
            pdf = QUERIES[name](spark, sf).toPandas()
            if name in ORACLES:
                problems = compare_frames(pdf, run_oracle(ORACLES[name], sf))
                if problems:
                    fails.append((name, problems))
                else:
                    n_hash += 1
            else:
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            fails.append((name, repr(e)[:200]))
    print(
        f"hash-green={n_hash} rows_only={n_rows_only} fails={fails} "
        f"({round(time.time() - t0)}s)"
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
