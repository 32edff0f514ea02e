"""Bespoke 100x tails for the r14 families — Heaps' vocabulary growth
(plus the families registered later this round). Protocol matches
scripts/tails_r13.py: the 100x corpus (500k docs — replicate_docs'
per-replica md5 token rewrite, so replicas share no shingles) is
built ONCE outside the timed region and parquet-materialized; each op
is timed best-of-2 with cache sweeps between shots. All forced
aggregations collect threshold/profile outputs — never a count() over
a row-preserving map (the r13 measurement-prune finding).

Usage: python scripts/tails_r14.py [scale]    (default 100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from mrt_data_integration_spark.cache_registry import sweep_caches  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.sources import load_table  # noqa: E402
from scripts.scaling_curve import replicate_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("tails-r14")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    work = tempfile.mkdtemp(prefix="graft_tails14_")
    dpath = os.path.join(work, f"docs_{scale}x")
    base = load_table(spark, SF_DIR, "documents")
    replicate_docs(base, scale).repartition(64).write.parquet(dpath)
    docs = spark.read.parquet(dpath)
    n_docs = docs.count()

    def _heaps():
        from mrt_data_integration_spark.operators.lexstats import (
            heaps_growth,
        )

        # the ≤16-row profile output forces the token-grain shuffle,
        # both fan-out cumulations, and the fit fold (threshold-output
        # class — no count() prune possible)
        return len(heaps_growth(docs).collect())

    def _source_overlap():
        from mrt_data_integration_spark.operators import dedup as dd

        out = dd.source_overlap_matrix(docs)
        n = len(out.collect())
        dd.release_cache(out)
        return n

    def _robust_outliers():
        from pyspark.sql import functions as SF

        from mrt_data_integration_spark.operators.robust import (
            robust_outlier_flags,
        )

        row = (
            robust_outlier_flags(docs, "n_chars", "lang")
            .agg(
                SF.sum("robust_z"),
                SF.sum(SF.col("is_outlier").cast("long")),
            )
            .collect()
        )
        return len(row)

    def _ppmi_similarity():
        from mrt_data_integration_spark.operators import dedup as dd
        from mrt_data_integration_spark.operators.collocations import (
            ppmi_word_similarity,
        )

        # PRODUCTION fan-out controls (the containment-tail precedent:
        # the registered query stays uncapped only to be oracle-exact
        # at test scale): per-word top-50 contexts + a 1000-word
        # context df cap bound the inverted-index join at any vocab
        out = ppmi_word_similarity(
            docs,
            min_count=5,
            threshold=0.2,
            top_contexts=50,
            max_context_df=1000,
        )
        n = len(out.collect())
        dd.release_cache(out)
        return n

    def _source_js():
        from mrt_data_integration_spark.operators.drift import (
            source_js_matrix,
        )

        return len(source_js_matrix(docs, top_v=1000).collect())

    only = os.environ.get("SPARK_GRAFT_TAIL_OPS")
    wanted = set(only.split(",")) if only else None
    for name, fn in (
        ("heaps_growth", _heaps),
        ("source_overlap", _source_overlap),
        ("robust_outliers", _robust_outliers),
        ("ppmi_similarity", _ppmi_similarity),
        ("source_js", _source_js),
    ):
        if wanted is not None and name not in wanted:
            continue
        shots, rows = [], None
        for _ in range(2):
            sweep_caches()
            t0 = time.perf_counter()
            rows = fn()
            shots.append(round(time.perf_counter() - t0, 2))
        print(
            json.dumps(
                {
                    "op": name,
                    "scale": scale,
                    "n_docs": n_docs,
                    "best_s": min(shots),
                    "shots": shots,
                    "out_rows": rows,
                }
            ),
            flush=True,
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
