"""Bespoke 100x tails for the four r13 families — categorical drift
(PSI/chi-square), token-budget selection, token-diversity profile,
and n-gram containment pairs. Protocol matches scripts/tails_r11*.py
/ tails_r12.py: the 100x corpus (500k docs — replicate_docs' per-
replica md5 token rewrite, so replicas share no shingles) is built
ONCE outside the timed region and parquet-materialized; each op is
timed best-of-2 with cache sweeps between shots.

Containment runs at the PRODUCTION setting (max_shingle_df=500 — the
only fan-out control the operator has, since containment admits no
size-ratio join prune); the other three are parameter-identical to
their registered queries.

Usage: python scripts/tails_r13.py [scale]    (default 100)
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

from pyspark.sql import functions as F  # noqa: E402

from mrt_data_integration_spark.cache_registry import sweep_caches  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.sources import load_table  # noqa: E402
from scripts.scaling_curve import replicate_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("tails-r13")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    work = tempfile.mkdtemp(prefix="graft_tails13_")
    dpath = os.path.join(work, f"docs_{scale}x")
    base = load_table(spark, SF_DIR, "documents")
    replicate_docs(base, scale).repartition(64).write.parquet(dpath)
    docs = spark.read.parquet(dpath)
    n_docs = docs.count()

    # Forced aggregations over the COMPUTED columns, never count():
    # a count lets the optimizer prune row-preserving computation
    # entirely (the r13 measurement-prune finding — a count()-timed
    # pure map measures the parquet scan, not the operator).
    def _drift():
        from mrt_data_integration_spark.operators.drift import (
            category_drift_profile,
        )

        return len(
            category_drift_profile(
                docs,
                "lang",
                F.right(F.col("source"), F.lit(1)).isin(
                    "0", "2", "4", "6", "8"
                ),
            )
            .agg(F.sum("psi_term"), F.sum("chi2_term"))
            .collect()
        )

    def _budget():
        from mrt_data_integration_spark.operators.budget import (
            token_budget_select,
        )
        from mrt_data_integration_spark.operators.text import token_count

        return len(
            token_budget_select(
                docs.withColumn("__tok__", token_count("text")),
                budget=1500,
                group_col="source",
                quality_col="n_chars",
                tokens_col="__tok__",
            )
            .agg(
                F.sum("cum_tokens"),
                F.count(F.when(F.col("selected"), 1)),
            )
            .collect()
        )

    def _diversity():
        from mrt_data_integration_spark.operators.diversity import (
            token_diversity_profile,
        )

        return len(
            token_diversity_profile(docs)
            .agg(F.sum("entropy"), F.sum("simpson"))
            .collect()
        )

    def _containment():
        from mrt_data_integration_spark.operators import dedup as dd

        out = dd.containment_pairs(
            docs, threshold=0.2, max_shingle_df=500
        )
        n = out.count()
        dd.release_cache(out)
        return n

    def _winnow_profile():
        from mrt_data_integration_spark.operators.winnow import (
            winnow_profile,
        )

        # re-bases the r12 tail, whose count() timing was scan-only
        return len(
            winnow_profile(docs, k=3, w=4)
            .agg(F.sum("n_fps"), F.sum("n_grams"))
            .collect()
        )

    def _ks_drift():
        from mrt_data_integration_spark.operators.drift import (
            two_sample_ks_profile,
        )

        return len(
            two_sample_ks_profile(
                docs.withColumn("n_chars", F.length("text")),
                "n_chars",
                F.col("lang") == "en",
            )
            .agg(F.max("ks_term"))
            .collect()
        )

    def _zipf():
        from mrt_data_integration_spark.operators.lexstats import (
            zipf_profile,
        )

        return len(zipf_profile(docs).collect())

    only = os.environ.get("SPARK_GRAFT_TAIL_OPS")
    wanted = set(only.split(",")) if only else None
    for name, fn in (
        ("category_drift", _drift),
        ("token_budget", _budget),
        ("token_diversity", _diversity),
        ("containment_pairs", _containment),
        ("winnow_profile", _winnow_profile),
        ("ks_drift", _ks_drift),
        ("zipf_profile", _zipf),
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
