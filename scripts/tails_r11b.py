"""Bespoke 100x tail points for the three late-r11 families still on
10x grids: PMI collocations, weighted MinHash signatures, and
boilerplate span removal. Same protocol as scripts/tails_r11.py
(results/SCALING_CURVE.md:736): crossJoin-range replication with
per-replica disjoint vocab, corpus built OUTSIDE the timed region,
best-of-2, cache sweeps between shots.

Usage: python scripts/tails_r11b.py [scale]    (default 100)
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
sys.path.insert(0, _HERE)  # tails_r11 (the shared corpus builder)

from pyspark.sql import functions as F  # noqa: E402

from mrt_data_integration_spark.cache_registry import sweep_caches  # noqa: E402
from mrt_data_integration_spark.operators import dedup as dd  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402

from tails_r11 import build_corpus  # noqa: E402  (shared protocol)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("tails-r11b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    work = tempfile.mkdtemp(prefix="graft_tails_")
    path = os.path.join(work, f"docs_{k}x")
    build_corpus(spark, k, path)
    n_docs = spark.read.parquet(path).count()

    def pmi() -> int:
        from mrt_data_integration_spark.operators.collocations import (
            pmi_collocations as pmi_op,
        )

        n = (
            pmi_op(spark.read.parquet(path), window=2, min_count=5)
            .orderBy(F.col("pmi").desc(), "w1", "w2")
            .limit(20)
            .count()
        )
        sweep_caches()
        return n

    def wminhash() -> int:
        from mrt_data_integration_spark.operators.wminhash import (
            weighted_minhash_signatures as wmh,
        )

        d = spark.read.parquet(path)
        n_all = d.count()
        tok = d.select(
            "doc_id", F.explode(F.split("text", r"\s+")).alias("term")
        )
        tf = tok.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).alias("tf")
        )
        df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        idf = F.round(
            F.log((1.0 + float(n_all)) / (1.0 + F.col("df"))), 12
        ) + F.lit(1.0)
        w = tf.join(F.broadcast(df_), "term").select(
            "doc_id", "term", F.round(F.col("tf") * idf, 6).alias("w")
        )
        return wmh(w, n_hashes=8).count()

    def span_corruption() -> int:
        from mrt_data_integration_spark.operators.denoise import (
            span_corruption_pairs as sc_op,
        )

        return (
            sc_op(spark.read.parquet(path))
            .agg(F.sum("n_masked"))
            .collect()[0][0]
        )

    def boiler() -> int:
        out = dd.remove_boilerplate_spans(spark.read.parquet(path))
        n = out.agg(F.sum("n_kept")).collect()[0][0]
        dd.release_cache(out)
        return n

    for name, fn in (
        ("pmi_colloc", pmi),
        ("wminhash_sigs", wminhash),
        ("boilerplate_spans", boiler),
        ("span_corruption", span_corruption),
    ):
        shots = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            shots.append(round(time.perf_counter() - t0, 1))
        print(
            json.dumps(
                {
                    "op": name,
                    "k": k,
                    "n_docs": n_docs,
                    "best_of_2": min(shots),
                    "shots": shots,
                }
            )
        )

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
