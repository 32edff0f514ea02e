"""Scaling-curve measurement: headline operators at 1x / 3x / 10x of
sf0.1, on fixed local[32] resources.

Corpus construction: each replica k offsets ids by k*10^7 and rewrites
every word w as md5(w || k) truncated to len(w) — same token-length
distribution and document sizes, but ZERO cross-replica vocabulary
overlap, so dedup workloads scale in INPUT size without the pair-count
blow-up that replicating identical text would cause (k exact copies of
every doc would add k^2 candidate pairs per cluster — that would
measure output growth, not engine scaling). Replicated frames are
written to parquet first so every run includes a realistic scan.

Usage: python scripts/scaling_curve.py  (writes one JSON line per op)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mrt_data_integration_spark.operators import dedup as dd  # noqa: E402
from mrt_data_integration_spark.operators import sketches as sk  # noqa: E402
from mrt_data_integration_spark.operators.sessionize import sessionize  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 3, 10)
REPS = 3


def replicate_docs(docs, k):
    parts = []
    for i in range(k):
        rewritten = F.concat_ws(
            " ",
            F.transform(
                F.split("text", r"\s+"),
                lambda w: F.substring(
                    F.md5(F.concat(w, F.lit(f"|{i}"))), 1, F.length(w)
                ),
            ),
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                rewritten.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_events(ev, k):
    parts = [
        ev.select(
            (F.col("event_id") + i * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + i * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark("scaling-curve")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base_docs = load_table(spark, SF_DIR, "documents")
    base_ev = load_table(spark, SF_DIR, "events")
    work = tempfile.mkdtemp(prefix="graft_scaling_")

    datasets = {}
    for k in SCALES:
        dpath = os.path.join(work, f"docs_{k}x")
        epath = os.path.join(work, f"events_{k}x")
        replicate_docs(base_docs, k).repartition(32).write.parquet(dpath)
        replicate_events(base_ev, k).repartition(32).write.parquet(epath)
        datasets[k] = (dpath, epath)

    def docs(k):
        return spark.read.parquet(datasets[k][0])

    def events(k):
        d = spark.read.parquet(datasets[k][1])
        return d

    ops = {
        "exact_dedup": lambda k: dd.exact_dedup(docs(k)).count(),
        "minhash_lsh_pairs": lambda k: dd.lsh_candidate_pairs(docs(k)).count(),
        "ngram_jaccard_capped": lambda k: dd.ngram_jaccard_pairs(
            docs(k), threshold=0.5, max_shingle_df=500
        ).count(),
        "simhash": lambda k: docs(k)
        .select(dd.simhash("text").alias("h"))
        .groupBy("h")
        .count()
        .count(),
        "heavy_hitters": lambda k: sk.heavy_hitters(
            events(k), ["event_type", "user_id"], uniform_multiple=1.5
        ).count(),
        "sessionize": lambda k: sessionize(events(k)).count(),
        "hourly_rollup": lambda k: events(k)
        .groupBy(F.date_trunc("hour", "ts"), "event_type")
        .agg(F.count(F.lit(1)), F.sum("value"))
        .count(),
    }

    results = {}
    for name, fn in ops.items():
        results[name] = {}
        for k in SCALES:
            shots = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(k)
                shots.append(time.perf_counter() - t0)
            shots.sort()
            results[name][k] = round(shots[len(shots) // 2], 3)
        r = results[name]
        print(
            json.dumps(
                {
                    "op": name,
                    "t_1x": r[1],
                    "t_3x": r[3],
                    "t_10x": r[10],
                    "slope_10x": round(r[10] / r[1], 2) if r[1] else None,
                }
            ),
            flush=True,
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
