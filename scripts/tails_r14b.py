"""Bespoke 100x tails for the mid-r14-continuation families —
idf-weighted shingle cosine top-k, the declarative constraint audit
(lineitem/orders legs), and the Cohen's-kappa agreement audit.
Protocol matches scripts/tails_r14.py: corpora are built ONCE outside
the timed region and parquet-materialized; each op is timed best-of-2
with cache sweeps between shots; all forced work is
aggregation-output (never a count() over a row-preserving map — the
r13 measurement-prune finding).

Usage: python scripts/tails_r14b.py [scale]    (default 100)
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
from scripts.scaling_curve import (  # noqa: E402
    replicate_docs,
    replicate_lineitem,
    replicate_orders,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    only = os.environ.get("SPARK_GRAFT_TAIL_OPS")
    wanted = set(only.split(",")) if only else None
    spark = get_spark("tails-r14b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    work = tempfile.mkdtemp(prefix="graft_tails14b_")

    need_docs = wanted is None or wanted & {"idf_topk", "agreement_kappa"}
    need_rel = wanted is None or "quality_audit" in wanted
    if need_docs:
        dpath = os.path.join(work, f"docs_{scale}x")
        replicate_docs(
            load_table(spark, SF_DIR, "documents"), scale
        ).repartition(64).write.parquet(dpath)
        docs = spark.read.parquet(dpath)
        n_docs = docs.count()
    if need_rel:
        lpath = os.path.join(work, f"lineitem_{scale}x")
        opath = os.path.join(work, f"orders_{scale}x")
        replicate_lineitem(
            load_table(spark, SF_DIR, "lineitem"), scale
        ).repartition(64).write.parquet(lpath)
        replicate_orders(
            load_table(spark, SF_DIR, "orders"), scale
        ).repartition(64).write.parquet(opath)
        li = spark.read.parquet(lpath)
        od = spark.read.parquet(opath)
        n_li = li.count()

    def _idf_topk():
        from mrt_data_integration_spark.operators import dedup as dd
        from mrt_data_integration_spark.operators.docsim import (
            idf_cosine_topk,
        )

        # registered (uncapped) params: replicas are vocab-disjoint,
        # so sum(df^2) — the join fan-out — grows linearly by
        # construction; the ranked output forces everything
        out = idf_cosine_topk(docs, k=3, threshold=0.05, max_shingle_df=None)
        n = out.count()
        dd.release_cache(out)
        return n

    def _quality_audit():
        from mrt_data_integration_spark.operators import (
            quality_audit as qa,
        )

        out = qa.combine_audit(
            qa.row_checks(
                li,
                "lineitem",
                [
                    (
                        "li_quantity_in_1_50",
                        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
                    ),
                    (
                        "li_extendedprice_positive",
                        F.col("l_extendedprice") <= 0,
                    ),
                    (
                        "li_discount_in_0_1",
                        (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                    ),
                    ("li_tax_nonnegative", F.col("l_tax") < 0),
                    (
                        "li_linenumber_in_1_7",
                        (F.col("l_linenumber") < 1)
                        | (F.col("l_linenumber") > 7),
                    ),
                ],
            ),
            qa.uniqueness_check(
                od, "orders", "ord_orderkey_unique", ["o_orderkey"]
            ),
            qa.referential_check(
                li, od, "lineitem", "li_orderkey_in_orders",
                ["l_orderkey"], ["o_orderkey"],
            ),
            qa.join_violation_check(
                li, od, [("l_orderkey", "o_orderkey")],
                "lineitem_x_orders", "li_ships_on_or_after_order",
                F.col("l_shipdate") < F.col("o_orderdate"),
            ),
        )
        return len(out.collect())

    def _agreement_kappa():
        from mrt_data_integration_spark.operators.agreement import (
            label_agreement,
        )
        from mrt_data_integration_spark.operators.text import (
            lang_id_heuristic,
        )

        frame = docs.filter(F.col("lang").isNotNull()).select(
            F.when(F.col("lang") == "en", F.lit("en"))
            .otherwise(F.lit("other"))
            .alias("ref"),
            lang_id_heuristic("text").alias("pred"),
        )
        return len(label_agreement(frame, "ref", "pred").collect())

    for name, fn, n_base in (
        ("idf_topk", _idf_topk, "docs"),
        ("quality_audit", _quality_audit, "lineitem"),
        ("agreement_kappa", _agreement_kappa, "docs"),
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
                    "n_rows_base": n_docs if n_base == "docs" else n_li,
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
