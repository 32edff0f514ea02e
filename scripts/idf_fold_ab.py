"""A/B microbench: the idf pair-dot fold (order-pinned sorted HOF fold
over collect_list) vs an exact-decimal partial-aggregable sum.

Question (OPTIMIZATION_r14 'Not yet optimized' #1): the collect_list
partial ships every prod element through the pair Exchange because an
order-pinned float sum cannot partial-aggregate. An EXACT sum over
decimal(38,24) is order-independent (integer arithmetic), so it CAN
partial-aggregate map-side — but decimal adds run on BigDecimal, so
per-element cost may eat the win. Measure both on the real sf0.1
prods frame; also compare the resulting rounded cosines for identity.

Run AFTER the suite is idle:  python scripts/idf_fold_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mrt_data_integration_spark.operators.docsim import (  # noqa: E402
    idf_shingle_weights,
)
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.sources import load_table  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("idf-fold-ab")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = load_table(spark, sf_dir, "documents")
    vec = idf_shingle_weights(docs, "doc_id", "text", 3, None).persist()
    print("vec rows:", vec.count())

    a = vec.select(F.col("doc_id").alias("__a__"), "shingle", F.col("w").alias("wa"))
    b = vec.select(F.col("doc_id").alias("__b__"), "shingle", F.col("w").alias("wb"))
    prods = (
        a.join(b, "shingle")
        .filter(F.col("__a__") < F.col("__b__"))
        .select("__a__", "__b__", (F.col("wa") * F.col("wb")).alias("prod"))
    )
    # decimal variant: cast w ONCE per side (12-decimal values are exact
    # in decimal(14,12)); the product is decimal(29,24), sum exact.
    ad = vec.select(
        F.col("doc_id").alias("__a__"),
        "shingle",
        F.col("w").cast("decimal(14,12)").alias("wa"),
    )
    bd = vec.select(
        F.col("doc_id").alias("__b__"),
        "shingle",
        F.col("w").cast("decimal(14,12)").alias("wb"),
    )
    prods_dec = (
        ad.join(bd, "shingle")
        .filter(F.col("__a__") < F.col("__b__"))
        .select("__a__", "__b__", (F.col("wa") * F.col("wb")).alias("prod"))
    )

    fold = F.aggregate(
        F.sort_array(F.collect_list(F.col("prod"))),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )

    variants = {
        "A_sorted_hof_fold": lambda: prods.groupBy("__a__", "__b__").agg(
            fold.alias("dot"), F.count(F.lit(1)).alias("n_shared")
        ),
        "B_decimal_sum": lambda: prods_dec.groupBy("__a__", "__b__").agg(
            F.sum("prod").alias("dot"), F.count(F.lit(1)).alias("n_shared")
        ),
        "C_double_sum_bound": lambda: prods.groupBy("__a__", "__b__").agg(
            F.sum("prod").alias("dot"), F.count(F.lit(1)).alias("n_shared")
        ),
    }

    # canary
    t0 = time.perf_counter()
    load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.sum("l_quantity")
    ).collect()
    print(f"canary agg: {time.perf_counter() - t0:.2f}s")

    for rep in range(3):
        for name, mk in variants.items():
            sc.setJobDescription(f"idf-fold-ab {name} rep{rep}")
            t0 = time.perf_counter()
            noop(mk())
            print(f"rep{rep} {name}: {time.perf_counter() - t0:.2f}s", flush=True)
            sc.setJobDescription(None)

    # identity of the rounded cosine surface: join A vs B on pair and
    # compare round(dot / 1.0, 6) proxies (norms cancel — compare dots
    # directly at round 12 which is tighter than any cosine use).
    A = variants["A_sorted_hof_fold"]().select(
        "__a__", "__b__", F.col("dot").alias("dot_a")
    )
    B = variants["B_decimal_sum"]().select(
        "__a__", "__b__", F.col("dot").cast("double").alias("dot_b")
    )
    diff = (
        A.join(B, ["__a__", "__b__"])
        .select(
            F.max(F.abs(F.col("dot_a") - F.col("dot_b"))).alias("max_abs"),
            F.count(
                F.when(
                    F.round("dot_a", 6) != F.round("dot_b", 6), F.lit(1)
                )
            ).alias("n_round6_diff"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .collect()[0]
    )
    print("identity:", diff.asDict())


if __name__ == "__main__":
    main()
