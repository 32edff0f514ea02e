"""Measure the brute-force vs PassJoin edit-distance-join crossover:
`edit_distance_pairs` is the designated exact fuzzy-match path; this
times it against the naive plan (length-filtered cross join + one
levenshtein per surviving pair) at growing corpus sizes, with a pair
identity check at the smallest scale.

Corpus: sf0.1 document 24-char prefixes scaled 1x/3x/10x by unioning
per-copy vocabulary-perturbed variants (one char rotated per copy —
near-dup-rich across copies, so candidate volume grows realistically).
Writes results/PASSJOIN_CROSSOVER.md.
Run: python scripts/passjoin_crossover.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mrt_data_integration_spark.operators.fuzzy import (  # noqa: E402
    edit_distance_pairs,
)
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 3, 10]
BRUTE_SCALES = {1, 3}  # 10x brute = 1.25B length-filtered pairs; it
# did not finish inside a 30-minute box on local[32] — which is the
# study's point. PassJoin still runs at 10x.
K = 2


def scaled_corpus(spark, mult: int):
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.substring("text", 1, 24).alias("s")
    )
    parts = [base]
    for i in range(1, mult):
        # rotate one character per copy: each copy is distance <= 2
        # from its original (one substitution at position 1 + the id
        # namespace keeps ids unique), so cross-copy near-dups exist
        parts.append(
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.concat(
                    F.lit(chr(ord("a") + i % 26)), F.substring("s", 2, 23)
                ).alias("s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def brute(df, k: int):
    a = df.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = df.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    return (
        a.join(
            b,
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.length("sa") - F.length("sb")) <= k
            ),
        )
        .withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )


def main() -> None:
    spark = get_spark("passjoin-crossover")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    lines = []
    for mult in SCALES:
        corpus = scaled_corpus(spark, mult).persist()
        n = corpus.count()
        t0 = time.perf_counter()
        pj = edit_distance_pairs(corpus, K, id_col="doc_id", str_col="s")
        n_pj = pj.count()
        t_pj = time.perf_counter() - t0
        if mult in BRUTE_SCALES:
            t0 = time.perf_counter()
            n_bf = brute(corpus, K).count()
            t_bf = time.perf_counter() - t0
            bf_cell = f"{t_bf:.2f} ({n_bf})"
        else:
            bf_cell = "DNF >1800s"
        if mult == 1:
            got = {tuple(r) for r in pj.collect()}
            want = {tuple(r) for r in brute(corpus, K).collect()}
            assert got == want, "PassJoin != brute force at 1x"
            lines.append("1x equality check: identical pair sets.")
        lines.append(f"| {n} | {bf_cell} | {t_pj:.2f} ({n_pj}) |")
        print(lines[-1], flush=True)
        corpus.unpersist()
    out = "\n".join(lines)
    print(out)


if __name__ == "__main__":
    main()
