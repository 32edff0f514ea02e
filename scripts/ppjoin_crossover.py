"""Measure the plain-shingle-join vs PPJoin-prefix crossover (round-2
item #6): ``ngram_jaccard_pairs_prefix`` is the designated 100 TB exact-
Jaccard path but had never been timed beyond toy scale.

Scales the sf0.1 documents corpus 1x/3x/10x by unioning perturbed copies
(unique suffix token per copy -> realistic high-similarity cross-copy
pairs that stress the verify stage), then times, per scale:

  - plain   : ngram_jaccard_pairs, max_shingle_df=None  (exact, uncapped)
  - capped  : ngram_jaccard_pairs, max_shingle_df=500   (skew-capped)
  - prefix  : ngram_jaccard_pairs_prefix                (exact, PPJoin)

At 1x it also asserts plain == prefix pair-for-pair (both are exact).
Writes results/PPJOIN_CROSSOVER.md. Run: python scripts/ppjoin_crossover.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mrt_data_integration_spark.cache_registry import sweep_caches  # noqa: E402
from mrt_data_integration_spark.operators import dedup  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 3, 10]
THRESHOLD = 0.5


def scaled_corpus(spark, mult: int):
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n = base.count()
    parts = [base]
    for c in range(1, mult):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(c * n)).alias("doc_id"),
                # unique per-copy suffix: copies are near- but not exact
                # duplicates of the original (J just under 1.0)
                F.concat_ws(" ", "text", F.lit(f"copymark{c}")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # materialize so we time the join, not the scan/union
    return out.repartition(32).localCheckpoint()


def timed(fn, corpus, **kw):
    t0 = time.perf_counter()
    res = fn(corpus, threshold=THRESHOLD, **kw)
    n_pairs = res.count()
    dt = time.perf_counter() - t0
    dedup.release_cache(res)
    sweep_caches()
    return round(dt, 2), n_pairs


def pair_set(df):
    s = {(r[0], r[1]) for r in df.select("id_a", "id_b").collect()}
    dedup.release_cache(df)
    sweep_caches()
    return s


def main() -> None:
    spark = get_spark("ppjoin-crossover")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    # exactness cross-check at 1x: both exact paths, identical pair sets
    corpus1 = scaled_corpus(spark, 1)
    p_set = pair_set(
        dedup.ngram_jaccard_pairs(corpus1, threshold=THRESHOLD, max_shingle_df=None)
    )
    x_set = pair_set(dedup.ngram_jaccard_pairs_prefix(corpus1, threshold=THRESHOLD))
    assert p_set == x_set, (
        f"exact paths disagree: only-plain={list(p_set - x_set)[:5]} "
        f"only-prefix={list(x_set - p_set)[:5]}"
    )
    equality_note = (
        f"1x equality check: plain and prefix emit the identical "
        f"{len(p_set)} pairs."
    )
    print(equality_note, flush=True)

    # Regime 2: boilerplate-heavy corpus — every doc shares one 20-word
    # sentence (the "all rights reserved" pattern PPJoin targets). The
    # ~18 boilerplate shingles each have df == n_docs, so the plain
    # uncapped join fans out ~18·n² rows; prefix ordering pushes them
    # out of every prefix instead.
    boiler = (
        "this document is provided as is without warranty of any kind "
        "all rights reserved unauthorized reproduction is strictly prohibited"
    )
    boiler_rows = []
    for mult in [1]:
        corpus = scaled_corpus(spark, mult).select(
            "doc_id", F.concat_ws(" ", "text", F.lit(boiler)).alias("text")
        ).localCheckpoint()
        n_docs = corpus.count()
        t_plain, n_plain = timed(
            dedup.ngram_jaccard_pairs, corpus, max_shingle_df=None
        )
        t_cap, n_cap = timed(
            dedup.ngram_jaccard_pairs, corpus, max_shingle_df=500
        )
        t_pre, n_pre = timed(dedup.ngram_jaccard_pairs_prefix, corpus)
        boiler_rows.append(
            f"| {n_docs} | {t_plain} ({n_plain}) | {t_cap} ({n_cap}) "
            f"| {t_pre} ({n_pre}) |"
        )
        print("boiler:", boiler_rows[-1], flush=True)

    rows = []
    for mult in SCALES:
        corpus = scaled_corpus(spark, mult)
        n_docs = corpus.count()
        t_plain, n_plain = timed(
            dedup.ngram_jaccard_pairs, corpus, max_shingle_df=None
        )
        t_cap, n_cap = timed(
            dedup.ngram_jaccard_pairs, corpus, max_shingle_df=500
        )
        t_pre, n_pre = timed(dedup.ngram_jaccard_pairs_prefix, corpus)
        rows.append(
            f"| {n_docs} | {t_plain} ({n_plain}) | {t_cap} ({n_cap}) "
            f"| {t_pre} ({n_pre}) |"
        )
        print(rows[-1], flush=True)

    lines = [
        "# PPJoin prefix-filter vs plain shingle self-join — crossover",
        "",
        f"Corpus: sf0.1 documents scaled by perturbed copies; threshold={THRESHOLD},",
        "3-word shingles; times are wall-clock seconds on local[32] (single shot,",
        "JVM warmed). `plain` = exploded-shingle self-join (uncapped, exact);",
        "`capped` = same with max_shingle_df=500; `prefix` = PPJoin prefix filter",
        "(exact, no cap needed).",
        "",
        equality_note,
        "",
        "| docs | plain s (pairs) | capped s (pairs) | prefix s (pairs) |",
        "|---|---|---|---|",
        *rows,
        "",
        "## Boilerplate-heavy regime",
        "",
        "Same corpus with one shared 20-word sentence appended to EVERY doc",
        "(~18 shingles at df == n_docs). This is the regime the prefix filter",
        "targets: the plain uncapped join fans out ~18·n² rows on the hot",
        "shingles; `capped` drops them (changing the Jaccard universe — note",
        "the pair count); prefix keeps exact semantics with no cap.",
        "",
        "| docs | plain s (pairs) | capped s (pairs) | prefix s (pairs) |",
        "|---|---|---|---|",
        *boiler_rows,
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "PPJOIN_CROSSOVER.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
