"""Unit tests for operators/decontaminate.py (round-4 additions):
n-gram repetition edge cases and the benchmark decontamination flag."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.decontaminate import (
    decontaminate,
    ngram_repetition,
    word_ngrams,
)


def test_ngram_repetition_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # grams: ab ba ab ba ab -> 2/5 distinct
            (2, "all tokens differ here"),
            (3, "single"),               # < 2 tokens -> NULL
            (4, "x x x x"),              # all grams identical -> 2/3 dup
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", ngram_repetition("text", 2).alias("rep")
        ).collect()
    }
    assert abs(rows[1] - (1 - 2 / 5)) < 1e-12
    assert rows[2] == 0.0
    assert rows[3] is None
    assert abs(rows[4] - (1 - 1 / 3)) < 1e-12


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    out = df.select(word_ngrams("text", 3).alias("g")).collect()[0]["g"]
    assert out == []


def test_decontaminate_flags(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 'quick brown fox'
            (2, "totally unrelated words only"),
            (3, "ends with brown fox jumps ok"),  # shares 'brown fox jumps'
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps high")], "doc_id int, text string"
    )
    for bcast in (True, False):
        got = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(
                corpus, bench, ngram_n=3, broadcast_benchmark=bcast
            ).collect()
        }
        assert got == {1: True, 2: False, 3: True}


def test_decontaminate_keeps_schema(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id int, text string, lang string"
    )
    bench = spark.createDataFrame([(9, "z z z")], "doc_id int, text string")
    out = decontaminate(corpus, bench, ngram_n=2)
    assert set(out.columns) == {"doc_id", "text", "lang", "contaminated"}
    assert out.filter(F.col("contaminated")).count() == 0


def test_decontaminate_matches_python_reference_randomized(spark):
    """Seeded randomized differential: the distributed flag must equal a
    pure-Python n-gram overlap check on every doc (no false positives OR
    negatives), across several corpus shapes."""
    import random

    rng = random.Random(20260813)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        n = 4 if trial == 0 else 3
        corpus_rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(60)
        ]
        bench_rows = [
            (1000 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 10))))
            for i in range(8)
        ]

        def grams(text, k):
            toks = text.split()
            return {
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            } if len(toks) >= k else set()

        bench_grams = set().union(*(grams(t, n) for _, t in bench_rows))
        expected = {
            i: bool(grams(t, n) & bench_grams) for i, t in corpus_rows
        }

        from mrt_data_integration_spark.operators.decontaminate import decontaminate

        corpus = spark.createDataFrame(corpus_rows, "doc_id int, text string")
        bench = spark.createDataFrame(bench_rows, "doc_id int, text string")
        got = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(corpus, bench, ngram_n=n).collect()
        }
        assert got == expected, f"trial {trial}: mismatches " + str(
            {k: (got[k], expected[k]) for k in got if got[k] != expected[k]}
        )


def test_bloom_decontamination_equals_exact(spark, sf_smoke):
    """The two-phase Bloom gate must reproduce the exact path bit for
    bit — false positives die in the exact verify. Checked at a sane
    filter size AND at an absurdly small one (high FP pressure)."""
    from mrt_data_integration_spark.operators.decontaminate import (
        decontaminate,
        decontaminate_bloom,
    )
    from mrt_data_integration_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    want = sorted(
        (r.doc_id, r.contaminated)
        for r in decontaminate(corpus, bench, ngram_n=3).collect()
    )
    for n_bits in (1 << 18, 1 << 8):
        got = sorted(
            (r.doc_id, r.contaminated)
            for r in decontaminate_bloom(
                corpus, bench, ngram_n=3, n_bits=n_bits
            ).collect()
        )
        assert got == want, f"n_bits={n_bits}"


def test_bloom_gate_actually_prunes(spark, sf_smoke):
    """The point of the gate: at a sane size, Bloom survivors are a
    small fraction of the corpus gram stream (the exact-verify shuffle
    shrinks accordingly). Uses DISJOINT vocabularies so the true-hit
    floor is zero and the measured pass rate IS the FP rate."""
    from mrt_data_integration_spark.operators.decontaminate import (
        build_ngram_bloom,
        word_ngrams,
    )

    corpus = spark.createDataFrame(
        [(i, " ".join(f"c{i}w{j}" for j in range(12))) for i in range(50)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(i, " ".join(f"b{i}w{j}" for j in range(12))) for i in range(50)],
        "doc_id long, text string",
    )
    n_bits, n_hashes = 1 << 18, 3
    bitmap = build_ngram_bloom(bench, 3, n_bits, n_hashes)
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in bitmap)
    # 50 docs * 10 grams * 3 hashes = 1500 positions max
    assert 0 < set_bits <= 1500
    # with 2^18 bits and ~500 grams, FP rate ~ (1500/2^18)^3 — measure
    # the gate on the corpus grams via the same expressions the
    # operator uses (exercised end-to-end in the identity test above;
    # here we pin the REDUCTION, the gate's reason to exist)
    bloom_df = spark.createDataFrame([(bitmap,)], "__bloom__ array<bigint>")
    from mrt_data_integration_spark.operators.decontaminate import (
        _bloom_gate,
    )

    grams = corpus.select(
        F.explode(
            F.array_distinct(F.transform(word_ngrams("text", 3), F.md5))
        ).alias("__gh__")
    )
    gate = _bloom_gate("__gh__", "__bloom__", n_bits, n_hashes)
    total = grams.count()
    passed = grams.join(F.broadcast(bloom_df)).filter(gate).count()
    assert passed < total * 0.01, (passed, total)


def test_bloom_rejects_sub_word_bitmaps(spark):
    """n_bits below one 64-bit word (or non-power-of-two) must fail at
    entry with a clear error, not crash after the distributed build."""
    import pytest

    from mrt_data_integration_spark.operators.decontaminate import (
        build_ngram_bloom,
    )

    bench = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 64"):
        build_ngram_bloom(bench, 3, n_bits=32)
    with pytest.raises(ValueError, match="power of two"):
        build_ngram_bloom(bench, 3, n_bits=100)


def test_contamination_overlap_fractions_and_threshold(spark):
    """Hand-computed overlap fractions; min_overlap gates the flag;
    sub-ngram docs get NULL fraction and a false flag."""
    from mrt_data_integration_spark.operators.decontaminate import (
        contamination_overlap,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # grams(2): {alpha beta, beta gamma, gamma delta} — all 3 hit
            (1, "alpha beta gamma delta"),
            # grams: {zz alpha, alpha beta, beta yy} — 1 of 3 hits
            (2, "zz alpha beta yy"),
            # no shared grams
            (3, "one two three four"),
            # shorter than ngram_n → NULL fraction
            (4, "alpha"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.overlap_frac, r.contaminated)
        for r in contamination_overlap(
            corpus, bench, ngram_n=2, min_overlap=0.5
        ).collect()
    }
    assert out[1] == (1.0, True)
    assert out[2][1] is False and abs(out[2][0] - 1 / 3) < 1e-12
    assert out[3] == (0.0, False)
    assert out[4] == (None, False)


def test_contamination_overlap_zero_threshold_equals_binary(spark, sf_smoke):
    """min_overlap=0.0 must reproduce the binary decontaminate flag
    exactly (any hit => fraction > 0) — the GPT-3 rule as the graded
    rule's degenerate case."""
    from mrt_data_integration_spark.operators.decontaminate import (
        contamination_overlap,
        decontaminate,
    )
    from mrt_data_integration_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    want = sorted(
        (r.doc_id, r.contaminated)
        for r in decontaminate(corpus, bench, ngram_n=3).collect()
    )
    got = sorted(
        (r.doc_id, r.contaminated)
        for r in contamination_overlap(
            corpus, bench, ngram_n=3, min_overlap=0.0
        ).collect()
    )
    assert got == want


def test_contamination_overlap_python_twin(spark, sf_smoke):
    """Fractions match a local recomputation over the same whitespace
    tokenization and distinct-gram sets."""
    from mrt_data_integration_spark.operators.decontaminate import (
        contamination_overlap,
    )
    from mrt_data_integration_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0).limit(40)
    bench = docs.filter(F.col("doc_id") % 97 == 0)

    def grams(t, n=3):
        toks = t.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    bset = set()
    for r in bench.collect():
        bset |= grams(r.text)
    got = {
        r.doc_id: r.overlap_frac
        for r in contamination_overlap(corpus, bench, ngram_n=3).collect()
    }
    for r in corpus.collect():
        g = grams(r.text)
        want = (len(g & bset) / len(g)) if g else None
        if want is None:
            assert got[r.doc_id] is None, r.doc_id
        else:
            assert abs(got[r.doc_id] - want) < 1e-12, r.doc_id


def test_gram_explode_plans_carry_no_duplicating_inferred_filter(spark):
    """r15 pin: the gram-explode sites use explode_outer + an explicit
    post-filter, because plain explode makes the optimizer infer a
    size()>0 filter and push it below the projection — re-running the
    whole gram construction a second time per document (guide §4.4's
    filter-duplication class, exploded-array form). No plan in this
    family may contain a Filter that re-evaluates the construction."""
    import re

    from mrt_data_integration_spark.operators.decontaminate import (
        contamination_overlap,
        decontaminate,
        decontaminate_bloom,
    )
    from mrt_data_integration_spark.operators.dedup import release_cache

    docs = spark.createDataFrame(
        [(i, f"tok{i} a b c d e f g h i j") for i in range(12)],
        "doc_id long, text string",
    )
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    for frame in (
        decontaminate(corpus, bench, ngram_n=3),
        contamination_overlap(corpus, bench, ngram_n=3),
        decontaminate_bloom(corpus, bench, ngram_n=3),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        dups = re.findall(r"Filter \(*size\(array_distinct", plan)
        assert not dups, plan[:2000]
        release_cache(frame)


def test_contamination_overlap_hits_broadcast_is_gated(spark):
    """broadcast_hits=False must route the join-back through a plain
    shuffle join (the graded hit frame can approach corpus size on a
    heavily-overlapping corpus — force-broadcasting it there OOMs the
    driver), with identical results either way."""
    from mrt_data_integration_spark.operators.decontaminate import (
        contamination_overlap,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zz alpha beta yy")],
        "doc_id long, text string",
    )
    kw = dict(ngram_n=2, min_overlap=0.5)
    bcast = contamination_overlap(corpus, bench, **kw)
    plain = contamination_overlap(
        corpus, bench, broadcast_hits=False, **kw
    )
    key = lambda df: sorted(
        (r.doc_id, r.overlap_frac, r.contaminated) for r in df.collect()
    )
    assert key(bcast) == key(plain)


# --- semantic (embedding-space) decontamination (r12) ----------------


def _emb_frame(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_semantic_decon_planted_copy_and_twin(spark):
    """A planted scaled copy of a benchmark vector scores cosine 1.0
    and must flag; every max_bench_sim equals the numpy max over the
    benchmark (sequential-fold arithmetic, rounded to 4)."""
    import numpy as np

    from mrt_data_integration_spark.operators.decontaminate import (
        semantic_decontamination,
    )

    rng = np.random.default_rng(5)
    B = rng.normal(size=(6, 8))
    C = rng.normal(size=(20, 8))
    C[7] = 3.0 * B[2]  # planted: exact direction match
    bench = _emb_frame(
        spark, [(i, [float(x) for x in B[i]]) for i in range(6)]
    )
    corpus = _emb_frame(
        spark, [(100 + i, [float(x) for x in C[i]]) for i in range(20)]
    )
    out = {
        r.vec_id: r
        for r in semantic_decontamination(
            corpus, bench, threshold=0.9
        ).collect()
    }
    assert len(out) == 20
    assert out[107].contaminated and out[107].max_bench_sim == 1.0
    for i in range(20):
        want = round(
            max(
                float(np.dot(C[i], B[j]))
                / (np.linalg.norm(C[i]) * np.linalg.norm(B[j]))
                for j in range(6)
            ),
            4,
        )
        # numpy pairwise summation can differ from the sequential fold
        # in the last ulp — compare at the rounded grain with slack 1e-4
        assert abs(out[100 + i].max_bench_sim - want) <= 1e-4
        assert out[100 + i].contaminated == (
            out[100 + i].max_bench_sim >= 0.9
        )


def test_semantic_decon_ivf_full_probe_equals_brute(spark):
    """n_probe == n_cells scores every (corpus, benchmark) pair — the
    IVF path must reproduce the brute output exactly; a partial probe
    may only SHRINK the flagged set (one-sided approximation), and
    unprobed corpus vectors keep NULL max_bench_sim with
    contaminated=false."""
    import numpy as np

    from mrt_data_integration_spark.operators.cluster import kmeans_lloyd
    from mrt_data_integration_spark.operators.decontaminate import (
        semantic_decontamination,
        semantic_decontamination_ivf,
    )
    from mrt_data_integration_spark.operators.dedup import release_cache

    rng = np.random.default_rng(11)
    B = rng.normal(size=(5, 6))
    C = rng.normal(size=(30, 6))
    bench = _emb_frame(
        spark, [(i, [float(x) for x in B[i]]) for i in range(5)]
    )
    corpus = _emb_frame(
        spark, [(100 + i, [float(x) for x in C[i]]) for i in range(30)]
    )
    assigns, centers = kmeans_lloyd(corpus, k=4, n_iter=2)
    corpus_c = corpus.join(assigns.select("vec_id", "cell"), "vec_id")
    brute = {
        r.vec_id: (r.max_bench_sim, r.contaminated)
        for r in semantic_decontamination(
            corpus, bench, threshold=0.3
        ).collect()
    }
    full = {
        r.vec_id: (r.max_bench_sim, r.contaminated)
        for r in semantic_decontamination_ivf(
            corpus_c, bench, centers, threshold=0.3, n_probe=4
        ).collect()
    }
    release_cache(assigns)
    assert full == brute
    part = semantic_decontamination_ivf(
        corpus_c, bench, centers, threshold=0.3, n_probe=1
    ).collect()
    assert {r.vec_id for r in part} == set(brute), "grain: every vector"
    for r in part:
        if r.max_bench_sim is None:
            assert r.contaminated is False
        else:
            assert r.max_bench_sim <= brute[r.vec_id][0] + 1e-12
        assert (not r.contaminated) or brute[r.vec_id][1]


def test_semantic_decon_partitioning_and_plan(spark):
    import numpy as np

    from mrt_data_integration_spark.operators.decontaminate import (
        semantic_decontamination,
    )

    rng = np.random.default_rng(3)
    bench = _emb_frame(
        spark,
        [(i, [float(x) for x in rng.normal(size=6)]) for i in range(4)],
    )
    corpus = _emb_frame(
        spark,
        [
            (100 + i, [float(x) for x in rng.normal(size=6)])
            for i in range(25)
        ],
    )
    a = sorted(
        map(tuple, semantic_decontamination(corpus, bench).collect())
    )
    b = sorted(
        map(
            tuple,
            semantic_decontamination(
                corpus.repartition(9), bench.repartition(3)
            ).collect(),
        )
    )
    assert a == b
    plan = (
        semantic_decontamination(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # the per-row max collapses INSIDE the Arrow kernel (opt r14):
    # one map-side pass, no pair frame, no exchange — vectors never
    # shuffle
    assert "MapInArrow" in plan
    assert "Exchange" not in plan


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_semantic_decon_ivf_lloyds_replay_oracle(spark, sf):
    """Full DuckDB hash-strength oracle for the IVF PRODUCTION path
    (the r12 verdict's item 5 — the hard_negative_ivf_probe precedent
    reused): the oracle replays every Lloyd's iteration as unrolled
    CTEs, re-derives the cell index, ranks each BENCHMARK vector's 2
    probe cells by centroid distance, scores only corpus vectors in
    probed cells, and reproduces the per-vector max cosine + the NULL
    unprobed boundary — so the approximate semantic screen is
    verified end-to-end (training loop, probe selection, candidate
    bound, flag semantics), not just identity-pinned against brute.
    Run at sf0.001/sf0.01 in CI; sf0.1 verified at registration
    (results/LATE_R13_NOTES.md)."""
    from mrt_data_integration_spark.operators.cluster import kmeans_lloyd
    from mrt_data_integration_spark.operators.decontaminate import (
        semantic_decontamination_ivf,
    )
    from mrt_data_integration_spark.operators.dedup import release_cache
    from mrt_data_integration_spark.queries.vectors import (
        _KMEANS_ITER,
        _KMEANS_K,
        _kmeans_ctes,
    )
    from mrt_data_integration_spark.sources import load_table
    from tests.oracle_utils import compare_frames, run_oracle

    sf_dir = f"/root/testdata/{sf}"
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    assigns, centers = kmeans_lloyd(emb, k=_KMEANS_K, n_iter=_KMEANS_ITER)
    corpus_assigned = emb.filter(F.col("vec_id") % 25 != 0).join(
        assigns.select("vec_id", "cell"), "vec_id"
    )
    bench = emb.filter(F.col("vec_id") % 25 == 0)
    got = semantic_decontamination_ivf(
        corpus_assigned, bench, centers, threshold=0.35, n_probe=2
    ).toPandas()
    release_cache(assigns)

    oracle = f"""
    {_kmeans_ctes(_KMEANS_K, _KMEANS_ITER)},
    bench AS (
      SELECT vec_id, v FROM emb WHERE vec_id % 25 = 0
    ),
    corp AS (
      SELECT e.vec_id, e.v, f.cell
      FROM emb e JOIN final f USING (vec_id)
      WHERE e.vec_id % 25 <> 0
    ),
    probes AS (
      SELECT bv, cell FROM (
        SELECT b.v AS bv, c.cell,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY list_distance(b.v, c.c), c.cell
               ) AS rn
        FROM bench b CROSS JOIN c{_KMEANS_ITER} c
      ) WHERE rn <= 2
    ),
    hits AS (
      SELECT corp.vec_id,
             round(max(
               list_dot_product(corp.v, p.bv)
               / (sqrt(list_dot_product(corp.v, corp.v))
                  * sqrt(list_dot_product(p.bv, p.bv)))
             ), 4) AS max_bench_sim
      FROM corp JOIN probes p USING (cell)
      GROUP BY corp.vec_id
    )
    SELECT c0_.vec_id, h.max_bench_sim,
           coalesce(h.max_bench_sim >= 0.35, false) AS contaminated
    FROM (SELECT DISTINCT vec_id FROM corp) c0_
    LEFT JOIN hits h USING (vec_id)
    """
    want = run_oracle(oracle, sf_dir)
    compare_frames(got, want)
