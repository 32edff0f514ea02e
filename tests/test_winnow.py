"""Winnowing fingerprints (operators/winnow.py): python twin, the
w+k-1 selection guarantee, density bound, short-doc edges, pair
candidates, partitioning invariance, map-only plan."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.winnow import (
    winnow_candidate_pairs,
    winnow_fingerprints,
    winnow_profile,
)

_POS_BASE = 1 << 31


def _py_winnow(text: str, k: int, w: int):
    """Pure-python replay: k-gram md5-prefix hashes, window minima on
    h*2^31+pos (leftmost tie-break), distinct selections."""
    toks = text.split(" ")
    grams = [
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    ]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) * _POS_BASE + i
        for i, g in enumerate(grams)
    ]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_matches_python_twin(spark):
    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(50)
    ]
    df = _docs(spark, rows)
    got = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp_hash * _POS_BASE + r.pos)
    want = {
        i: _py_winnow(t, 3, 4) for i, t in rows if _py_winnow(t, 3, 4)
    }
    assert got == want


def test_selection_guarantee_shared_run(spark):
    """THE winnowing guarantee (Schleimer 2003 §4): two documents
    sharing a common token run of length >= w + k - 1 (here 4+3-1=6)
    must share at least one selected fingerprint — for ANY
    surroundings, so fuzz the flanks."""
    rng = random.Random(7)
    vocab = [f"u{i}" for i in range(50)]
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    for trial in range(5):
        flank = lambda n: " ".join(  # noqa: E731
            rng.choice(vocab) for _ in range(n)
        )
        d0 = f"{flank(rng.randint(0, 12))} {shared} {flank(rng.randint(0, 12))}".strip()
        d1 = f"{flank(rng.randint(0, 12))} {shared} {flank(rng.randint(0, 12))}".strip()
        df = _docs(spark, [(0, d0), (1, d1)])
        pairs = winnow_candidate_pairs(df, k=3, w=4).collect()
        assert len(pairs) == 1 and pairs[0].n_shared >= 1, (
            trial,
            d0,
            d1,
        )


def test_profile_density_and_edges(spark):
    """Density tracks the 2/(w+1) expectation on random text; docs
    shorter than w grams yield exactly one fingerprint; docs with no
    gram (under k tokens) still profile with n_fps=0."""
    rng = random.Random(3)
    vocab = [f"v{i}" for i in range(400)]
    long_text = " ".join(rng.choice(vocab) for _ in range(4000))
    df = _docs(
        spark,
        [(0, long_text), (1, "a b c d"), (2, "just two")],
    )
    rows = {r.doc_id: r for r in winnow_profile(df, k=3, w=4).collect()}
    # 0: random long text — density within 2x of 2/(w+1)=0.4
    assert 0.2 <= rows[0].density <= 0.8
    assert rows[0].n_fps == rows[0].density * (rows[0].n_grams - 3)
    # 1: 4 tokens -> 2 grams < w -> single whole-doc minimum
    assert rows[1].n_grams == 2 and rows[1].n_fps == 1
    assert rows[1].density == 1.0
    # 2: under k tokens -> no grams, empty selection
    assert rows[2].n_grams == 0 and rows[2].n_fps == 0
    assert rows[2].density is None and rows[2].min_fp is None


def test_hot_fingerprint_cap_prunes(spark):
    """A fingerprint present in every document (boilerplate) must be
    droppable by max_fp_df before the self-join — with the cap at
    n_docs the pair count collapses to the genuinely-shared tail."""
    boiler = "one two three four five six seven eight"
    rows = [(i, f"{boiler} tail{i} t{i} u{i}") for i in range(10)]
    df = _docs(spark, rows)
    uncapped = winnow_candidate_pairs(df, k=3, w=4, max_fp_df=None)
    capped = winnow_candidate_pairs(df, k=3, w=4, max_fp_df=5)
    assert uncapped.count() == 45  # all pairs share the boilerplate
    assert capped.count() == 0


def test_winnow_partitioning_invariance_and_plan(spark):
    rng = random.Random(9)
    vocab = [f"p{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(40)
    ]
    df = _docs(spark, rows)
    a = sorted(map(tuple, winnow_fingerprints(df).collect()))
    b = sorted(
        map(tuple, winnow_fingerprints(df.repartition(11)).collect())
    )
    assert a == b
    prof = winnow_profile(df)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan, "the profile must be a pure map"


def test_contamination_guarantee_and_twin(spark):
    """Cross-frame guarantee: a corpus doc sharing a >= w+k-1-token
    run with a benchmark doc must surface; full python twin over
    random frames; broadcast flag is plan-only."""
    from mrt_data_integration_spark.operators.winnow import (
        winnow_contamination,
    )

    rng = random.Random(42)
    vocab = [f"c{i}" for i in range(60)]
    leak = "m0 m1 m2 m3 m4 m5"  # 6 tokens = w+k-1
    corpus_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(30)
    ]
    corpus_rows[7] = (7, corpus_rows[7][1] + " " + leak)
    bench_rows = [
        (100 + j, " ".join(rng.choice(vocab) for _ in range(12)))
        for j in range(5)
    ]
    bench_rows[2] = (102, leak + " " + bench_rows[2][1])
    corpus = _docs(spark, corpus_rows)
    bench = _docs(spark, bench_rows)
    got = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in winnow_contamination(corpus, bench, k=3, w=4).collect()
    }
    assert (7, 102) in got, "the planted >= w+k-1 leak must surface"

    def fps(t):
        return {h // _POS_BASE for h in _py_winnow(t, 3, 4)}

    want = {}
    for ci, ct in corpus_rows:
        for bi, bt in bench_rows:
            n = len(fps(ct) & fps(bt))
            if n >= 1:
                want[(ci, bi)] = n
    assert got == want
    unhinted = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in winnow_contamination(
            corpus, bench, k=3, w=4, broadcast_benchmark=False
        ).collect()
    }
    assert unhinted == got


def test_contamination_min_shared_filter(spark):
    from mrt_data_integration_spark.operators.winnow import (
        winnow_contamination,
    )

    corpus = _docs(spark, [(0, "a b c d e f g h i j")])
    bench = _docs(spark, [(100, "a b c d e f g h i j")])
    all_pairs = winnow_contamination(corpus, bench).collect()
    assert len(all_pairs) == 1 and all_pairs[0].n_shared >= 2
    strict = winnow_contamination(
        corpus, bench, min_shared=all_pairs[0].n_shared + 1
    ).collect()
    assert strict == []
