"""Token-diversity profile (operators/diversity.py): python twin,
degenerate distributions, NULL/empty contracts, partitioning
invariance, and the zero-shuffle map-only plan shape."""

from __future__ import annotations

import math
import random

from mrt_data_integration_spark.operators.diversity import (
    token_diversity_profile,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_profile(text):
    toks = text.split(" ")  # engine convention: split("") == [""]
    n = len(toks)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    # the engine folds c·ln c in SORTED token order
    slnc = 0.0
    for t in sorted(counts):
        c = counts[t]
        slnc += c * math.log(c)
    return (
        n,
        len(counts),
        round(len(counts) / n, 6),
        round(max(counts.values()) / n, 6),
        round(math.log(n) - slnc / n, 6),
        round(1.0 - sum(c * c for c in counts.values()) / (n * n), 6),
    )


def test_diversity_matches_python_twin(spark):
    rng = random.Random(20260818)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60))))
        for i in range(60)
    ]
    got = {
        r.doc_id: (
            r.n_tokens, r.n_types, r.ttr, r.top_frac, r.entropy, r.simpson
        )
        for r in token_diversity_profile(_docs(spark, rows)).collect()
    }
    for i, t in rows:
        want = _py_profile(t)
        for g, w in zip(got[i], want):
            assert abs(g - w) <= 1e-6, (i, got[i], want)


def test_diversity_degenerate_and_null_contracts(spark):
    rows = [
        (1, "x x x x x"),   # one type: everything degenerate
        (2, "a b c d e"),   # all distinct: max diversity
        (3, None),          # NULL text: excluded
        (4, ""),            # empty string: one empty token (convention)
    ]
    out = {
        r.doc_id: r
        for r in token_diversity_profile(_docs(spark, rows)).collect()
    }
    assert set(out) == {1, 2, 4}, "NULL text rows are excluded"
    assert out[1].entropy == 0.0 and out[1].simpson == 0.0
    assert out[1].ttr == 0.2 and out[1].top_frac == 1.0
    assert out[2].ttr == 1.0 and out[2].top_frac == 0.2
    assert out[2].entropy == round(math.log(5), 6)
    assert out[2].simpson == round(1 - 5 / 25, 6)
    assert out[4].n_tokens == 1 and out[4].entropy == 0.0


def test_diversity_orders_low_entropy_below_high(spark):
    """The signal the filter thresholds on: a generation loop scores
    strictly below natural-ish text of the same length."""
    loop = " ".join(["buy", "now"] * 25)
    natural = " ".join(f"tok{i % 37}" for i in range(50))
    out = {
        r.doc_id: r
        for r in token_diversity_profile(
            _docs(spark, [(1, loop), (2, natural)])
        ).collect()
    }
    assert out[1].entropy < out[2].entropy
    assert out[1].simpson < out[2].simpson
    assert out[1].top_frac > out[2].top_frac


def test_diversity_partitioning_invariance_and_plan(spark):
    rng = random.Random(9)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(100)
    ]
    df = _docs(spark, rows)
    run = lambda d: sorted(  # noqa: E731
        map(tuple, token_diversity_profile(d).collect())
    )
    assert run(df) == run(df.repartition(13))
    plan = (
        token_diversity_profile(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # a PURE MAP: zero exchanges — the winnow_profile class (a groupBy
    # formulation would both shuffle (doc, token) pairs and make the
    # float sum shuffle-fetch-order nondeterministic)
    assert "Exchange" not in plan, plan
