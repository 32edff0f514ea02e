"""Corpus lexical statistics (operators/lexstats.py): python twin for
the Zipf slope / hapax / totals, tie determinism, degenerate-vocab
contracts, partitioning invariance, and the two-phase-topk plan."""

from __future__ import annotations

import math
import random

from mrt_data_integration_spark.operators.lexstats import zipf_profile


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_profile(texts, fit_n=1000, emit_n=20):
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    n_tokens = sum(counts.values())
    n_types = len(counts)
    hapax = round(
        sum(1 for c in counts.values() if c == 1) / n_types, 6
    )
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    top = ranked[:fit_n]
    sx = sy = sxy = sxx = 0.0
    for i, (_, c) in enumerate(top, start=1):
        x, y = math.log(float(i)), math.log(float(c))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    n = float(len(top))
    slope = (
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        if n >= 2
        else None
    )
    emit = {
        i: (tok, c) for i, (tok, c) in enumerate(top[:emit_n], start=1)
    }
    return emit, n_tokens, n_types, hapax, slope


def test_zipf_matches_python_twin(spark):
    rng = random.Random(20260820)
    # a Zipf-ish draw: token wN has weight 1/(N+1)
    vocab = [f"w{i}" for i in range(60)]
    weights = [1.0 / (i + 1) for i in range(60)]
    rows = [
        (
            i,
            " ".join(
                rng.choices(vocab, weights=weights, k=rng.randint(5, 50))
            ),
        )
        for i in range(80)
    ]
    got = {
        r.rank: r for r in zipf_profile(_docs(spark, rows)).collect()
    }
    emit, n_tokens, n_types, hapax, slope = _py_profile(
        [t for _, t in rows]
    )
    assert set(got) == set(emit)
    for rk, (tok, c) in emit.items():
        r = got[rk]
        assert (r.token, r.freq) == (tok, c)
        assert (r.n_tokens, r.n_types, r.hapax_frac) == (
            n_tokens, n_types, hapax,
        )
        assert abs(r.zipf_slope - slope) <= 1e-6


def test_zipf_tie_rank_is_token_ascending(spark):
    rows = [(1, "b b a a c")]
    got = {
        r.rank: (r.token, r.freq)
        for r in zipf_profile(_docs(spark, rows)).collect()
    }
    assert got == {1: ("a", 2), 2: ("b", 2), 3: ("c", 1)}


def test_zipf_degenerate_vocab_contracts(spark):
    # single type: slope undefined (one point), hapax 0
    out = zipf_profile(_docs(spark, [(1, "x x x")])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.rank, r.token, r.freq) == (1, "x", 3)
    assert r.n_types == 1 and r.hapax_frac == 0.0
    assert r.zipf_slope is None
    # NULL text excluded entirely
    assert zipf_profile(_docs(spark, [(1, None)])).collect() == []


def test_zipf_slope_separates_natural_from_flat(spark):
    rng = random.Random(6)
    vocab = [f"w{i}" for i in range(40)]
    zipfish = [
        (
            i,
            " ".join(
                rng.choices(
                    vocab,
                    weights=[1.0 / (j + 1) for j in range(40)],
                    k=40,
                )
            ),
        )
        for i in range(50)
    ]
    flat = [
        (i, " ".join(rng.choices(vocab, k=40))) for i in range(50)
    ]
    s_zipf = zipf_profile(_docs(spark, zipfish)).first().zipf_slope
    s_flat = zipf_profile(_docs(spark, flat)).first().zipf_slope
    assert s_zipf < s_flat < 0, (s_zipf, s_flat)


def test_zipf_partitioning_invariance_and_plan(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 30))))
        for i in range(120)
    ]
    df = _docs(spark, rows)
    run = lambda d: sorted(  # noqa: E731
        map(tuple, zipf_profile(d).collect())
    )
    assert run(df) == run(df.repartition(17))
    plan = (
        zipf_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the two-phase top-k: the local (key, pid) rank must precede the
    # global rank — i.e., at least two Window nodes, never one
    # vocabulary-wide single-reducer window
    assert plan.count("Window") >= 2
