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


# ---------------------------------------------------------------------------
# heaps_growth (r14)


def _py_heaps(rows, k=16):
    """Python twin: checkpoint bounds, cumulative points, ordered fold."""
    rows = [(i, t) for i, t in rows if t is not None]
    ids = [i for i, _ in rows]
    lo, hi = min(ids), max(ids)
    cps = sorted({lo + math.floor(((hi - lo) * i + (k - 1)) / float(k))
                  for i in range(1, k + 1)})
    toks = {i: t.split(" ") for i, t in rows}
    first = {}
    for i in sorted(toks):
        for w in set(toks[i]):
            if w not in first or first[w] > i:
                first[w] = i
    pts = []
    for c in cps:
        n_docs = sum(1 for i in toks if i <= c)
        n_tok = sum(len(toks[i]) for i in toks if i <= c)
        vocab = sum(1 for w, fd in first.items() if fd <= c)
        pts.append((c, n_docs, n_tok, vocab))
    sx = sy = sxy = sxx = 0.0
    for c, _, n_tok, vocab in pts:  # checkpoint order
        x, y = math.log(float(n_tok)), math.log(float(vocab))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    n = float(len(pts))
    beta = kk = None
    if n >= 2 and (n * sxx - sx * sx) != 0:
        beta_raw = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        beta = round(beta_raw, 6)
        kk = round(math.exp((sy - beta_raw * sx) / n), 6)
    return {p[0]: p[1:] + (beta, kk) for p in pts}


def test_heaps_matches_python_twin(spark):
    from mrt_data_integration_spark.operators.lexstats import heaps_growth

    rng = random.Random(20260826)
    # open vocabulary so the curve actually grows
    rows = [
        (
            i * 7 + 3,  # non-contiguous ids: checkpoint math must not care
            " ".join(
                f"w{rng.randint(0, 50 + 5 * i)}"
                for _ in range(rng.randint(3, 30))
            ),
        )
        for i in range(60)
    ]
    got = {
        r.checkpoint: (
            r.n_docs_cum, r.n_tokens_cum, r.vocab_cum,
            r.heaps_beta, r.heaps_k,
        )
        for r in heaps_growth(_docs(spark, rows)).collect()
    }
    assert got == _py_heaps(rows)
    # and the fitted slope is genuinely sublinear-positive on growth
    beta = next(iter(got.values()))[3]
    assert 0.1 < beta < 1.0


def test_heaps_separates_growth_from_saturation(spark):
    from mrt_data_integration_spark.operators.lexstats import heaps_growth

    rng = random.Random(7)
    growing = [
        (i, " ".join(f"t{i}_{j}" for j in range(10))) for i in range(50)
    ]  # every doc all-new tokens: V = N exactly -> beta == 1
    flat = [
        (i, " ".join(rng.choice(["a", "b", "c"]) for _ in range(10)))
        for i in range(50)
    ]  # 3-type vocabulary saturates immediately -> beta ~ 0
    g = heaps_growth(_docs(spark, growing)).collect()
    f = heaps_growth(_docs(spark, flat)).collect()
    assert abs(g[0].heaps_beta - 1.0) < 1e-6
    assert abs(f[0].heaps_beta) < 0.05
    # cumulative columns are monotone in checkpoint order
    for res in (g, f):
        pts = sorted(res, key=lambda r: r.checkpoint)
        for a, b in zip(pts, pts[1:]):
            assert a.n_tokens_cum <= b.n_tokens_cum
            assert a.vocab_cum <= b.vocab_cum


def test_heaps_null_text_and_short_range_contracts(spark):
    from mrt_data_integration_spark.operators.lexstats import heaps_growth

    # NULL text excluded; two docs -> id range 1 -> deduped checkpoints
    rows = [(10, "a b c"), (11, "c d"), (12, None)]
    out = heaps_growth(_docs(spark, rows)).collect()
    cps = sorted(r.checkpoint for r in out)
    assert cps == [11]  # lo=10, hi=11: all 16 bounds collapse to 11
    r = out[0]
    assert (r.n_docs_cum, r.n_tokens_cum, r.vocab_cum) == (2, 5, 4)
    assert r.heaps_beta is None and r.heaps_k is None  # 1 point: no fit


def test_heaps_plan_and_partitioning_invariance(spark):
    from mrt_data_integration_spark.operators.lexstats import heaps_growth

    rng = random.Random(11)
    rows = [
        (i, " ".join(f"w{rng.randint(0, 200)}" for _ in range(12)))
        for i in range(80)
    ]
    base = {
        tuple(r) for r in heaps_growth(_docs(spark, rows)).collect()
    }
    for parts in (1, 7):
        got = {
            tuple(r)
            for r in heaps_growth(
                _docs(spark, rows).repartition(parts)
            ).collect()
        }
        assert got == base, f"partitioning changed the profile ({parts})"
    plan = (
        heaps_growth(_docs(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # no global-window cumulation: the plan must carry NO Window node —
    # cumulation is the bounded checkpoint fan-out by construction
    assert "Window" not in plan
