"""Two-sample KS drift profile (operators/drift.py): python twin,
null-drift and planted-shift behavior, NULL/empty-side contracts,
partitioning invariance, and the bounded-window plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.drift import (
    ks_statistic,
    two_sample_ks_profile,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "v int, grp string")


def _py_profile(rows):
    a = sorted(v for v, g in rows if g == "a" and v is not None)
    b = sorted(v for v, g in rows if g != "a" and v is not None)
    values = sorted({v for v, _ in rows if v is not None})
    out = {}
    for v in values:
        na = sum(1 for x in a if x == v)
        nb = sum(1 for x in b if x == v)
        ca = (
            round(sum(1 for x in a if x <= v) / len(a), 6) if a else None
        )
        cb = (
            round(sum(1 for x in b if x <= v) / len(b), 6) if b else None
        )
        ks = (
            round(abs(ca - cb), 6)
            if ca is not None and cb is not None
            else None
        )
        out[v] = (na, nb, ca, cb, ks)
    return out


def test_ks_profile_matches_python_twin(spark):
    rng = random.Random(20260816)
    rows = [
        (rng.randint(0, 40), rng.choice(["a", "b"])) for _ in range(500)
    ] + [(None, "a")]
    df = _frame(spark, rows)
    got = {
        r.v: (r.n_a, r.n_b, r.cdf_a, r.cdf_b, r.ks_term)
        for r in two_sample_ks_profile(
            df, "v", F.col("grp") == "a"
        ).collect()
    }
    assert got == _py_profile(rows)


def test_null_drift_and_planted_shift(spark):
    """Identical distributions read KS == 0; a planted location shift
    reads a large KS with the gap located at the boundary."""
    base = [(i % 20, "a") for i in range(400)]
    null = base + [(i % 20, "b") for i in range(400)]
    assert ks_statistic(
        two_sample_ks_profile(_frame(spark, null), "v", F.col("grp") == "a")
    ) == 0.0
    shifted = base + [(i % 20 + 15, "b") for i in range(400)]
    prof = two_sample_ks_profile(
        _frame(spark, shifted), "v", F.col("grp") == "a"
    )
    ks = ks_statistic(prof)
    assert ks >= 0.7
    peak = prof.orderBy(F.col("ks_term").desc(), "v").first()
    assert 14 <= peak.v <= 15, "the gap must locate at the shift edge"


def test_empty_side_yields_null_cdfs(spark):
    df = _frame(spark, [(1, "a"), (2, "a")])
    rows = two_sample_ks_profile(
        df, "v", F.col("grp") == "a"
    ).collect()
    assert all(r.cdf_b is None and r.ks_term is None for r in rows)
    assert [r.cdf_a for r in sorted(rows, key=lambda r: r.v)] == [
        0.5,
        1.0,
    ]


def test_ks_partitioning_invariance_and_plan(spark):
    rng = random.Random(3)
    rows = [
        (rng.randint(0, 30), rng.choice(["a", "b"])) for _ in range(300)
    ]
    df = _frame(spark, rows)
    run = lambda d: sorted(  # noqa: E731
        map(
            tuple,
            two_sample_ks_profile(
                d, "v", F.col("grp") == "a"
            ).collect(),
        )
    )
    assert run(df) == run(df.repartition(13))
    plan = (
        two_sample_ks_profile(df, "v", F.col("grp") == "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # the value-grain collapse must feed the global window: plans
    # print top-down, so the Window node's SUBTREE (textually after
    # it) must contain the hash aggregate whose partial phase
    # collapses the corpus to the bounded value grain before the
    # single-partition sort
    assert "Window" in plan
    sub = plan[plan.index("Window"):]
    assert "HashAggregate" in sub, (
        "the window must consume the value-grain aggregate, not raw rows"
    )
    assert "partial_count" in plan, "value collapse must combine map-side"


def _py_cat_profile(rows):
    """rows: (cat, grp). Returns {cat: (n_a, n_b, fa, fb, psi, chi2)}."""
    import math

    cats = sorted({c for c, _ in rows if c is not None})
    ta = sum(1 for c, g in rows if c is not None and g == "a")
    tb = sum(1 for c, g in rows if c is not None and g != "a")
    out = {}
    for c in cats:
        na = sum(1 for x, g in rows if x == c and g == "a")
        nb = sum(1 for x, g in rows if x == c and g != "a")
        fa = round(na / ta, 6) if ta else None
        fb = round(nb / tb, 6) if tb else None
        psi = (
            round((na / ta - nb / tb) * math.log((na / ta) / (nb / tb)), 6)
            if na > 0 and nb > 0
            else None
        )
        if ta and tb:
            ea = (na + nb) * ta / (ta + tb)
            eb = (na + nb) * tb / (ta + tb)
            chi2 = round((na - ea) ** 2 / ea + (nb - eb) ** 2 / eb, 6)
        else:
            chi2 = None
        out[c] = (na, nb, fa, fb, psi, chi2)
    return out


def _cat_frame(spark, rows):
    return spark.createDataFrame(rows, "c string, grp string")


def test_category_drift_matches_python_twin(spark):
    from mrt_data_integration_spark.operators.drift import (
        category_drift_profile,
        psi_statistic,
    )

    rng = random.Random(20260816)
    cats = ["en", "de", "fr", "zh", "es", None]
    rows = [
        (rng.choice(cats), rng.choice(["a", "b"])) for _ in range(500)
    ]
    prof = category_drift_profile(
        _cat_frame(spark, rows), "c", F.col("grp") == "a"
    )
    got = {
        r.c: (r.n_a, r.n_b, r.frac_a, r.frac_b, r.psi_term, r.chi2_term)
        for r in prof.collect()
    }
    want = _py_cat_profile(rows)
    assert set(got) == set(want), "NULL categories must be excluded"
    for c in want:
        for g, w in zip(got[c], want[c]):
            assert (g is None) == (w is None)
            if g is not None:
                assert abs(g - w) <= 1e-6, (c, got[c], want[c])
    # the scalar: PSI sums the defined terms
    psi = psi_statistic(prof)
    want_psi = sum(v[4] for v in want.values() if v[4] is not None)
    assert abs(psi - want_psi) <= 1e-5


def test_category_drift_planted_shift_and_empty_cells(spark):
    """A category present in only one slice gets NULL psi_term but a
    real chi2_term; a planted shift concentrates the largest terms on
    the shifted category."""
    from mrt_data_integration_spark.operators.drift import (
        category_drift_profile,
    )

    rows = (
        [("en", "a")] * 80 + [("de", "a")] * 20
        + [("en", "b")] * 20 + [("de", "b")] * 60 + [("zh", "b")] * 20
    )
    prof = {
        r.c: r
        for r in category_drift_profile(
            _cat_frame(spark, rows), "c", F.col("grp") == "a"
        ).collect()
    }
    assert prof["zh"].psi_term is None  # empty A-cell: PSI undefined
    assert prof["zh"].chi2_term is not None and prof["zh"].chi2_term > 0
    assert prof["zh"].frac_a == 0.0  # defined: slice A is non-empty
    # the shifted mass dominates both statistics
    assert prof["de"].psi_term > prof["en"].psi_term * 0 and (
        max(p.psi_term for p in prof.values() if p.psi_term is not None)
        in (prof["en"].psi_term, prof["de"].psi_term)
    )


def test_category_drift_empty_side_contract(spark):
    from mrt_data_integration_spark.operators.drift import (
        category_drift_profile,
    )

    rows = [("en", "b")] * 5 + [("de", "b")] * 5
    prof = {
        r.c: r
        for r in category_drift_profile(
            _cat_frame(spark, rows), "c", F.col("grp") == "a"
        ).collect()
    }
    for r in prof.values():
        assert r.frac_a is None and r.psi_term is None
        assert r.chi2_term is None  # needs both totals positive
        assert r.frac_b is not None


def test_category_drift_partitioning_invariance_and_plan(spark):
    from mrt_data_integration_spark.operators.drift import (
        category_drift_profile,
    )

    rng = random.Random(7)
    rows = [
        (rng.choice(["x", "y", "z"]), rng.choice(["a", "b"]))
        for _ in range(400)
    ]
    df = _cat_frame(spark, rows)
    run = lambda d: sorted(  # noqa: E731
        map(
            tuple,
            category_drift_profile(
                d, "c", F.col("grp") == "a"
            ).collect(),
        )
    )
    assert run(df) == run(df.repartition(11))
    plan = (
        category_drift_profile(df, "c", F.col("grp") == "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan  # totals ride a broadcast
    # strictly cheaper than the KS profile: NO window anywhere —
    # the category grain needs no running sums
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# source_js_matrix (r14) — the all-pairs distributional form


def _src_frame(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def _py_js(rows, top_v=1000):
    import math
    from collections import Counter

    cnt: dict[str, Counter] = {}
    for _, src, t in rows:
        if t is None or src is None:
            continue
        cnt.setdefault(src, Counter()).update(t.split(" "))
    gcnt = Counter()
    for c in cnt.values():
        gcnt.update(c)
    top = {
        t
        for t, _ in sorted(gcnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :top_v
        ]
    }
    buck = {
        s: Counter(
            {(t if t in top else "__oov__"): 0 for t in c}
        )
        for s, c in cnt.items()
    }
    for s, c in cnt.items():
        b = Counter()
        for t, n in c.items():
            b[t if t in top else "__oov__"] += n
        buck[s] = b
    ln2 = round(math.log(2.0), 12)
    out = {}
    srcs = sorted(buck)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            ta, tb = sum(buck[a].values()), sum(buck[b].values())
            shared = sorted(set(buck[a]) & set(buck[b]))
            st = sa = sb = 0.0
            for k in shared:  # bucket order: the order-pinned fold
                pa, pb = buck[a][k] / ta, buck[b][k] / tb
                st += 0.5 * (
                    pa * round(math.log(2 * pa / (pa + pb)), 12)
                    + pb * round(math.log(2 * pb / (pa + pb)), 12)
                )
                sa += pa
                sb += pb
            js = round(
                st + 0.5 * (1 - sa) * ln2 + 0.5 * (1 - sb) * ln2, 6
            )
            out[(a, b)] = (len(shared), js)
    return out


def test_source_js_matches_python_twin(spark):
    from mrt_data_integration_spark.operators.drift import source_js_matrix

    rng = random.Random(20260902)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (
            i,
            f"s{rng.randint(0, 4)}",
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))),
        )
        for i in range(100)
    ] + [(900, None, "x y z"), (901, "s0", None)]
    got = {
        (r.source_a, r.source_b): (r.n_common, r.js)
        for r in source_js_matrix(_src_frame(spark, rows)).collect()
    }
    assert got == _py_js(rows)


def test_source_js_oov_bucket_and_bounds(spark):
    """A tiny top_v forces the OOV bucket; the python twin must still
    match exactly, and every js sits in [0, ln 2]."""
    from mrt_data_integration_spark.operators.drift import source_js_matrix

    rng = random.Random(9)
    rows = [
        (
            i,
            f"s{i % 4}",
            " ".join(f"t{rng.randint(0, 40)}" for _ in range(12)),
        )
        for i in range(60)
    ]
    got = {
        (r.source_a, r.source_b): (r.n_common, r.js)
        for r in source_js_matrix(
            _src_frame(spark, rows), top_v=5
        ).collect()
    }
    assert got == _py_js(rows, top_v=5)
    import math

    for _, js in got.values():
        assert -1e-9 <= js <= math.log(2.0) + 1e-9


def test_source_js_identical_zero_disjoint_ln2(spark):
    from mrt_data_integration_spark.operators.drift import source_js_matrix

    same = "a b c a b"
    rows = (
        [(i, "x", same) for i in range(10)]
        + [(100 + i, "y", same) for i in range(10)]
        + [(200 + i, "z", "q r s q") for i in range(10)]
    )
    got = {
        (r.source_a, r.source_b): (r.n_common, r.js)
        for r in source_js_matrix(_src_frame(spark, rows)).collect()
    }
    assert got[("x", "y")][1] == 0.0  # identical distributions
    assert got[("x", "z")] == (0, 0.693147)  # disjoint support: ln 2
    assert got[("y", "z")] == (0, 0.693147)
    # planted drift: same support, shifted rates -> strictly between
    rows2 = [(i, "p", "a a a b") for i in range(10)] + [
        (50 + i, "q", "a b b b") for i in range(10)
    ]
    got2 = {
        (r.source_a, r.source_b): r.js
        for r in source_js_matrix(_src_frame(spark, rows2)).collect()
    }
    assert 0.05 < got2[("p", "q")] < 0.5


def test_source_js_partitioning_invariance_and_plan(spark):
    from mrt_data_integration_spark.operators.drift import source_js_matrix

    rng = random.Random(11)
    rows = [
        (
            i,
            f"s{i % 5}",
            " ".join(f"w{rng.randint(0, 30)}" for _ in range(8)),
        )
        for i in range(120)
    ]
    base = {
        tuple(r)
        for r in source_js_matrix(_src_frame(spark, rows)).collect()
    }
    for parts in (1, 11):
        got = {
            tuple(r)
            for r in source_js_matrix(
                _src_frame(spark, rows).repartition(parts)
            ).collect()
        }
        assert got == base
    plan = (
        source_js_matrix(_src_frame(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
