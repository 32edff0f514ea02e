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
