"""Grouped robust median/MAD outlier flags (operators/robust.py):
python twin over random groups, planted-outlier separation, the
even/odd interpolating-median contract, zero-MAD and NULL contracts,
partitioning invariance, and plan lints."""

from __future__ import annotations

import random
import statistics

from mrt_data_integration_spark.operators.robust import (
    MAD_SIGMA,
    robust_outlier_flags,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, grp string, x double")


def _py_flags(rows, z_thresh=3.5):
    groups: dict[str, list[float]] = {}
    for _, g, x in rows:
        if g is not None and x is not None:
            groups.setdefault(g, []).append(x)
    stats = {}
    for g, xs in groups.items():
        med = statistics.median(xs)  # interpolating, same contract
        mad = statistics.median([abs(x - med) for x in xs])
        stats[g] = (med, mad)
    out = {}
    for i, g, x in rows:
        if g is None or x is None or g not in stats:
            out[i] = (g, x, None, None, None, False)
            continue
        med, mad = stats[g]
        z = round((x - med) / (MAD_SIGMA * mad), 4) if mad > 0 else None
        out[i] = (g, x, med, mad, z, bool(z is not None and abs(z) > z_thresh))
    return out


def test_robust_flags_match_python_twin(spark):
    rng = random.Random(20260828)
    rows = [
        (i, f"g{rng.randint(0, 4)}", float(rng.randint(50, 150)))
        for i in range(300)
    ]
    # planted contamination the detector must flag AND survive
    rows += [(1000 + j, "g0", 5000.0 + j) for j in range(3)]
    rows += [(2000, None, 10.0), (2001, "g1", None)]
    got = {
        r.doc_id: (r.grp, r.x, r.med, r.mad, r.robust_z, r.is_outlier)
        for r in robust_outlier_flags(
            _frame(spark, rows), "x", "grp"
        ).collect()
    }
    want = _py_flags(rows)
    assert got == want
    # the planted points are flagged; the bulk is not
    assert all(got[1000 + j][5] for j in range(3))
    flagged = [i for i, v in got.items() if v[5]]
    assert len(flagged) <= 6  # 3 planted + at most a few tail points


def test_robust_median_interpolates_even_groups(spark):
    rows = [
        (1, "e", 1.0), (2, "e", 2.0), (3, "e", 9.0), (4, "e", 10.0),
        (5, "o", 1.0), (6, "o", 2.0), (7, "o", 50.0),
    ]
    got = {
        r.doc_id: (r.med, r.mad)
        for r in robust_outlier_flags(
            _frame(spark, rows), "x", "grp"
        ).collect()
    }
    # even group: med = (2+9)/2 = 5.5; devs {4.5, 3.5, 3.5, 4.5} -> mad 4.0
    assert got[1] == (5.5, 4.0)
    # odd group: med = 2; devs {1, 0, 48} -> mad 1.0
    assert got[5] == (2.0, 1.0)


def test_robust_zero_mad_is_honest_null(spark):
    """A group with over half its mass on one value has MAD 0 — every
    member gets NULL robust_z and is_outlier=false, never ±inf, even
    the value that differs."""
    rows = [(i, "c", 7.0) for i in range(10)] + [(99, "c", 1000.0)]
    got = {
        r.doc_id: (r.mad, r.robust_z, r.is_outlier)
        for r in robust_outlier_flags(
            _frame(spark, rows), "x", "grp"
        ).collect()
    }
    assert all(v == (0.0, None, False) for v in got.values())


def test_robust_survives_what_stddev_does_not(spark):
    """The family's raison d'être: one extreme point inflates the
    classical z denominator enough to hide itself; the MAD denominator
    does not move."""
    rows = [(i, "g", float(100 + (i % 7))) for i in range(60)]
    rows.append((999, "g", 1e7))
    out = {
        r.doc_id: r
        for r in robust_outlier_flags(
            _frame(spark, rows), "x", "grp"
        ).collect()
    }
    assert out[999].is_outlier
    # classical z of the same point (computed here for contrast): the
    # outlier drags the mean/sd so hard its own z stays modest (~7.7 —
    # detectable, but a SECOND identical outlier pushes each other's
    # classical z toward sqrt(n/2) while robust z is unmoved)
    xs = [r.x for r in out.values()]
    mu = sum(xs) / len(xs)
    sd = (sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)) ** 0.5
    assert abs((1e7 - mu) / sd) < 10 < abs(out[999].robust_z)


def test_robust_partitioning_invariance_and_plan(spark):
    rng = random.Random(5)
    rows = [
        (i, f"g{i % 3}", float(rng.randint(0, 30))) for i in range(200)
    ]
    base = {
        tuple(r)
        for r in robust_outlier_flags(_frame(spark, rows), "x", "grp").collect()
    }
    for parts in (1, 13):
        got = {
            tuple(r)
            for r in robust_outlier_flags(
                _frame(spark, rows).repartition(parts), "x", "grp"
            ).collect()
        }
        assert got == base
    plan = (
        robust_outlier_flags(_frame(spark, rows), "x", "grp")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
