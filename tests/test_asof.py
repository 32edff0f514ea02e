"""As-of join (operators/asof.py): python twin for both directions,
inclusive-equality ties, tolerance nulling (the pandas merge_asof
contract), unmatched rows, and the single-shuffle plan shape."""

from __future__ import annotations

import random

from mrt_data_integration_spark.operators.asof import asof_join


def _frames(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, "lid long, k long, t long")
    right = spark.createDataFrame(rrows, "k long, rt long, v long")
    return left, right


def _py_asof(lrows, rrows, direction, tolerance=None):
    out = {}
    for lid, k, t in lrows:
        if direction == "backward":
            cand = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= t]
            match = max(cand) if cand else None
        else:
            cand = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt >= t]
            match = min(cand) if cand else None
        v = match[1] if match else None
        if (
            match is not None
            and tolerance is not None
            and abs(t - match[0]) > tolerance
        ):
            v = None
        out[lid] = v
    return out


def _run(spark, lrows, rrows, **kw):
    left, right = _frames(spark, lrows, rrows)
    return {
        r.lid: r.v
        for r in asof_join(
            left, right, "k", "k", "t", "rt", ["v"], **kw
        ).collect()
    }


def test_asof_matches_python_twin_both_directions(spark):
    rng = random.Random(20260821)
    lrows = [
        (i, rng.randint(0, 4), rng.randint(0, 100)) for i in range(120)
    ]
    rrows = list(
        {
            (k, rt): (k, rt, rt * 10 + k)
            for k, rt in (
                (rng.randint(0, 4), rng.randint(0, 100))
                for _ in range(200)
            )
        }.values()
    )
    for direction in ("backward", "forward"):
        got = _run(spark, lrows, rrows, direction=direction)
        assert got == _py_asof(lrows, rrows, direction), direction


def test_asof_equality_is_inclusive_both_directions(spark):
    lrows = [(1, 7, 50)]
    rrows = [(7, 50, 99)]
    assert _run(spark, lrows, rrows, direction="backward") == {1: 99}
    assert _run(spark, lrows, rrows, direction="forward") == {1: 99}


def test_asof_tolerance_nulls_far_matches(spark):
    lrows = [(1, 7, 50), (2, 7, 90)]
    rrows = [(7, 40, 11)]
    # backward: both match rt=40; gaps 10 and 50 — tolerance 20 keeps
    # only the near one, the far row stays with a NULL payload
    got = _run(
        spark, lrows, rrows, direction="backward", tolerance=20
    )
    assert got == {1: 11, 2: None}
    # forward from t=50/90 with only rt=40: no candidates at all
    assert _run(spark, lrows, rrows, direction="forward") == {
        1: None, 2: None,
    }


def test_asof_rejects_bad_direction(spark):
    import pytest

    left, right = _frames(spark, [(1, 1, 1)], [(1, 1, 1)])
    with pytest.raises(ValueError, match="backward|forward|nearest"):
        asof_join(left, right, "k", "k", "t", "rt", ["v"], direction="sideways")


def test_asof_single_shuffle_plan(spark):
    rng = random.Random(2)
    lrows = [(i, i % 5, rng.randint(0, 50)) for i in range(100)]
    rrows = [(k, t, t) for k in range(5) for t in range(0, 50, 7)]
    left, right = _frames(spark, lrows, rrows)
    out = asof_join(left, right, "k", "k", "t", "rt", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan, "the union+window form must not join at all"
    assert plan.count("Exchange hashpartitioning") == 1, (
        "ONE key-partitioned shuffle of |L|+|R| rows is the whole cost"
    )


def test_asof_null_time_keys_never_match(spark):
    """NULL time keys never match in EITHER direction (the r13 ADVICE
    asymmetry: forward's bare desc put NULLs last, so a NULL-time left
    row silently matched the smallest right_time). Left NULL-time rows
    are kept with NULL payload; right NULL-time rows feed nobody."""
    lrows = [(1, 1, 10), (2, 1, None), (3, 1, 40)]
    rrows = [(1, None, 999), (1, 20, 20), (1, 35, 35)]
    left = spark.createDataFrame(lrows, "lid long, k long, t long")
    right = spark.createDataFrame(rrows, "k long, rt long, v long")
    for direction, want in (
        ("backward", {1: None, 2: None, 3: 35}),
        ("forward", {1: 20, 2: None, 3: None}),
    ):
        got = {
            r.lid: r.v
            for r in asof_join(
                left, right, "k", "k", "t", "rt", ["v"], direction=direction
            ).collect()
        }
        assert got == want, f"direction={direction}"
    # with tolerance the NULL-time left row must also stay unmatched
    got = {
        r.lid: r.v
        for r in asof_join(
            left, right, "k", "k", "t", "rt", ["v"],
            direction="forward", tolerance=100,
        ).collect()
    }
    assert got == {1: 20, 2: None, 3: None}


def _pd_asof(lrows, rrows, direction, tolerance=None):
    import pandas as pd

    lf = (
        pd.DataFrame(lrows, columns=["lid", "k", "t"])
        .dropna(subset=["t"])
        .astype({"t": "int64", "k": "int64"})
        .sort_values("t")
    )
    rf = (
        pd.DataFrame(rrows, columns=["k", "rt", "v"])
        .dropna(subset=["rt"])
        .astype({"rt": "int64", "k": "int64"})
        .sort_values("rt")
    )
    merged = pd.merge_asof(
        lf, rf, left_on="t", right_on="rt", by="k",
        direction=direction, tolerance=tolerance,
    )
    out = {int(r.lid): (None if pd.isna(r.v) else int(r.v))
           for r in merged.itertuples()}
    # NULL-time left rows: kept with NULL payload (our contract;
    # pandas rejects NaN keys outright, so add them back here)
    for lid, _, t in lrows:
        if t is None:
            out[lid] = None
    return out


def test_asof_nearest_matches_pandas(spark):
    """direction='nearest' is pinned against pandas merge_asof itself
    (closest |gap|, ties backward, tolerance nulling) over randomized
    multi-key frames with duplicates and NULL times."""
    rng = random.Random(20260831)
    for trial in range(3):
        lrows = [
            (i, rng.randint(0, 3), rng.randint(0, 100)) for i in range(120)
        ] + [(900, 0, None)]
        rrows = [
            (k, rng.randint(0, 100), rng.randint(1, 10**6))
            for k in range(4)
            for _ in range(rng.randint(0, 15))
        ]
        # unique (k, rt): ties on the time key would make the match
        # arbitrary on both engines (the documented caller contract)
        seen, dedup = set(), []
        for k, rt, v in rrows:
            if (k, rt) not in seen:
                seen.add((k, rt))
                dedup.append((k, rt, v))
        rrows = dedup
        for tol in (None, 7):
            got = _run(
                spark, lrows, rrows, direction="nearest", tolerance=tol
            )
            want = _pd_asof(lrows, rrows, "nearest", tolerance=tol)
            assert got == want, f"trial={trial} tol={tol}"


def test_asof_backward_forward_match_pandas(spark):
    """The existing directions hold against pandas merge_asof too —
    the same randomized frames as the nearest pin."""
    rng = random.Random(20260901)
    lrows = [(i, rng.randint(0, 2), rng.randint(0, 60)) for i in range(80)]
    rrows = []
    seen = set()
    for k in range(3):
        for _ in range(12):
            rt = rng.randint(0, 60)
            if (k, rt) not in seen:
                seen.add((k, rt))
                rrows.append((k, rt, rng.randint(1, 10**6)))
    for direction in ("backward", "forward"):
        for tol in (None, 5):
            got = _run(
                spark, lrows, rrows, direction=direction, tolerance=tol
            )
            want = _pd_asof(lrows, rrows, direction, tolerance=tol)
            assert got == want, f"{direction} tol={tol}"


def test_asof_nearest_tie_goes_backward_and_single_shuffle(spark):
    lrows = [(1, 1, 10)]
    rrows = [(1, 7, 777), (1, 13, 333)]  # equal |gap| = 3
    assert _run(spark, lrows, rrows, direction="nearest") == {1: 777}
    # NULL-time left row matches nothing even in nearest mode
    assert _run(
        spark, [(1, 1, None)], rrows, direction="nearest"
    ) == {1: None}
    left, right = _frames(
        spark, [(i, i % 3, i) for i in range(50)],
        [(k, t, t) for k in range(3) for t in range(0, 50, 5)],
    )
    out = asof_join(left, right, "k", "k", "t", "rt", ["v"], direction="nearest")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, (
        "nearest shares ONE key shuffle between its two sort orders"
    )
