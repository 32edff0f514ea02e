"""Gap-fill/resample operator (operators/resample.py): grid shape,
LOCF semantics, linear interpolation arithmetic, edge extrapolation."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.resample import resample_series


def _h(hh):
    return datetime(2024, 3, 1, hh)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, v double")


def test_locf_fills_holes_and_grid_is_complete(spark):
    df = _df(
        spark,
        [
            (1, _h(0), 10.0),
            (1, _h(3), 40.0),  # holes at 1, 2
            (2, _h(5), 7.0),  # single point → single-bucket grid
        ],
    )
    out = resample_series(df, ["k"], "ts", "v", unit="hour", how="locf")
    got = {(r.k, r.bucket.hour): (r.value_filled, r.is_observed)
           for r in out.collect()}
    assert got == {
        (1, 0): (10.0, True),
        (1, 1): (10.0, False),
        (1, 2): (10.0, False),
        (1, 3): (40.0, True),
        (2, 5): (7.0, True),
    }


def test_linear_interpolation_and_edges(spark):
    df = _df(
        spark,
        [
            (1, _h(0), 10.0),
            (1, _h(4), 50.0),  # holes 1-3 interpolate 20/30/40
            (1, _h(6), 50.0),
        ],
    )
    out = resample_series(df, ["k"], "ts", "v", unit="hour", how="linear")
    got = {r.bucket.hour: r.value_filled for r in out.collect()}
    assert got == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0, 4: 50.0,
                   5: 50.0, 6: 50.0}


def test_duplicate_observations_aggregate_before_fill(spark):
    df = _df(spark, [(1, _h(2), 4.0), (1, datetime(2024, 3, 1, 2, 30), 6.0)])
    out = resample_series(df, ["k"], "ts", "v", unit="hour")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].value_filled == 5.0  # avg


def test_multi_key_isolation_and_day_unit(spark):
    df = _df(
        spark,
        [
            (1, datetime(2024, 3, 1), 1.0),
            (1, datetime(2024, 3, 4), 4.0),
            (2, datetime(2024, 3, 2), 9.0),
        ],
    )
    out = resample_series(df, ["k"], "ts", "v", unit="day", how="linear")
    got = {(r.k, r.bucket.day): r.value_filled for r in out.collect()}
    assert got == {(1, 1): 1.0, (1, 2): 2.0, (1, 3): 3.0, (1, 4): 4.0,
                   (2, 2): 9.0}


def test_validates_args(spark):
    df = _df(spark, [(1, _h(0), 1.0)])
    with pytest.raises(ValueError, match="unit"):
        resample_series(df, ["k"], "ts", "v", unit="fortnight")
    with pytest.raises(ValueError, match="how"):
        resample_series(df, ["k"], "ts", "v", how="spline")


def test_single_shuffle_for_fill_windows(spark):
    """Both fill windows share one (key, bucket) sort — the plan must
    contain exactly one exchange keyed by k beyond the grid/obs join
    machinery, not one per window."""
    df = _df(spark, [(1, _h(0), 1.0), (1, _h(5), 2.0)])
    out = resample_series(df, ["k"], "ts", "v", how="linear")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 2  # one spec per frame direction


def test_randomized_python_twin(spark):
    """Seeded fuzz vs a pure-python twin: random sparse per-key hourly
    series (duplicate observations, runs of holes, single-point keys),
    both fill modes. The twin recomputes bucket-agg → grid → fill from
    first principles, including the _round_half_up arithmetic."""
    import datetime as dt
    import math
    import random

    from mrt_data_integration_spark.operators.resample import (
        resample_series,
    )

    rng = random.Random(20260815)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for key in range(8):
        n = rng.randint(1, 12)
        hours = sorted(rng.sample(range(40), n))
        for h in hours:
            for _ in range(rng.randint(1, 2)):  # duplicate observations
                rows.append(
                    (
                        key,
                        base + dt.timedelta(hours=h, minutes=rng.randint(0, 59)),
                        round(rng.uniform(-5, 5), 3),
                    )
                )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    def rhu(x, d):
        return math.floor(x * 10**d + 0.5) / 10**d

    def twin(how):
        from collections import defaultdict

        obs = defaultdict(dict)
        sums = defaultdict(lambda: defaultdict(list))
        for k, ts, v in rows:
            b = ts.replace(minute=0, second=0, microsecond=0)
            sums[k][b].append(v)
        for k, per in sums.items():
            for b, vs in per.items():
                obs[k][b] = rhu(sum(vs) / len(vs), 6)
        out = {}
        for k, per in obs.items():
            bs = sorted(per)
            lo, hi = bs[0], bs[-1]
            b = lo
            while b <= hi:
                if b in per:
                    val = per[b]
                elif how == "locf":
                    val = per[max(x for x in bs if x < b)]
                else:
                    prev = max(x for x in bs if x < b)
                    nxt = min(x for x in bs if x > b)
                    fracn = (b - prev).total_seconds() / (
                        nxt - prev
                    ).total_seconds()
                    pv, nv = per[prev], per[nxt]
                    val = pv + (nv - pv) * fracn
                out[(k, b)] = (rhu(val, 4), b in per)
                b += dt.timedelta(hours=1)
        return out

    for how in ("locf", "linear"):
        got = {
            (r.user_id, r.bucket): (r.value_filled, r.is_observed)
            for r in resample_series(
                df, ["user_id"], "ts", "value", unit="hour", how=how
            ).collect()
        }
        want = twin(how)
        assert got == want, (
            how,
            {k: (got.get(k), want.get(k)) for k in set(got) ^ set(want) or set(
                k for k in got if got[k] != want[k]
            )},
        )
