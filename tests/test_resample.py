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
