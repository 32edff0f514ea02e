"""Bucketed range join: exactness vs the naive non-equi join, boundary
semantics, granularity invariance, and the plan claim (no
BroadcastNestedLoopJoin)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.rangejoin import range_join

BASE = dt.datetime(2024, 1, 1)


def _points(spark, minutes):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(minutes=m)) for i, m in enumerate(minutes)],
        ["point_id", "ts"],
    )


def _intervals(spark, spans):
    return spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(minutes=a), BASE + dt.timedelta(minutes=b))
            for i, (a, b) in enumerate(spans)
        ],
        ["iv_id", "start", "end"],
    )


def test_matches_naive_join(spark):
    # pseudo-random but deterministic layout, intervals overlap freely
    pts = _points(spark, [(i * 37) % 500 for i in range(80)])
    ivs = _intervals(spark, [((i * 53) % 400, (i * 53) % 400 + 30 + i) for i in range(12)])
    got = {
        (r["point_id"], r["iv_id"])
        for r in range_join(pts, ivs, granularity_s=600).collect()
    }
    naive = {
        (r["point_id"], r["iv_id"])
        for r in pts.join(
            ivs, (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
        ).collect()
    }
    assert got == naive and got  # equal and non-empty


def test_half_open_boundaries(spark):
    pts = _points(spark, [0, 10, 20])  # at start, inside, at end
    ivs = _intervals(spark, [(0, 20)])
    got = {r["point_id"] for r in range_join(pts, ivs, granularity_s=60).collect()}
    assert got == {0, 1}  # start inclusive, end exclusive


def test_granularity_invariance(spark):
    pts = _points(spark, [(i * 13) % 300 for i in range(50)])
    ivs = _intervals(spark, [(0, 45), (40, 120), (200, 201), (290, 310)])
    results = [
        sorted(
            (r["point_id"], r["iv_id"])
            for r in range_join(pts, ivs, granularity_s=g).collect()
        )
        for g in (30, 600, 86400)
    ]
    assert results[0] == results[1] == results[2]


def test_plan_has_no_nested_loop(spark):
    pts = _points(spark, [0, 10])
    ivs = _intervals(spark, [(0, 20)])
    plan = (
        range_join(pts, ivs, granularity_s=60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole point: the non-equi predicate must ride on a bucket
    # equi-join, not a nested-loop scan of every (point, interval) pair
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_empty_sides(spark):
    pts = _points(spark, [0, 10])
    ivs = _intervals(spark, [(0, 20)])
    no_pts = pts.filter("point_id < 0")
    no_ivs = ivs.filter("iv_id < 0")
    assert range_join(no_pts, ivs).count() == 0
    assert range_join(pts, no_ivs).count() == 0
    # left join keeps every point exactly once when nothing matches
    left = range_join(pts, no_ivs, how="left")
    assert left.count() == 2
    assert left.filter("iv_id IS NULL").count() == 2


def test_range_join_rejects_interval_side_outer(spark):
    """right/full outer would duplicate unmatched intervals once per
    exploded bucket row — refuse rather than silently duplicate."""
    import pytest

    pts = spark.createDataFrame([(1,)], "ts long").selectExpr(
        "timestamp_micros(ts) AS ts"
    )
    iv = spark.createDataFrame([(0, 10)], "s long, e long").selectExpr(
        "timestamp_micros(s) AS start", "timestamp_micros(e) AS end"
    )
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="unsupported"):
            range_join(pts, iv, how=how)
