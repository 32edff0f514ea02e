"""Sketch operators: exact heavy hitters, HLL merge exactness, and
approx-profile error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators import sketches as sk
from mrt_data_integration_spark.sources import load_table


def test_heavy_hitters_exact_counts(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    got = {
        (r["event_type"], r["user_id"]): (r["cnt"], r["share"])
        for r in sk.heavy_hitters(ev, ["event_type", "user_id"], 0.0).collect()
    }
    rows = ev.groupBy("event_type", "user_id").count().collect()
    total = sum(r["count"] for r in rows)
    for r in rows:
        cnt, share = got[(r["event_type"], r["user_id"])]
        assert cnt == r["count"]
        assert share == round(r["count"] / total, 6)


def test_heavy_hitters_threshold_monotone(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    n_all = sk.heavy_hitters(ev, ["event_type"], 0.0).count()
    n_high = sk.heavy_hitters(ev, ["event_type"], 0.5).count()
    assert n_high <= n_all
    # every kept row really clears the bar
    for r in sk.heavy_hitters(ev, ["event_type"], 0.15).collect():
        assert r["share"] >= 0.15


def test_heavy_hitters_uniform_multiple(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    rows = sk.heavy_hitters(
        ev, ["event_type", "user_id"], uniform_multiple=1.5
    ).collect()
    counts = ev.groupBy("event_type", "user_id").count().collect()
    total = sum(r["count"] for r in counts)
    nk = len(counts)
    expected = {
        (r["event_type"], r["user_id"])
        for r in counts
        if r["count"] / total >= 1.5 / nk
    }
    assert {(r["event_type"], r["user_id"]) for r in rows} == expected
    assert 0 < len(expected) < nk  # non-trivial at smoke scale


def test_heavy_hitters_weighted(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 30.0), ("b", 60.0)], ["k", "w"]
    )
    rows = {r["k"]: r for r in sk.heavy_hitters(df, ["k"], 0.0, "w").collect()}
    assert rows["a"]["cnt"] == 40.0 and rows["a"]["share"] == 0.4
    assert rows["b"]["cnt"] == 60.0 and rows["b"]["share"] == 0.6


def test_hll_merged_equals_direct(spark, sf_smoke):
    """The load-bearing property: union of per-bucket sketches must give
    the SAME estimate as one sketch over all rows — otherwise
    incremental daily sketches would drift from a full recount."""
    ev = load_table(spark, sf_smoke, "events")
    _, rolled = sk.hll_rollup(
        ev, F.date_trunc("day", F.col("ts")), "user_id",
        group_cols=["event_type"],
    )
    merged = {
        r["event_type"]: r["distinct_est"] for r in rolled.collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct


def test_hll_error_bound(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    _, rolled = sk.hll_rollup(ev, F.lit(0), "user_id")
    est = rolled.collect()[0]["distinct_est"]
    exact = ev.select("user_id").distinct().count()
    # lg_k=12 → ~2.5% rsd; allow 4 sigma
    assert abs(est - exact) / exact < 0.10


def test_approx_profile_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = sk.approx_profile(
        li, ["l_returnflag"], "l_orderkey", "l_extendedprice"
    ).collect()
    assert len(rows) == 3
    for r in rows:
        # HLL++ default rsd 5%; allow 4 sigma
        assert abs(r["distinct_approx"] - r["distinct_exact"]) <= 0.2 * r["distinct_exact"]
        for qa, qe in zip(r["quantiles_approx"], r["quantiles_exact"]):
            # GK at accuracy=10000 on ~20k rows: rank error ≤ ~2 rows;
            # translate to a loose value tolerance of 1% of the range
            assert abs(qa - qe) <= 0.01 * (1 + abs(qe))


def test_sketch_results_stable_across_partitionings(spark, sf_smoke):
    """HLL registers merge by slot-max (commutative/associative), so the
    estimate must not depend on how the data is split."""
    ev = load_table(spark, sf_smoke, "events")
    def est(df):
        return df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
        ).collect()[0][0]
    assert est(ev) == est(ev.repartition(17, "event_type")) == est(ev.coalesce(1))


def test_rollup_state_merge_equals_direct_with_parquet_roundtrip(
    spark, sf_smoke, tmp_path
):
    """The incremental-ETL claim end-to-end: state(batch1) persisted to
    parquet (binary sketch column included), read back, merged with
    state(batch2) — counts, sums AND the HLL estimate must equal the
    single-pass rollup over all rows."""
    ev = load_table(spark, sf_smoke, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    s1 = sk.rollup_state(ev.filter(F.col("ts") < cut), ["event_type"], "value", "user_id")
    s2 = sk.rollup_state(ev.filter(F.col("ts") >= cut), ["event_type"], "value", "user_id")
    path = str(tmp_path / "state1")
    s1.write.parquet(path)
    s1_back = spark.read.parquet(path)
    merged = sk.finalize_rollup(sk.merge_rollup_states(s1_back, s2))
    direct = sk.finalize_rollup(
        sk.rollup_state(ev, ["event_type"], "value", "user_id")
    )
    m = {r["event_type"]: (r["n_rows"], round(r["sum_value"], 6), r["distinct_est"])
         for r in merged.collect()}
    d = {r["event_type"]: (r["n_rows"], round(r["sum_value"], 6), r["distinct_est"])
         for r in direct.collect()}
    assert m == d and len(m) == 5


def test_rollup_merge_any_tree_shape(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    thirds = [
        ev.filter(F.dayofmonth("ts") % 3 == i) for i in range(3)
    ]
    states = [
        sk.rollup_state(t, ["event_type"], "value", "user_id") for t in thirds
    ]
    flat = sk.finalize_rollup(sk.merge_rollup_states(*states))
    nested = sk.finalize_rollup(
        sk.merge_rollup_states(sk.merge_rollup_states(states[2], states[0]), states[1])
    )
    f = sorted(map(tuple, flat.select("event_type", "n_rows", "distinct_est").collect()))
    n = sorted(map(tuple, nested.select("event_type", "n_rows", "distinct_est").collect()))
    assert f == n


def test_heavy_hitters_zero_total_weight(spark):
    df = spark.createDataFrame([("a", 0.0), ("b", 0.0)], ["k", "w"])
    # all-zero weights → undefined shares → no heavy hitters, no error
    assert sk.heavy_hitters(df, ["k"], 0.1, "w").collect() == []
