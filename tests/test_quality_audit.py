"""Declarative constraint audit (operators/quality_audit): planted
violations per constraint class, NULL contracts, empty-set vacuity,
single-scan compilation, schema stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators import quality_audit as qa


def _rows(df):
    return {r.check_name: r for r in df.collect()}


def test_row_checks_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 200.0), (5, 7.0)],
        "id long, qty double",
    )
    out = qa.row_checks(
        df,
        "t",
        [
            ("qty_in_0_100", (F.col("qty") < 0) | (F.col("qty") > 100)),
            ("qty_not_null", F.col("qty").isNull()),
        ],
    )
    got = _rows(out)
    # NULL predicate result counts as a violation (row 3 for the range
    # check: NULL qty -> NULL comparison -> conservative violation)
    assert got["qty_in_0_100"].n_violations == 3  # -5, NULL, 200
    assert got["qty_in_0_100"].n_rows == 5
    assert got["qty_in_0_100"].violation_rate == 0.6
    assert not got["qty_in_0_100"].passed
    assert got["qty_not_null"].n_violations == 1
    assert got["qty_not_null"].table_name == "t"


def test_row_checks_pass_and_empty_vacuity(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    out = _rows(qa.row_checks(df, "t", [("v_pos", F.col("v") <= 0)]))
    assert out["v_pos"].passed and out["v_pos"].n_violations == 0
    empty = df.filter(F.lit(False))
    got = _rows(qa.row_checks(empty, "t", [("v_pos", F.col("v") <= 0)]))
    assert got["v_pos"].n_rows == 0
    assert got["v_pos"].violation_rate is None  # honest-NULL rate
    assert got["v_pos"].passed  # vacuously satisfied


def test_uniqueness_counts_excess_rows(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (3,), (3,)], "k long"
    )
    got = _rows(qa.uniqueness_check(df, "t", "k_unique", ["k"]))["k_unique"]
    # one group of 3 (2 excess) + one group of 2 (1 excess)
    assert got.n_rows == 6 and got.n_violations == 3 and not got.passed
    ok = spark.createDataFrame([(1,), (2,)], "k long")
    got = _rows(qa.uniqueness_check(ok, "t", "k_unique", ["k"]))["k_unique"]
    assert got.passed and got.n_violations == 0


def test_referential_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    got = _rows(
        qa.referential_check(child, parent, "child", "fk_in_parent", ["fk"], ["pk"])
    )["fk_in_parent"]
    # orphan 99 + NULL fk (never matches) = 2 violations of 4 rows
    assert got.n_rows == 4 and got.n_violations == 2
    assert got.violation_rate == 0.5 and not got.passed


def test_referential_duplicate_parent_keys_do_not_fan_out(spark):
    """The parent side is deduplicated before the membership join —
    duplicate parent rows must not multiply child rows (the
    token_budget grain-corruption class)."""
    child = spark.createDataFrame([(1, 10), (2, 10)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (10,), (10,)], "pk long")
    got = _rows(
        qa.referential_check(child, parent, "c", "fk_ok", ["fk"], ["pk"])
    )["fk_ok"]
    assert got.n_rows == 2 and got.n_violations == 0 and got.passed


def test_join_violation_check(spark):
    left = spark.createDataFrame(
        [(1, 5), (1, 2), (2, 9), (3, 1)], "k long, lv long"
    )
    right = spark.createDataFrame([(1, 3), (2, 9), (4, 0)], "k long, rv long")
    got = _rows(
        qa.join_violation_check(
            left, right, [("k", "k")], "l_x_r", "lv_ge_rv",
            left["lv"] < right["rv"],
        )
    )["lv_ge_rv"]
    # joined rows: k=1 twice, k=2 once (k=3/4 unmatched); violations:
    # (1,2)<(1,3) only
    assert got.n_rows == 3 and got.n_violations == 1


def test_row_checks_is_single_scan(spark):
    """All row-level predicates compile into ONE scan of the table —
    the claim that separates this from metric-at-a-time auditing."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("a"), (F.col("id") % 3).alias("b")
    )
    out = qa.row_checks(
        df,
        "t",
        [
            ("a_small", F.col("a") > 5),
            ("b_small", F.col("b") > 1),
            ("id_pos", F.col("id") < 0),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan


def test_combine_audit_schema(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    a = qa.row_checks(df, "t1", [("c1", F.col("v") < 0)])
    b = qa.uniqueness_check(df, "t2", "c2", ["id"])
    out = qa.combine_audit(a, b)
    assert out.columns == list(qa._SCHEMA_COLS)
    assert out.count() == 2
