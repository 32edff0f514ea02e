"""Scale-operator tests: salting preserves results while sharding hot
keys; bucketed joins run exchange-free (plan-verified)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.scale import (
    bucketed_join,
    salted_group_sum,
    salted_skew_join,
    write_bucketed,
)
from mrt_data_integration_spark.sources import load_table


def test_salted_group_sum_matches_plain(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    plain = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in salted_group_sum(
            li,
            ["l_returnflag"],
            {"s": F.sum("l_quantity"), "n": F.count(F.lit(1))},
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-6
        assert plain[k][1] == salted[k][1]


def test_salted_skew_join_matches_plain(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_orderpriority")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    salted = (
        salted_skew_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, sf_smoke):
    # writes to the session's spark-warehouse dir (gitignored)
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_smoke, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "ord_b", "l_orderkey", n_buckets=8)
    joined = bucketed_join(spark, "li_b", "ord_b", "l_orderkey")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = joined._jdf.queryExecution().explainString(jmode)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    # and it actually computes
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")