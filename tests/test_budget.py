"""Token-budget corpus selection (operators/budget.py): python twin,
the ordered-prefix rule (monotone in budget, not a knapsack),
NULL-quality ordering, and the single-shuffle window plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.budget import (
    token_budget_select,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, grp string, q long, tok long"
    )


def _py_select(rows, budget):
    """rows: (id, grp, quality, tokens) -> {id: (rank, cum, selected)}."""
    out = {}
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r[1], []).append(r)
    for grp, members in by_grp.items():
        # quality DESC NULLS LAST, id ASC
        members.sort(key=lambda r: (r[2] is None, -(r[2] or 0), r[0]))
        cum = 0
        for rank, r in enumerate(members, start=1):
            cum += r[3]
            out[r[0]] = (rank, cum, cum <= budget)
    return out


def test_budget_select_matches_python_twin(spark):
    rng = random.Random(20260817)
    rows = [
        (
            i,
            rng.choice(["s0", "s1", "s2"]),
            rng.randint(0, 50),
            rng.randint(1, 40),
        )
        for i in range(200)
    ]
    got = {
        r.doc_id: (r.rank, r.cum_tokens, r.selected)
        for r in token_budget_select(
            _frame(spark, rows), 300, "grp", "q", "tok"
        ).collect()
    }
    assert got == _py_select(rows, 300)


def test_budget_select_is_monotone_prefix_not_knapsack(spark):
    """The prefix rule: the first overflowing doc cuts everything below
    it even if a smaller one would fit; raising the budget never drops
    a previously selected doc."""
    rows = [
        # quality order within grp g: 1 (q=9, tok=5), 2 (q=8, tok=10),
        # 3 (q=7, tok=2): budget 7 keeps only doc 1 — doc 3 (tok=2)
        # would fit but is cut by the prefix rule at doc 2.
        (1, "g", 9, 5),
        (2, "g", 8, 10),
        (3, "g", 7, 2),
    ]
    small = {
        r.doc_id: r.selected
        for r in token_budget_select(
            _frame(spark, rows), 7, "grp", "q", "tok"
        ).collect()
    }
    assert small == {1: True, 2: False, 3: False}
    for budget in (15, 17, 100):
        bigger = {
            r.doc_id: r.selected
            for r in token_budget_select(
                _frame(spark, rows), budget, "grp", "q", "tok"
            ).collect()
        }
        assert all(bigger[k] for k in small if small[k]), "monotone"


def test_budget_select_null_quality_ranks_last(spark):
    rows = [(1, "g", None, 3), (2, "g", 5, 3), (3, "g", 1, 3)]
    got = {
        r.doc_id: (r.rank, r.selected)
        for r in token_budget_select(
            _frame(spark, rows), 6, "grp", "q", "tok"
        ).collect()
    }
    assert got == {2: (1, True), 3: (2, True), 1: (3, False)}


def test_budget_select_plan_single_group_shuffle(spark):
    rng = random.Random(5)
    rows = [
        (i, f"s{i % 7}", rng.randint(0, 9), rng.randint(1, 9))
        for i in range(300)
    ]
    out = token_budget_select(_frame(spark, rows), 20, "grp", "q", "tok")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # both running expressions (rank + cumulative sum) must share ONE
    # window over ONE group-keyed exchange — a second Exchange would
    # mean the sort is being paid twice
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    # integer representation pinned BIGINT (the sessionization lesson)
    kinds = dict(out.dtypes)
    assert kinds["rank"] == "bigint" and kinds["cum_tokens"] == "bigint"


def test_budget_select_per_group_budgets_table(spark):
    """The production form: target mixture weights become per-source
    budgets; a group absent from the table selects nothing (an honest
    zero, not an implicit infinity)."""
    rows = [
        (1, "a", 9, 5), (2, "a", 8, 5), (3, "a", 7, 5),
        (4, "b", 9, 5), (5, "b", 8, 5),
        (6, "c", 9, 5),
    ]
    budgets = spark.createDataFrame(
        [("a", 10), ("b", 5)], "grp string, budget long"
    )
    got = {
        r.doc_id: r.selected
        for r in token_budget_select(
            _frame(spark, rows), budgets, "grp", "q", "tok"
        ).collect()
    }
    assert got == {
        1: True, 2: True, 3: False,   # a: budget 10 fits two 5s
        4: True, 5: False,            # b: budget 5 fits one
        6: False,                     # c: no allocation at all
    }
    # the scalar form on the same rows stays the reference behavior
    scalar = {
        r.doc_id: r.selected
        for r in token_budget_select(
            _frame(spark, rows), 10, "grp", "q", "tok"
        ).collect()
    }
    assert scalar == {1: True, 2: True, 3: False, 4: True, 5: True, 6: True}


def test_budget_select_duplicate_budget_rows_fail_loudly(spark):
    """A duplicate group key in the budgets table would fan out every
    document of that group through the join (grain corruption with
    conflicting selected flags) — the r13 ADVICE item. The guard must
    raise at evaluation time, not silently duplicate rows."""
    import pytest
    from py4j.protocol import Py4JJavaError

    rows = [(1, "a", 9, 5), (2, "a", 8, 5), (3, "b", 9, 5)]
    budgets = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "grp string, budget long"
    )
    out = token_budget_select(_frame(spark, rows), budgets, "grp", "q", "tok")
    with pytest.raises(Exception, match="duplicate budget rows"):
        out.collect()
    # a unique budgets table still works untouched
    ok = token_budget_select(
        _frame(spark, rows),
        spark.createDataFrame([("a", 10), ("b", 5)], "grp string, budget long"),
        "grp", "q", "tok",
    )
    assert {r.doc_id: r.selected for r in ok.collect()} == {
        1: True, 2: True, 3: True,
    }
