"""Differential test: every registered query vs its DuckDB oracle —
the local replica of the driver's CORRECTNESS gate (sf0.01)."""

from __future__ import annotations

import pytest

from mrt_data_integration_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import compare_frames, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


def test_all_queries_have_impl():
    for name in ORACLES:
        assert name in QUERIES


def test_queries_run_on_smoke(spark, sf_smoke):
    # Every registered query must at least execute at sf0.001 — and
    # every query's PHYSICAL PLAN must pass the registry-wide scale
    # lint (piggybacked on this sweep so it costs no extra execution):
    #   - no CartesianProduct — an unkeyed join anywhere is a 100 TB
    #     non-starter (1-row crossJoin broadcasts plan as
    #     BroadcastNestedLoopJoin over a single-row side, not as
    #     CartesianProduct, so the legitimate stats-broadcast pattern
    #     passes);
    #   - no BatchEvalPython — a row-at-a-time Python UDF in any plan
    #     contradicts the engine's Arrow-only Python contract
    #     (mapInPandas/ArrowEval nodes are the sanctioned path).
    #   - no tokenizer call captured INSIDE a HOF lambda body — an
    #     interpreted lambda re-evaluates captured sub-expressions per
    #     ELEMENT, so `transform(..., i -> ...split(text, ...)...)`
    #     re-runs the regex tokenizer O(n_elements) times per row (the
    #     r11 word_pairs/word_ngrams/word_shingles finding: a silent
    #     5-6× that the CartesianProduct/BatchEvalPython lints cannot
    #     see — it looks like WholeStageCodegen from outside). Zip the
    #     shifted slices instead, or materialize the array as a column
    #     and capture the attribute.
    import re as _re

    def _hof_captured_tokenizer(plan: str) -> bool:
        pos = 0
        while True:
            start = plan.find("lambdafunction(", pos)
            if start < 0:
                return False
            i, depth = start + len("lambdafunction("), 1
            while i < len(plan) and depth:
                depth += {"(": 1, ")": -1}.get(plan[i], 0)
                i += 1
            body = plan[start:i]
            if _re.search(r"\bsplit\(|\bregexp_(replace|extract)\(", body):
                return True
            pos = i

    lint_hits = []
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_smoke)
        assert df.columns, name
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("CartesianProduct", "BatchEvalPython"):
            if marker in plan:
                lint_hits.append((name, marker))
        if _hof_captured_tokenizer(plan):
            lint_hits.append((name, "HOF-captured-tokenizer"))
        df.limit(5).collect()
    assert not lint_hits, f"plan lint violations: {lint_hits}"


def test_comparator_rejects_int_vs_float_representation():
    """Round-3 regression: DuckDB HUGEINT -> float64 vs Spark int64 passed
    the old numeric-equality comparator but failed the driver's
    representation-sensitive hash. The comparator must reject it."""
    import pandas as pd

    spark_pdf = pd.DataFrame({"k": ["a", "b"], "session_id": pd.array([1, 2], dtype="int64")})
    oracle_pdf = pd.DataFrame({"k": ["a", "b"], "session_id": pd.array([1.0, 2.0], dtype="float64")})
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert problems, "int64 vs float64 frames must not compare equal"
    assert any("dtype" in p or "values differ" in p for p in problems)

    # identical representations still pass
    assert not compare_frames(spark_pdf, spark_pdf.copy())


def test_driver_window_invariants():
    """The grading driver checks exactly the first 50 registered queries;
    pin the rotation policy's structural invariants so a registration
    mistake can't silently un-verify queries."""
    import importlib

    qinit = importlib.import_module("mrt_data_integration_spark.queries")

    window = qinit._WINDOW
    pools = (
        set(qinit._POOL_A),
        set(qinit._POOL_B),
        set(qinit._CORE),
        set(qinit._RETIRED),  # r7: CI-only tier, outside the rotation
    )
    assert len(window) == 50 == len(set(window))
    # tiers partition the registry exactly
    assert pools[0] | pools[1] | pools[2] | pools[3] == set(QUERIES)
    for i, a in enumerate(pools):
        for b in pools[i + 1:]:
            assert not (a & b)
    # registration order == window + remainder (driver reads order[:50])
    assert list(QUERIES)[:50] == window
    # every windowed query exists; every oracle key has an impl
    assert all(n in QUERIES for n in window)
