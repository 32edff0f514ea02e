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
    # Every registered query must at least execute at sf0.001.
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_smoke)
        assert df.columns, name
        df.limit(5).collect()
