"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the distributed WCLS estimator
with cluster-robust sandwich SEs) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full registry from
``mrt_data_integration_spark.queries`` — one entry per implemented
operator family from SURVEY.md §2, each with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mrt_data_integration_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed WCLS fit (sufficient stats → two-level
    cluster meat → sandwich) on the sf0.001 events panel."""
    return QUERIES["wcls_cluster_robust"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
