"""Registry mapping query names → Spark callables and DuckDB oracle SQL.

Contract (driver): the Spark result and the oracle result are compared on
row count, schema (column names), and an order-insensitive value hash.
Rules we enforce on every registered pair:

- identical column names on both sides (alias aggregates explicitly);
- floating-point outputs of aggregations are rounded (default 4 decimals)
  on BOTH sides, so summation-order differences between engines can't
  flip the hash (SURVEY.md §7.4 item 7);
- integer-typed aggregates are cast to BIGINT on the DuckDB side (DuckDB
  promotes integer SUM to HUGEINT, Spark to LONG);
- no LIMIT without a total order (ties would be nondeterministic).

Cache-sweep contract: caches/checkpoints tracked during a query's BUILD
are bound to the lifetime of that query's result DataFrame — they are
released (at the next query invocation) only once the caller has dropped
the result. The serial collect-then-next driver pattern therefore shows
zero net cache growth exactly as before, while a caller that builds
several registered queries first and collects later keeps every pending
plan's caches (and its lineage-truncated local checkpoints — which a
premature sweep would have BROKEN, not just slowed) alive until it drops
each result. See cache_registry for the generation mechanics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mrt_data_integration_spark.cache_registry import (
    begin_generation,
    end_generation,
    sweep_pending,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_SHIPPED_CONTEXTS: set[int] = set()


def _ensure_package_on_workers(spark: SparkSession) -> None:
    """Queries may run under an externally-created SparkSession (the
    grading driver's) whose JVM started before this package reached
    PYTHONPATH — Python workers would then fail to unpickle mapInPandas
    closures. Ship the package as a zip via addPyFile once per
    SparkContext (no-op for sessions built by our get_spark)."""
    import os
    import zipfile

    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_CONTEXTS:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join("/tmp", "mrt_data_integration_spark_pkg.zip")
    sources = [
        os.path.join(dp, fn)
        for dp, _, files in os.walk(pkg_dir)
        for fn in files
        if fn.endswith(".py")
    ]
    newest = max(os.path.getmtime(p) for p in sources)
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest:
        root = os.path.dirname(pkg_dir)
        with zipfile.ZipFile(zip_path, "w") as zf:
            for full in sources:
                zf.write(full, os.path.relpath(full, root))
    try:
        sc.addPyFile(zip_path)
    except Exception:
        pass  # already added or unsupported — workers may import via env
    _SHIPPED_CONTEXTS.add(key)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_package_on_workers(spark)
            # Release generations whose result frames the caller has
            # dropped (the previous query, in the serial driver pattern)
            # so a long multi-query session shows zero net cache growth —
            # without touching caches of still-referenced pending plans.
            sweep_pending()
            gen = begin_generation()
            result: DataFrame | None = None
            try:
                result = fn(spark, sf_dir)
                return result
            finally:
                end_generation(gen, result)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
