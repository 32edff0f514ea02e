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

Cache-sweep contract: invoking a registered query RELEASES every cache/
checkpoint tracked by the PREVIOUS query invocation (cache_registry).
This assumes the serial collect-then-next pattern of the grading driver
and bench: consume (collect/count/write) each query's result BEFORE
invoking the next registered query. A caller that builds several
registered queries lazily and collects later keeps correctness (lineage
recomputes evicted frames) but silently loses the cache benefit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mrt_data_integration_spark.cache_registry import sweep_caches

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
            # Release the previous query's tracked persists (its result has
            # been collected by now) so a long multi-query driver session
            # shows zero net cache growth.
            sweep_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
