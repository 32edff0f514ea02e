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
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
