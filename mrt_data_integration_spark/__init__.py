"""mrt_data_integration_spark — a PySpark-native analytics engine.

A ground-up Spark re-expression of the data-processing capabilities of the
reference repo ``eastonhuch/mrt-data-integration`` (an R/Rcpp simulation +
weighted-regression codebase for micro-randomized-trial data integration),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis) designed for 100 TB scale.

Design stance (SURVEY.md §7.0):
- All O(n) work is Spark DataFrame expressions/aggregations (Catalyst
  optimizes; whole-stage codegen executes).
- All O(d^2)/O(d^3) work (d <= ~34) is driver-side numpy.
- Model fits use sufficient statistics collected in ONE distributed
  aggregation pass, never per-row Python.
- Operators key on explicit columns (user_id, t) — never row order.
"""

__version__ = "0.1.0"

from mrt_data_integration_spark.session import get_spark  # noqa: F401

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
