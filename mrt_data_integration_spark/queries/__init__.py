"""Driver-contract query registry.

Every operator family from SURVEY.md §2 surfaces here as a named query
(a ``(spark, sf_dir) -> DataFrame`` callable) plus, where SQL-expressible,
a DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports this
registry to the driver.

Importing this package registers all query modules.
"""

from mrt_data_integration_spark.queries.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# Import for side effect: each module registers its queries.
from mrt_data_integration_spark.queries import (  # noqa: F401, E402
    aggregates,
    derived,
    estimators,
    joins,
    simulation,
    text_dedup,
    timeseries,
    vectors,
)
