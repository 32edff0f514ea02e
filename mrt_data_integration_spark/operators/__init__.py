from mrt_data_integration_spark.operators.aggregates import (  # noqa: F401
    cluster_meat,
    cross_moments,
    weighted_gram,
)
