from mrt_data_integration_spark.estimators.wcls import WclsFit, wcls  # noqa: F401
