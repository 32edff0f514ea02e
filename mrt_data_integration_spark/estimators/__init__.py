from mrt_data_integration_spark.estimators.drwcls import drwcls  # noqa: F401
from mrt_data_integration_spark.estimators.etwcls import etwcls  # noqa: F401
from mrt_data_integration_spark.estimators.petwcls import petwcls  # noqa: F401
from mrt_data_integration_spark.estimators.pwcls import pwcls  # noqa: F401
from mrt_data_integration_spark.estimators.wcls import WclsFit, wcls  # noqa: F401
