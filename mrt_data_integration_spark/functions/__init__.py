from mrt_data_integration_spark.functions.derive import (  # noqa: F401
    centered_treatment,
    combined_weight,
    ipw_weight,
    logistic,
    observed_arm_prob,
    tilt_ratio,
)
