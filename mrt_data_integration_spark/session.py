"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster (AQE on, skew-join handling on, broadcast
threshold sized for dimension tables). Session timezone is pinned to UTC so
timestamp semantics match the DuckDB oracle (naive == UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mrt-data-integration-spark") -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism (default: all cores).
    On a real cluster the master/executor settings come from spark-submit;
    everything set here is master-independent.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    # Python workers (mapInPandas tasks) must be able to import this
    # package regardless of the driver's cwd: export the repo root.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime re-planning, broadcast conversion, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffle partitions sized for the local harness; AQE coalesces
        # down, and on a big cluster this is overridden per-job.
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        # Dimension tables (region/nation/customer/supplier/part at test
        # SF) stay under this; big-side tables never broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for every pandas_udf / applyInPandas / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Read 128 MiB parquet splits — matches cluster default; at 100 TB
        # this yields ~800k input partitions, which AQE coalesces post-scan.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Console progress bars write \r-spam to stdout; the bench driver
        # keeps only a tail of stdout and parses its final line as JSON,
        # so progress output must never compete for those bytes.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=error")
        # The driver testdata stores events.ts as TIMESTAMP(NANOS), which
        # vanilla Spark rejects; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
