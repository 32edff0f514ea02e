"""Parquet table catalog over the driver test data (SURVEY.md §2.1 S3).

Reads are plain ``spark.read.parquet`` — column pruning and predicate
pushdown happen in Catalyst from whatever the downstream plan selects, so
loaders never pre-materialize or cache. At 100 TB each table is a
partitioned parquet dataset; the same call works unchanged (Spark plans
one task per row-group split, ``maxPartitionBytes`` controls granularity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from mrt_data_integration_spark import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from ``{sf_dir}/{name}.parquet``.

    events.ts is physically TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long that we
    convert to a microsecond timestamp (floor division — same truncation
    DuckDB applies), keeping the logical schema engine-portable.
    """
    if name == "events":
        # Guard for externally-created sessions (e.g. the grading
        # driver's own SparkSession) that lack the nanos config —
        # without it the events scan throws PARQUET_TYPE_ILLEGAL.
        # The conf is runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the full catalog (lazy — no jobs run until an action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
