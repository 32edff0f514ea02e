"""Structured Streaming twins of the batch event operators
(SURVEY.md §2.9 E6): tumbling-window rollups with watermarked late-data
handling, and gap-based sessionization via ``session_window``.

The batch queries (queries/timeseries.py) define the semantics; these
produce the same aggregates over an unbounded source. Sources: any
``readStream``-able input — in tests a parquet directory with
``availableNow`` trigger; in production Kafka/files. State stores are
keyed by (window, event_type) / (session_window, user) — both bounded
by the watermark, so state size is O(active windows), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream. No ``maxFilesPerTrigger`` is set, so
    an availableNow drain takes ALL available files in ONE micro-batch
    (empirically verified; callers sizing per-batch state partitions —
    queries/timeseries.stateful_capped_sessions — rely on n_batches=1).
    Callers that need multi-batch state carry set the option
    themselves."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of queries/timeseries.events_hourly_rollup:
    1-hour tumbling windows per event_type, tolerating late events up
    to the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00").alias("hour_key"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization via ``session_window`` — same 30-minute
    inactivity-gap semantics as operators.sessionize, with state pruned
    past the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, spark: SparkSession
) -> DataFrame:
    """Drain a (bounded) stream with availableNow into an in-memory
    table and return it as a batch DataFrame — the test harness path."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
