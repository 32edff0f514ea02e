"""Streaming constraint-audit drain (streaming/audit.py): the drained
stream's finalized audit must equal the batch row_checks EXACTLY
(identical counts, rates, flags — the finalize is shared verbatim),
across multiple micro-batches with incremental state merge; empty
streams fail loudly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.quality_audit import row_checks
from mrt_data_integration_spark.streaming.audit import (
    run_constraint_audit_stream,
)

def _checks():
    # built lazily — F.col needs an active SparkContext
    return [
        ("qty_in_0_100", (F.col("qty") < 0) | (F.col("qty") > 100)),
        ("qty_not_null", F.col("qty").isNull()),
        ("name_nonempty", F.col("name").isNull() | (F.length("name") == 0)),
    ]


def _rows(n, seed):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        qty = rng.choice([None, -5.0, 150.0, float(rng.randint(0, 100))])
        name = rng.choice(["", "ok", None, "x"])
        out.append((i, qty, name))
    return out


def test_streaming_audit_equals_batch(spark, tmp_path):
    df = spark.createDataFrame(
        _rows(400, 20260821), "id long, qty double, name string"
    )
    src = str(tmp_path / "src")
    df.repartition(5).write.parquet(src)  # 5 files -> 5 micro-batches
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = sorted(
        map(
            tuple,
            run_constraint_audit_stream(
                spark, stream, str(tmp_path / "state"), "t", _checks()
            ).collect(),
        )
    )
    want = sorted(map(tuple, row_checks(df, "t", _checks()).collect()))
    assert got == want  # identical counts/rates/flags, not merely close


def test_streaming_audit_merges_across_batches(spark, tmp_path):
    """A violation arriving ONLY in a later file must still be
    counted — the state genuinely merges rather than keeping the
    last batch."""
    schema = "id long, qty double, name string"
    clean = spark.createDataFrame(
        [(i, 5.0, "ok") for i in range(30)], schema
    )
    dirty = spark.createDataFrame(
        [(100 + i, -1.0, "ok") for i in range(7)], schema
    )
    src = str(tmp_path / "src")
    clean.coalesce(1).write.parquet(src)
    dirty.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(clean.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rows = {
        r.check_name: r
        for r in run_constraint_audit_stream(
            spark, stream, str(tmp_path / "state"), "t", _checks()
        ).collect()
    }
    assert rows["qty_in_0_100"].n_rows == 37
    assert rows["qty_in_0_100"].n_violations == 7
    assert not rows["qty_in_0_100"].passed


def test_streaming_audit_empty_stream_raises_clearly(spark, tmp_path):
    import glob
    import os

    schema = "id long, qty double, name string"
    src = str(tmp_path / "src")
    # a valid but EMPTY source directory: no files -> no micro-batches
    spark.createDataFrame([], schema).write.parquet(src)
    for f in glob.glob(os.path.join(src, "*.parquet")):
        os.remove(f)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(RuntimeError, match="no micro-batch was drained"):
        run_constraint_audit_stream(
            spark, stream, str(tmp_path / "state"), "t", _checks()
        )
