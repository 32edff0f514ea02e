"""Streaming categorical-drift drain (streaming/drift.py): the drained
stream's finalized profile must equal the batch profile EXACTLY
(identical rounded doubles — the finalize shares the batch operator's
expressions over the merged counts), across multiple micro-batches,
with the state merged incrementally per batch."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.drift import (
    category_drift_profile,
)
from mrt_data_integration_spark.streaming.drift import (
    run_category_drift_stream,
)


def _rows(n, seed):
    rng = random.Random(seed)
    cats = ["en", "de", "fr", "zh", None]
    return [
        (i, rng.choice(cats), rng.choice(["a", "b"]))
        for i in range(n)
    ]


def test_streaming_drift_equals_batch(spark, tmp_path):
    df = spark.createDataFrame(
        _rows(400, 20260822), "doc_id long, c string, grp string"
    )
    src = str(tmp_path / "src")
    # several files -> several micro-batches under maxFilesPerTrigger=1
    df.repartition(5).write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    in_a = F.col("grp") == "a"
    got = sorted(
        map(
            tuple,
            run_category_drift_stream(
                spark, stream, str(tmp_path / "state"), "c", in_a
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, category_drift_profile(df, "c", in_a).collect())
    )
    assert got == want  # identical rounded doubles, not merely close


def test_streaming_drift_merges_across_batches(spark, tmp_path):
    """A category appearing ONLY in a later file must still carry its
    full count — i.e. the state genuinely merges rather than keeping
    the last batch."""
    a = spark.createDataFrame(
        [(1, "en", "a")] * 1, "doc_id long, c string, grp string"
    )
    rows1 = [(i, "en", "a") for i in range(30)]
    rows2 = [(i, "zh", "b") for i in range(30, 50)]
    df1 = spark.createDataFrame(rows1, a.schema)
    df2 = spark.createDataFrame(rows2, a.schema)
    src = str(tmp_path / "src")
    df1.coalesce(1).write.parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = {
        r.c: (r.n_a, r.n_b)
        for r in run_category_drift_stream(
            spark,
            stream,
            str(tmp_path / "state"),
            "c",
            F.col("grp") == "a",
        ).collect()
    }
    assert out == {"en": (30, 0), "zh": (0, 20)}


def test_streaming_ks_drift_equals_batch(spark, tmp_path):
    """The KS complement: the drained value-grain count state must
    finalize into the batch CDF-difference profile EXACTLY."""
    from mrt_data_integration_spark.operators.drift import (
        two_sample_ks_profile,
    )
    from mrt_data_integration_spark.streaming.drift import (
        run_ks_drift_stream,
    )

    rng = random.Random(20260824)
    rows = [
        (i, rng.randint(0, 40), rng.choice(["a", "b"]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, v int, grp string")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    in_a = F.col("grp") == "a"
    got = sorted(
        map(
            tuple,
            run_ks_drift_stream(
                spark, stream, str(tmp_path / "state"), "v", in_a
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, two_sample_ks_profile(df, "v", in_a).collect())
    )
    assert got == want


def test_streaming_drift_empty_stream_raises_clearly(spark, tmp_path):
    """Zero drained micro-batches used to fall through to a parquet
    read of 'state_v-1' (an opaque path-not-found) — the r13 ADVICE
    item. Both drains must instead raise a clear no-batches error."""
    import pytest

    from mrt_data_integration_spark.streaming.drift import (
        run_ks_drift_stream,
    )

    schema = "doc_id long, c string, grp string, n long"
    src = str(tmp_path / "empty_src")
    # a valid but EMPTY source directory: no files -> no micro-batches
    spark.createDataFrame([], schema).write.parquet(src)
    import glob
    import os

    for f in glob.glob(os.path.join(src, "*.parquet")):
        os.remove(f)
    in_a = F.col("grp") == "a"
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(RuntimeError, match="no micro-batch was drained"):
        run_category_drift_stream(
            spark, stream, str(tmp_path / "st1"), "c", in_a
        )
    stream2 = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(RuntimeError, match="no micro-batch was drained"):
        run_ks_drift_stream(spark, stream2, str(tmp_path / "st2"), "n", in_a)
