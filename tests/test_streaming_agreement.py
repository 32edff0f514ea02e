"""Streaming agreement drain (streaming/agreement.py): the drained
stream's finalized profile — per-class stats, accuracy, kappa — must
equal the batch label_agreement EXACTLY (the finalize is shared
verbatim), across multiple micro-batches with incremental state
merge; empty streams fail loudly."""

from __future__ import annotations

import random

import pytest

from mrt_data_integration_spark.operators.agreement import label_agreement
from mrt_data_integration_spark.streaming.agreement import (
    run_agreement_stream,
)


def _rows(n, seed):
    rng = random.Random(seed)
    classes = ["a", "b", "c", None]
    return [
        (i, rng.choice(classes), rng.choice(classes)) for i in range(n)
    ]


def test_streaming_agreement_equals_batch(spark, tmp_path):
    df = spark.createDataFrame(
        _rows(400, 20260825), "id long, ref string, pred string"
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
            run_agreement_stream(
                spark, stream, str(tmp_path / "state"), "ref", "pred"
            ).collect(),
        )
    )
    want = sorted(map(tuple, label_agreement(df, "ref", "pred").collect()))
    assert got == want  # identical rounded doubles, not merely close


def test_streaming_agreement_merges_across_batches(spark, tmp_path):
    """A class appearing ONLY in a later file must carry its full
    count — the state genuinely merges rather than keeping the last
    batch; kappa reflects the UNION of batches."""
    schema = "id long, ref string, pred string"
    f1 = spark.createDataFrame(
        [(i, "a", "a") for i in range(30)], schema
    )
    f2 = spark.createDataFrame(
        [(100 + i, "b", "b") for i in range(10)]
        + [(200 + i, "b", "a") for i in range(10)],
        schema,
    )
    src = str(tmp_path / "src")
    f1.coalesce(1).write.parquet(src)
    f2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rows = {
        r.label: r
        for r in run_agreement_stream(
            spark, stream, str(tmp_path / "state"), "ref", "pred"
        ).collect()
    }
    assert rows["a"].n_ref == 30 and rows["a"].n_pred == 40
    assert rows["b"].n_ref == 20 and rows["b"].n_correct == 10
    # kappa over the union: po=0.8, pe=(30*40+20*10)/50^2=0.56
    assert rows["a"].kappa == round((0.8 - 0.56) / (1 - 0.56), 6)


def test_streaming_agreement_empty_stream_raises_clearly(spark, tmp_path):
    import glob
    import os

    schema = "id long, ref string, pred string"
    src = str(tmp_path / "src")
    spark.createDataFrame([], schema).write.parquet(src)
    for f in glob.glob(os.path.join(src, "*.parquet")):
        os.remove(f)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(RuntimeError, match="no micro-batch was drained"):
        run_agreement_stream(
            spark, stream, str(tmp_path / "state"), "ref", "pred"
        )
