"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas feature extraction, resize planning, frame-sample plans,
and the embedding stub feeding the similarity operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.multimodal import (
    embed_stub,
    extract_image_features,
    frame_sample_plan,
    resize_plan,
    synthesize_media_table,
)
from mrt_data_integration_spark.operators.similarity import brute_force_topk


def test_extract_image_features(spark):
    media = synthesize_media_table(spark, n_assets=32)
    feats = extract_image_features(media).cache()
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert 64 <= r.width <= 1024 and 64 <= r.height <= 1024
        assert 1 <= r.n_channels <= 4
        assert len(r.sha256) == 64 and r.byte_len > 0
    # deterministic: rerun produces identical rows
    again = extract_image_features(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    feats.unpersist()


def test_resize_plan(spark):
    media = synthesize_media_table(spark, n_assets=16)
    plan = resize_plan(extract_image_features(media), max_side=128).collect()
    for r in plan:
        assert max(r.target_w, r.target_h) <= 128
        # aspect ratio preserved within rounding
        assert abs(r.target_w / r.target_h - r.width / r.height) < 0.1


def test_frame_sample_plan():
    plan = frame_sample_plan()
    out = plan(pd.DataFrame({"asset_id": [1, 2], "duration_ms": [500, 5000]}))
    assert (out[out.asset_id == 1].frame_idx.tolist()) == [0]
    assert len(out[out.asset_id == 2]) == 5
    assert (out.ts_ms >= 0).all()


def test_embed_stub_feeds_similarity(spark):
    media = synthesize_media_table(spark, n_assets=24)
    emb = embed_stub(extract_image_features(media)).withColumnRenamed(
        "asset_id", "vec_id"
    )
    topk = brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=2)
    rows = topk.collect()
    assert len(rows) == 3 * 2
    assert all(-1.0001 <= r.cosine_sim <= 1.0001 for r in rows)