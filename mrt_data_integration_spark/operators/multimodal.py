"""Multimodal (image/audio/video) column operators — Spark-side
plumbing for a training-data pipeline (driver north star).

Media travel as opaque ``binary`` columns plus typed metadata; all
per-asset compute runs as Arrow-batched ``mapInPandas`` so each task
processes a bounded batch of blobs without ever materializing them on
the driver. The decode step itself is STUBBED: the runtime image/audio
libraries (PIL/torchvision/ffmpeg) are not in this container, so
``decode_fn`` falls back to a clearly-marked deterministic fake that
exercises the real schema/batching/partitioning path; plug a real
decoder into the same signature in production.

Scale notes: blobs never shuffle — derivation is map-only; set
``spark.sql.files.maxPartitionBytes`` so a task's Arrow batch of blobs
fits executor memory, and store blobs in parquet binary columns (or
pointers to object storage for >~1 MB assets, resolved inside the
batch iterator).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sha256", StringType()),
        StructField("byte_len", LongType()),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image decoding: derives plausible
    (width, height, channels) from a content hash. Replace with a real
    decoder (PIL.Image.open) in production — same signature."""
    h = hashlib.sha256(blob).digest()
    return 64 + h[0] % 960, 64 + h[1] % 960, 1 + h[2] % 4


def default_decode(blob: bytes) -> tuple[int, int, int]:
    """Real decode if an imaging library is present, else the
    deterministic fake (NotImplementedError is deliberately NOT raised
    so the pipeline stays runnable end-to-end in this container)."""
    try:  # pragma: no cover - library absent in the test container
        from PIL import Image  # noqa: F401
        import io

        with Image.open(io.BytesIO(blob)) as im:
            return im.width, im.height, len(im.getbands())
    except ImportError:
        return _fake_decode(blob)


def extract_image_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int]] = default_decode,
) -> DataFrame:
    """binary column → per-asset feature rows via Arrow-batched
    mapInPandas (the canonical multimodal derivation shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob)
                w, h, c = decode_fn(b)
                out.append(
                    (
                        int(asset_id),
                        int(w),
                        int(h),
                        int(c),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "width",
                    "height",
                    "n_channels",
                    "sha256",
                    "byte_len",
                ],
            )

    return media.select("asset_id", "content").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def resize_plan(features: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning as column arithmetic over the decoded metadata:
    target dims preserving aspect ratio. (The pixel transform itself
    belongs in the same mapInPandas as decode; planning stays JVM-side
    so filters like 'skip tiny images' push down.)"""
    from pyspark.sql import functions as F

    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return features.select(
        "asset_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
        (F.col("width") * F.col("height") >= 32 * 32).alias("keep"),
    )


def frame_sample_plan(
    n_frames: Callable[[int], int] | None = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Video frame-sampling plan: given per-asset duration_ms rows,
    emit (asset_id, frame_idx, ts_ms) sample points — the explode-side
    of video decode. Returned as a pandas transform for use inside the
    same mapInPandas batch as the decoder."""
    pick = n_frames or (lambda dur_ms: max(1, min(8, dur_ms // 1000)))

    def plan(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for asset_id, dur in zip(pdf["asset_id"], pdf["duration_ms"]):
            k = pick(int(dur))
            for i in range(k):
                rows.append((int(asset_id), i, int((i + 0.5) * dur / k)))
        return pd.DataFrame(rows, columns=["asset_id", "frame_idx", "ts_ms"])

    return plan


def synthesize_media_table(spark, n_assets: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no real codecs in the
    container): content bytes are seeded by asset id."""
    rows = []
    for i in range(n_assets):
        blob = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 7)
        rows.append((i, "image", bytearray(blob), "application/octet-stream"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def embed_stub(features: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stub: deterministic pseudo-embedding from the
    sha256 — stands in for a model forward pass; same mapInPandas
    shape and ArrayType(Float) output as the real thing."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    hex_slice = [F.conv(F.substring("sha256", 1 + 2 * i, 2), 16, 10).cast("int") for i in range(dim)]
    arr = F.array(*[(h.cast("double") / 255.0).cast("float") for h in hex_slice])
    return features.select("asset_id", arr.cast(ArrayType(FloatType())).alias("embedding"))
