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

def _tiny_png(w, h, color_type=2):
    """Hand-assembled valid PNG (spec-layout: signature, IHDR, IDAT
    with zlib-compressed filtered scanlines, IEND)."""
    import struct
    import zlib

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(w * channels) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def _tiny_bmp(w, h, bpp=24):
    import struct

    info = struct.pack("<IiiHH", 40, w, h, 1, bpp) + bytes(16)
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info


def _tiny_bmp_v4(w, h, alpha_mask):
    # BITMAPV4HEADER (108 bytes): masks live IN the header at info
    # offsets 40 (red) .. 52 (alpha); compression = BI_BITFIELDS
    import struct

    info = (
        struct.pack("<IiiHHI", 108, w, h, 1, 32, 3)
        + bytes(12)  # image size, x/y ppm
        + bytes(8)  # colors used / important
        + struct.pack(
            "<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF, alpha_mask
        )
        + bytes(108 - 56)  # cs type, endpoints, gammas
    )
    assert len(info) == 108
    return b"BM" + struct.pack("<IHHI", 14 + 108, 0, 0, 14 + 108) + info


def _tiny_jpeg(w, h, n_components=3, fill=0):
    import struct

    sof_payload = struct.pack(">BHHB", 8, h, w, n_components) + bytes(
        3 * n_components
    )
    return (
        b"\xff\xd8"                                   # SOI
        + b"\xff\xe0" + struct.pack(">H", 6) + b"JF\x00\x00"  # APP0 stub
        + b"\xff" * fill                              # B.1.1.2 fill bytes
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
        + b"\xff\xd9"                                 # EOI
    )


def _tiny_wav(n_channels, rate, n_frames):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(2 * n_channels * n_frames))
    return buf.getvalue()


def test_stdlib_image_decode_real_formats():
    """The stdlib layer must parse REAL header layouts — dimensions and
    channel counts round-trip exactly for every supported format, and
    unknown content returns None (handing the fallback decision to the
    caller instead of guessing)."""
    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_image_decode,
    )

    assert stdlib_image_decode(_tiny_png(320, 200, color_type=2)) == (320, 200, 3)
    assert stdlib_image_decode(_tiny_png(7, 5, color_type=0)) == (7, 5, 1)
    assert stdlib_image_decode(_tiny_png(64, 64, color_type=6)) == (64, 64, 4)
    # GIF is palette-indexed: 1 channel, matching PIL mode-P and the
    # PNG palette convention
    assert stdlib_image_decode(_tiny_gif(99, 42)) == (99, 42, 1)
    assert stdlib_image_decode(_tiny_bmp(31, 17, bpp=24)) == (31, 17, 3)
    assert stdlib_image_decode(_tiny_bmp(31, 17, bpp=8)) == (31, 17, 1)
    # 16bpp RGB555/565 is a THREE-channel image (bpp // 8 == 2 is a
    # channel count no image has); plain 32bpp BI_RGB's 4th byte is
    # padding (PIL: RGB); alpha only with a BITFIELDS alpha mask
    assert stdlib_image_decode(_tiny_bmp(31, 17, bpp=16)) == (31, 17, 3)
    assert stdlib_image_decode(_tiny_bmp(31, 17, bpp=32)) == (31, 17, 3)
    assert stdlib_image_decode(_tiny_bmp_v4(31, 17, alpha_mask=0xFF000000)) == (
        31, 17, 4,
    )
    assert stdlib_image_decode(_tiny_bmp_v4(31, 17, alpha_mask=0)) == (31, 17, 3)
    assert stdlib_image_decode(_tiny_jpeg(1024, 768)) == (1024, 768, 3)
    # any number of 0xFF fill bytes may pad before a marker (B.1.1.2) —
    # odd-length runs used to desync the segment walk
    for fill in (1, 2, 3):
        assert stdlib_image_decode(_tiny_jpeg(1024, 768, fill=fill)) == (
            1024, 768, 3,
        )
    assert stdlib_image_decode(b"P6\n# a comment\n640 480\n255\n") == (640, 480, 3)
    assert stdlib_image_decode(b"P5 12 34 255 ") == (12, 34, 1)
    assert stdlib_image_decode(b"not an image at all") is None
    assert stdlib_image_decode(b"\x89PNG\r\n\x1a\n\x00\x00") is None  # truncated


def test_extract_image_features_layered_decode(spark):
    """End-to-end through the Spark mapInPandas path: real-format blobs
    yield their TRUE dimensions, opaque blobs fall back to the
    deterministic fake — both through the same default decoder."""
    from mrt_data_integration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _fake_decode,
    )

    opaque = b"\x00opaque-blob-0123456789"
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(_tiny_png(320, 200)), "image/png"),
            (2, "image", bytearray(_tiny_jpeg(640, 480)), "image/jpeg"),
            (3, "image", bytearray(opaque), "application/octet-stream"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {
        r.asset_id: r for r in extract_image_features(media).collect()
    }
    assert (rows[1].width, rows[1].height, rows[1].n_channels) == (320, 200, 3)
    assert (rows[2].width, rows[2].height, rows[2].n_channels) == (640, 480, 3)
    assert (rows[3].width, rows[3].height, rows[3].n_channels) == _fake_decode(
        opaque
    )


def test_extract_audio_features_wav(spark):
    """WAV blobs decode their REAL channel/rate/frame counts through
    the stdlib wave module; non-WAV content falls back deterministically
    — same layered contract as the image path."""
    from mrt_data_integration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _fake_audio_decode,
        extract_audio_features,
    )

    opaque = b"not-audio"
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(_tiny_wav(2, 16000, 8000)), "audio/wav"),
            (2, "audio", bytearray(_tiny_wav(1, 44100, 44100)), "audio/wav"),
            (3, "audio", bytearray(opaque), "application/octet-stream"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {
        r.asset_id: r for r in extract_audio_features(media).collect()
    }
    assert (rows[1].n_channels, rows[1].sample_rate, rows[1].n_frames) == (
        2, 16000, 8000,
    )
    assert rows[1].duration_ms == 500
    assert (rows[2].n_channels, rows[2].sample_rate, rows[2].n_frames) == (
        1, 44100, 44100,
    )
    assert rows[2].duration_ms == 1000
    assert (
        rows[3].n_channels, rows[3].sample_rate, rows[3].n_frames
    ) == _fake_audio_decode(opaque)


def test_stdlib_decode_fuzz_round_trip():
    """Seeded fuzz over the header space: random dims / color types /
    bit depths / component counts must round-trip exactly through every
    stdlib decoder — the parsers read spec offsets, so any byte-layout
    mistake shows up as a wrong dimension, not a crash."""
    import random

    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_image_decode,
        wav_decode,
    )

    rng = random.Random(77)
    png_channels = {0: 1, 2: 3, 6: 4}
    for _ in range(100):
        w, h = rng.randint(1, 60000), rng.randint(1, 60000)
        ct = rng.choice([0, 2, 6])
        # PNG IDAT payload size explodes for huge dims; header parsing
        # doesn't read it, so cap the assembled-pixel path separately
        if w * h <= 4096:
            assert stdlib_image_decode(_tiny_png(w, h, ct)) == (
                w, h, png_channels[ct],
            )
        wg, hg = rng.randint(1, 65535), rng.randint(1, 65535)
        assert stdlib_image_decode(_tiny_gif(wg, hg)) == (wg, hg, 1)
        bpp = rng.choice([1, 8, 16, 24, 32])
        assert stdlib_image_decode(_tiny_bmp(w, h, bpp)) == (
            w, h, 1 if bpp <= 8 else 3,
        )
        nc = rng.choice([1, 3, 4])
        assert stdlib_image_decode(
            _tiny_jpeg(wg, hg, nc, fill=rng.randint(0, 4))
        ) == (wg, hg, nc)
        assert stdlib_image_decode(
            f"P6  {w} {h} 255 ".encode()
        ) == (w, h, 3)
    for _ in range(20):
        ch = rng.randint(1, 2)
        rate = rng.choice([8000, 16000, 44100, 48000])
        frames = rng.randint(1, 5000)
        assert wav_decode(_tiny_wav(ch, rate, frames)) == (ch, rate, frames)


def test_decoders_never_raise_on_corrupt_blobs():
    """Robustness contract: a corrupt blob that passes the magic sniff
    must yield a graceful None (fallback), never an exception — one bad
    asset must not kill a mapInPandas task. Single-byte mutations of
    valid blobs empirically hit wave.py's bare RuntimeError path (~13%
    of mutations) and truncated headers hit struct.error."""
    import random

    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_image_decode,
        wav_decode,
    )

    rng = random.Random(13)
    wav = bytearray(_tiny_wav(2, 16000, 64))
    png = bytearray(_tiny_png(32, 32))
    for _ in range(500):
        for base, fn in ((wav, wav_decode), (png, stdlib_image_decode)):
            mutated = bytearray(base)
            for _k in range(rng.randint(1, 4)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            out = fn(bytes(mutated))  # must not raise
            assert out is None or isinstance(out, tuple)
        # truncations too
        cut = rng.randrange(1, len(wav))
        assert wav_decode(bytes(wav[:cut])) in (None,) or isinstance(
            wav_decode(bytes(wav[:cut])), tuple
        )
        cutp = rng.randrange(1, len(png))
        r = stdlib_image_decode(bytes(png[:cutp]))
        assert r is None or isinstance(r, tuple)


def _p6_bytes(w, h, pixels):
    """pixels: list of (r,g,b) row-major."""
    body = bytes(v for px in pixels for v in px)
    return f"P6 {w} {h} 255\n".encode() + body


def _bmp24_bytes(w, h, rows_rgb, top_down=False):
    """rows_rgb: rows top-to-bottom, each a list of (r,g,b). Assembles
    a spec-valid 24bpp BI_RGB BMP (bottom-up storage unless top_down),
    4-byte-aligned rows."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    stored = rows_rgb if top_down else rows_rgb[::-1]
    body = b""
    for row in stored:
        line = bytes(v for (r, g, b) in row for v in (b, g, r))  # BGR
        body += line + bytes(stride - len(line))
    hdr_h = -h if top_down else h
    info = struct.pack("<IiiHHI", 40, w, hdr_h, 1, 24, 0) + bytes(20)
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + info
        + body
    )


def test_ppm_pixel_decode_exact():
    import numpy as np

    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_pixel_decode,
    )

    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    img = stdlib_pixel_decode(_p6_bytes(2, 2, px))
    assert img.shape == (2, 2, 3)
    assert img.tolist() == [
        [[10, 20, 30], [40, 50, 60]],
        [[70, 80, 90], [100, 110, 120]],
    ]
    # P5 grey
    grey = stdlib_pixel_decode(b"P5 3 1 255\n" + bytes([7, 8, 9]))
    assert grey.shape == (1, 3, 1) and grey.ravel().tolist() == [7, 8, 9]
    assert np.issubdtype(img.dtype, np.uint8)


def test_bmp24_pixel_decode_row_order_and_padding():
    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_pixel_decode,
    )

    rows = [
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
        [(10, 11, 12), (13, 14, 15), (16, 17, 18)],
    ]
    # bottom-up storage (positive height) must come back top-to-bottom,
    # BGR→RGB converted, 3-byte pad per 9-byte row stripped
    for top_down in (False, True):
        img = stdlib_pixel_decode(_bmp24_bytes(3, 2, rows, top_down=top_down))
        assert img.shape == (2, 3, 3)
        assert img.tolist() == [[list(p) for p in r] for r in rows], top_down


def test_pixel_decode_rejects_compressed_and_other_depths():
    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_pixel_decode,
    )

    assert stdlib_pixel_decode(_tiny_png(8, 8)) is None  # compressed
    assert stdlib_pixel_decode(_tiny_jpeg(8, 8)) is None
    assert stdlib_pixel_decode(_tiny_bmp(8, 8, bpp=8)) is None  # palette
    assert stdlib_pixel_decode(b"P6 2 2 65535\n" + bytes(24)) is None  # 16-bit
    assert stdlib_pixel_decode(b"opaque") is None


def test_resize_pixels_nearest_neighbor_exact():
    import numpy as np

    from mrt_data_integration_spark.operators.multimodal import resize_pixels

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_pixels(img, 2)
    assert small.shape == (2, 2, 3)
    # index sampling: rows (0*4)//2=0,(1*4)//2=2; cols same
    assert small.tolist() == img[[0, 2]][:, [0, 2]].tolist()
    assert resize_pixels(img, 8) is img  # within bound: pass-through
    tall = np.zeros((100, 10, 3), dtype=np.uint8)
    t = resize_pixels(tall, 10)
    assert t.shape == (10, 1, 3)  # aspect preserved, floor≥1


def test_extract_pixel_stats_real_vs_opaque(spark):
    """Through the Spark mapInPandas path: decodable rasters get exact
    stats + a deterministic thumbnail hash; compressed/unknown blobs
    get NULL stats (the honest boundary)."""
    import numpy as np

    from mrt_data_integration_spark.operators.multimodal import (
        extract_pixel_stats,
    )

    px = [(0, 0, 0), (255, 255, 255), (255, 255, 255), (0, 0, 0)]
    ppm = _p6_bytes(2, 2, px)
    rows = [
        (1, "image", bytearray(ppm), "image/x-portable-pixmap"),
        (2, "image", bytearray(_tiny_png(8, 8)), "image/png"),
    ]
    media = spark.createDataFrame(
        rows, "asset_id long, media_type string, content binary, mime string"
    )
    got = {r["asset_id"]: r for r in extract_pixel_stats(media).collect()}
    r1 = got[1]
    assert (r1["width"], r1["height"], r1["n_channels"]) == (2, 2, 3)
    assert r1["px_mean"] == 127.5
    assert r1["px_std"] == round(float(np.std([0, 255, 255, 0])), 4)
    assert (r1["thumb_w"], r1["thumb_h"]) == (2, 2)
    assert len(r1["thumb_sha256"]) == 64
    r2 = got[2]
    assert r2["width"] is None and r2["px_mean"] is None


def test_pixel_decode_rejects_degenerate_dims():
    """Zero/negative header dimensions must decode to None, not an
    empty array — an empty array's np.mean is NaN, which would land in
    px_mean as a non-NULL NaN and poison the whole-corpus avg."""
    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_image_decode,
        stdlib_pixel_decode,
    )

    assert stdlib_pixel_decode(b"P6 0 0 255\n") is None
    assert stdlib_pixel_decode(b"P6 -2 2 255\n" + bytes(12)) is None
    assert stdlib_pixel_decode(b"P5 3 0 255\n") is None
    assert stdlib_image_decode(b"P6 0 0 255\n") is None
    # zero-width BMP (width is signed; 0 and negative are both invalid)
    import struct

    for bad_w in (0, -3):
        info = struct.pack("<IiiHHI", 40, bad_w, 2, 1, 24, 0) + bytes(20)
        bmp = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info + bytes(64)
        assert stdlib_pixel_decode(bmp) is None


def test_ppm_crlf_header_not_desynced():
    """A PPM whose single post-maxval whitespace became '\\r\\n' (text-
    mode write) must decode the raster unshifted — consuming only one
    byte would read the 0x0A as the first sample."""
    from mrt_data_integration_spark.operators.multimodal import (
        stdlib_pixel_decode,
    )

    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    body = bytes(v for p in px for v in p)
    img = stdlib_pixel_decode(b"P6 2 2 255\r\n" + body)
    assert img is not None and img.tolist() == [
        [[10, 20, 30], [40, 50, 60]],
        [[70, 80, 90], [100, 110, 120]],
    ]
    # a plain '\n' separator followed by a raster that STARTS with 0x0A
    # must not lose that first sample (no false CRLF pairing)
    body2 = bytes([0x0A]) + body[1:]
    img2 = stdlib_pixel_decode(b"P6 2 2 255\n" + body2)
    assert img2 is not None and img2.ravel().tolist()[0] == 0x0A


def test_pixel_stats_null_blob_is_null_row(spark):
    """A NULL content cell takes the NULL-stats row (and the metadata
    extractor's empty-bytes path), never a task-killing TypeError."""
    from mrt_data_integration_spark.operators.multimodal import (
        extract_image_features,
        extract_pixel_stats,
    )

    rows = [
        (1, "image", bytearray(_p6_bytes(1, 1, [(9, 9, 9)])), "x"),
        (2, "image", None, "x"),
    ]
    media = spark.createDataFrame(
        rows, "asset_id long, media_type string, content binary, mime string"
    )
    got = {r["asset_id"]: r for r in extract_pixel_stats(media).collect()}
    assert got[1]["px_mean"] == 9.0
    assert got[2]["px_mean"] is None and got[2]["width"] is None
    feats = {r["asset_id"]: r for r in extract_image_features(media).collect()}
    assert feats[2]["byte_len"] == 0  # empty-bytes fallback, not a crash


def _dhash_twin(img, hash_size=8):
    """Independent python dhash: float grayscale + explicit loops."""
    import numpy as np

    g = img.astype(np.int64).sum(axis=2) if img.ndim == 3 else img.astype(np.int64)
    h, w = g.shape
    small = [
        [
            g[(y * h) // hash_size][(x * w) // (hash_size + 1)]
            for x in range(hash_size + 1)
        ]
        for y in range(hash_size)
    ]
    val = 0
    for y in range(hash_size):
        for x in range(hash_size):
            val = (val << 1) | int(small[y][x + 1] < small[y][x])
    return val - (1 << 64) if val >= 1 << 63 else val


def test_dhash_matches_python_twin_and_is_resize_stable():
    import random

    import numpy as np

    from mrt_data_integration_spark.operators.multimodal import dhash_pixels

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    assert dhash_pixels(img) == _dhash_twin(img)
    grey = rng.integers(0, 256, size=(30, 30, 1), dtype=np.uint8)
    assert dhash_pixels(grey) == _dhash_twin(grey)
    # perceptual property: a nearest-neighbor 2x upscale of the same
    # image lands on (nearly) the same hash — resize-robust by design
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    d = bin((dhash_pixels(img) ^ dhash_pixels(big)) & ((1 << 64) - 1)).count("1")
    assert d <= 2, d


def test_image_near_dup_pairs_recall_and_verify(spark):
    """Planted near-dups are found through the band join; unrelated
    images produce no pair; hamming comes back exact."""
    import numpy as np

    from mrt_data_integration_spark.operators.multimodal import (
        dhash_pixels,
        extract_image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]  # tiny edit → a few bits at most
    far = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    true_d = bin(
        (dhash_pixels(base) ^ dhash_pixels(near)) & ((1 << 64) - 1)
    ).count("1")
    assert true_d <= 3, "fixture must be a genuine near-dup"

    def p6(img):
        h, w = img.shape[:2]
        return bytearray(f"P6 {w} {h} 255\n".encode() + img.tobytes())

    media = spark.createDataFrame(
        [
            (1, "image", p6(base), "x"),
            (2, "image", p6(near), "x"),
            (3, "image", p6(far), "x"),
            (4, "image", None, "x"),  # NULL blob: hashless, never pairs
        ],
        "asset_id long, media_type string, content binary, mime string",
    )
    hashes = extract_image_dhash(media)
    got = {r["asset_id"]: r["dhash"] for r in hashes.collect()}
    assert got[1] == dhash_pixels(base) and got[4] is None
    pairs = image_near_dup_pairs(hashes, max_hamming=3).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
        (1, 2, true_d)
    ]


def test_image_near_dup_pairs_pigeonhole_guard():
    import pytest

    from mrt_data_integration_spark.operators.multimodal import (
        image_near_dup_pairs,
    )

    with pytest.raises(ValueError, match="pigeonhole"):
        image_near_dup_pairs(None, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError, match="divide"):
        image_near_dup_pairs(None, max_hamming=2, n_bands=3)


def test_resize_pixels_exact_long_side():
    """Integer scaling must hit max_side exactly — float truncation
    int(h*scale) yields max_side-1 for ~13% of sizes (e.g. 98→63)."""
    import numpy as np

    from mrt_data_integration_spark.operators.multimodal import resize_pixels

    img = np.zeros((98, 40, 3), dtype=np.uint8)
    out = resize_pixels(img, 64)
    assert out.shape[0] == 64  # not 63
    for h in range(65, 400):
        assert resize_pixels(np.zeros((h, 1, 3), np.uint8), 64).shape[0] == 64


def test_dhash_exact_in_mixed_opaque_batch(spark):
    """Regression (r8): a batch mixing opaque blobs (NULL dhash) with
    real rasters must keep every hash BIT-EXACT. The original
    mapInPandas emitted a python list with None → pandas coerced the
    column to float64 → every hash above 2^53 in that batch lost its
    low bits (off by 1..32), minting phantom near-dup pairs."""
    import numpy as np

    from mrt_data_integration_spark.operators.multimodal import (
        dhash_pixels,
        extract_image_dhash,
        synthesize_media_table,
    )

    # one partition → one Arrow batch mixing rasters and opaque blobs
    media = synthesize_media_table(
        spark, n_assets=32, real_raster_every=4
    ).coalesce(1)
    got = {
        r.asset_id: r.dhash for r in extract_image_dhash(media).collect()
    }
    for i in range(0, 32, 4):
        w, h = 32 + (i % 5) * 8, 24 + (i % 3) * 8
        v = (np.arange(w)[None, :] * 7 + np.arange(h)[:, None] * 13 + i) % 256
        img = np.repeat(v[:, :, None], 3, axis=2)
        assert got[i] == dhash_pixels(img), f"asset {i} hash not bit-exact"
    for i in range(32):
        if i % 4:
            assert got[i] is None  # opaque blobs stay NULL


def test_image_near_dup_band_cap_bounds_degenerate_corpus(spark):
    """Skew guard (r8): a gradient-heavy corpus concentrates dHashes
    into ONE value → one band bucket of size O(corpus) → O(corpus²)
    candidates. With max_band_df the hot buckets leave candidate
    generation (bounded fan-out) while pairs in cold buckets keep their
    pigeonhole recall."""
    from mrt_data_integration_spark.operators.multimodal import (
        image_near_dup_pairs,
    )

    # 60 identical hashes (the degenerate gradient block) + one planted
    # near-dup pair far away in hamming space (hashes differ in 1 bit)
    rows = [(i, 0x0123456789ABCDEF - (1 << 63)) for i in range(60)]
    rows += [(100, 42), (101, 43)]  # hamming(42,43)=1, cold buckets
    hashes = spark.createDataFrame(rows, "asset_id long, dhash long")

    uncapped = image_near_dup_pairs(hashes, max_hamming=2, n_bands=4)
    # degenerate block alone contributes C(60,2) = 1770 pairs
    assert uncapped.count() == 1770 + 1

    capped = image_near_dup_pairs(
        hashes, max_hamming=2, n_bands=4, max_band_df=10
    )
    got = {(r.id_a, r.id_b): r.hamming for r in capped.collect()}
    assert got == {(100, 101): 1}, got  # hot block dropped, cold pair kept


def test_extract_audio_features_null_blob(spark):
    """NULL content → NULL features (same NULL-in/NULL-out contract as
    the image path) — never fabricated from empty bytes."""
    from mrt_data_integration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    media = spark.createDataFrame(
        [
            (1, "audio", None, "audio/wav"),
            (2, "audio", bytearray(_tiny_wav(1, 8000, 4000)), "audio/wav"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.asset_id: r for r in extract_audio_features(media).collect()}
    assert len(rows) == 2
    r1 = rows[1]
    assert (
        r1.n_channels, r1.sample_rate, r1.n_frames, r1.duration_ms,
        r1.sha256, r1.byte_len,
    ) == (None, None, None, None, None, None)
    assert rows[2].n_frames == 4000
