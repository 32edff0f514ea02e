"""Simulation-surface queries (SURVEY.md §2.7 R1-R6): synthetic panel
generation and the Monte-Carlo fan-out. Rows-only checks (stochastic
pipelines are not SQL-expressible), but fully deterministic in the
fixed seeds — per-user RNG streams make results independent of
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.simulation.harness import mc_summary, run_grid
from mrt_data_integration_spark.sources.generator import generate_panel


@query("synthetic_panel_stats")
def synthetic_panel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+R1-R3: distributed MRT panel generation (seeded, chunked
    mapInPandas) summarized per study arm."""
    panel = generate_panel(spark, seed=42, n_internal=200, n_external=200)
    return panel.groupBy("is_internal").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("a"), 4).alias("treat_rate"),
        F.round(F.avg("p_h"), 4).alias("avg_p_h"),
        F.round(F.avg("y"), 4).alias("avg_y"),
        F.round(F.stddev_pop("x1"), 4).alias("sd_x1"),
    )


@query("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver north star (multimodal columns): binary media assets →
    Arrow-batched decode/feature extraction → resize planning →
    pseudo-embeddings → REAL pixel stats for the uncompressed rasters
    (every 4th asset is a spec-valid P6; stdlib_pixel_decode parses it
    byte-exactly, opaque blobs get NULL stats) → aggregate profile.
    Every Spark-side seam — schema, partitioning, batch shape — is the
    production one; only compressed-codec pixel decode remains behind
    the decode_fn plug point."""
    from mrt_data_integration_spark.operators.multimodal import (
        embed_stub,
        extract_image_features,
        extract_pixel_stats,
        resize_plan,
        synthesize_media_table,
    )
    from mrt_data_integration_spark.operators.similarity import norm

    media = synthesize_media_table(spark, n_assets=128, real_raster_every=4)
    feats = extract_image_features(media)
    plan = resize_plan(feats, max_side=256)
    emb = embed_stub(feats)
    px = extract_pixel_stats(media, max_side=64)
    return (
        plan.join(emb, "asset_id")
        .join(px.select("asset_id", "px_mean"), "asset_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.avg("target_w"), 4).alias("avg_target_w"),
            F.round(F.avg("target_h"), 4).alias("avg_target_h"),
            F.round(F.avg(norm("embedding")), 4).alias("avg_emb_norm"),
            F.count("px_mean").alias("n_pixel_decoded"),
            F.round(F.avg("px_mean"), 4).alias("avg_px_mean"),
        )
    )


@query("wcls_large_panel")
def wcls_large_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale exercise: generate a 400k-row panel distributed (20k users
    × 20 decision points) and run the distributed WCLS fit — the
    one-big-fit physical path (sufficient-stats passes + two-level
    cluster meat) at a size where per-row work dominates overhead.
    Deterministic in the fixed seed."""
    from mrt_data_integration_spark.estimators import wcls

    from mrt_data_integration_spark.cache_registry import checkpoint_tracked

    # The input is a generative source, so materialize it once —
    # otherwise each of the fit's aggregation passes re-runs the
    # mapInPandas generation (3× the dominant cost). Tracked so the
    # registry sweep frees the 400k-row checkpoint after collection.
    panel = checkpoint_tracked(
        generate_panel(
            spark, seed=20260813, n_internal=10_000, n_external=10_000,
            users_per_chunk=625,  # 32 generation tasks = one per local core
        )
    )
    fit = wcls(
        panel,
        x_h=[
            ("intercept", F.lit(1.0)),
            ("x1", F.col("x1")),
            ("x2", F.col("x2")),
            ("x3", F.col("x3")),
        ],
        moderators=[("one", F.lit(1.0)), ("x1", F.col("x1"))],
        p_target=None,
        cluster_col="user_id",
        beta_r_true=None,
    )
    rows = [
        (name, round(float(b), 4), round(float(s), 4))
        for name, b, s in zip(fit.r_names, fit.beta_r, fit.se_beta_r)
    ]
    return spark.createDataFrame(rows, "coef string, estimate double, se double")


@query("sensitivity_scenarios")
def sensitivity_scenarios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: the sensitivity analysis — three data-generating regimes
    (sensitivity.R:368-370) through the same fan-out, each with its own
    generator parameters and true effect."""
    from mrt_data_integration_spark.simulation.harness import METHODS

    sub = {k: METHODS[k] for k in ["WCLS-Internal", "P-WCLS-Pooled", "PET-WCLS"]}
    scenarios = [
        ("linear_x2", (1.0, 2.0), {"x2_coef": 0.0}),
        ("strong_x2", (3.0, 0.0), {"x2_coef": 2.0}),
        ("quadratic_x1", (-2.0, 5.0), {"x21sq_coef": 0.3}),
    ]
    outs = []
    for label, truth, gen_kw in scenarios:
        res = run_grid(
            spark,
            size_pairs=[(50, 50)],
            n_reps=3,
            beta_r_true=truth,
            methods=sub,
            **gen_kw,
        )
        outs.append(
            mc_summary(res, beta_r_true=truth).withColumn("scenario", F.lit(label))
        )
    unioned = outs[0]
    for o in outs[1:]:
        unioned = unioned.unionByName(o)
    return unioned.select(
        "scenario",
        "method",
        "coef",
        F.round("avg_estimate", 4).alias("avg_estimate"),
        F.round("empirical_se", 4).alias("empirical_se"),
        F.round("coverage", 4).alias("coverage"),
        F.round("rel_efficiency", 4).alias("rel_efficiency"),
    )


@query("mc_simulation_grid")
def mc_simulation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4-R5 + A9-A13: the Monte-Carlo study in miniature — a seeded
    replication grid fanned out via mapInPandas (each task: generate +
    fit all 10 estimators task-locally), then the full summary
    aggregation stack (coverage, empirical SE, RMSE, relative
    efficiency vs WCLS-Internal)."""
    results = run_grid(spark, size_pairs=[(50, 50)], n_reps=4)
    summ = mc_summary(results)
    return summ.select(
        "n_internal",
        "n_external",
        "method",
        "coef",
        F.round("avg_estimate", 4).alias("avg_estimate"),
        F.round("empirical_se", 4).alias("empirical_se"),
        F.round("analytical_se", 4).alias("analytical_se"),
        F.round("rmse", 4).alias("rmse"),
        F.round("coverage", 4).alias("coverage"),
        "tilt_warnings",
        F.round("rel_efficiency", 4).alias("rel_efficiency"),
    )


# E3×E12: perceptual image dedup, driver-visible end to end — the SAME
# synthetic corpus multimodal_features pushes through pixel decode
# (every 4th asset a spec-valid P6 gradient raster), dHashed by the
# Arrow-batched map-only stage, paired by the hamming band join. The
# oracle replays the ENTIRE computation closed-form in SQL: the raster
# at (x, y) is (x*7 + y*13 + i) % 256 on all three channels
# (multimodal.synthesize_media_table), so the grayscale channel-sum
# comparison 3*v_r < 3*v_l reduces to v_r < v_l; the 8×9 grid indices
# are ys[r] = r*h//8, xs[c] = c*w//9 (multimodal._index_resample); and
# bit k (MSB-first, k = r*8 + c) is set iff g(xs[c+1], ys[r]) <
# g(xs[c], ys[r]) (multimodal.dhash_pixels). Banding is recall-lossless
# for max_hamming <= n_bands - 1 (pigeonhole), so the oracle's
# brute-force pair filter is result-identical to the banded join.
_IMAGE_DHASH_ORACLE = """
WITH assets AS (
  SELECT i AS asset_id,
         32 + (i % 5) * 8 AS w,
         24 + (i % 3) * 8 AS h
  FROM generate_series(0, 127) t(i)
  WHERE i % 4 = 0
),
bits AS (
  SELECT asset_id, k,
         CASE WHEN ((((k % 8 + 1) * w) // 9) * 7
                    + ((k // 8) * h // 8) * 13 + asset_id) % 256
                 < ((((k % 8) * w) // 9) * 7
                    + ((k // 8) * h // 8) * 13 + asset_id) % 256
              THEN 1 ELSE 0 END AS bit
  FROM assets, generate_series(0, 63) g(k)
),
halves AS (
  -- 64-bit pack in two 32-bit halves: hi/lo stay < 2^32, and the
  -- signed two's-complement fold keeps every product inside BIGINT
  SELECT asset_id,
         SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << (31 - k)) ELSE 0 END) AS hi,
         SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (63 - k)) ELSE 0 END) AS lo
  FROM bits GROUP BY asset_id
),
hashes AS (
  SELECT asset_id,
         (CASE WHEN hi >= (1::BIGINT << 31) THEN hi - (1::BIGINT << 32)
               ELSE hi END) * 4294967296 + lo AS dhash
  FROM halves
)
SELECT a.asset_id AS id_a, b.asset_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
"""


@query("image_near_dup_pairs", oracle=_IMAGE_DHASH_ORACLE)
def image_near_dup_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3×E12: perceptual image dedup — REAL P6 pixel decode → dHash
    (map-only, blobs never shuffle) → hamming band join (n_bands=8
    covers max_hamming=6 by pigeonhole) → bit_count verify. 18 genuine
    near-dup pairs exist in the 32-raster corpus (the +60 gray-offset
    twins share every comparison except mod-256 wrap crossings)."""
    from mrt_data_integration_spark.operators.multimodal import (
        extract_image_dhash,
        image_near_dup_pairs,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, n_assets=128, real_raster_every=4)
    hashes = extract_image_dhash(media)
    return image_near_dup_pairs(hashes, max_hamming=6, n_bands=8)
