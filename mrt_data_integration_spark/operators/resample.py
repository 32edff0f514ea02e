"""Time-series regularization: per-key gap-fill onto a fixed grid.

ML feature pipelines and monitoring rollups need series on a REGULAR
grid (one row per key per hour), but event data is sparse — the
reference side-steps this because MRT decision points arrive on a
fixed schedule by design (generator.R's t = 1..T panel); production
event streams do not. ``resample_series`` densifies each key's
observed span onto a fixed-unit grid and fills the holes by
last-observation-carried-forward or linear interpolation.

Spark-first shape: the grid is ``sequence()`` + ``explode`` (JVM-side,
no UDF), the fills are two window passes sharing one (key, bucket)
sort — LOCF is ``last(ignorenulls)`` over the preceding frame, the
interpolation's next-neighbor is ``first(ignorenulls)`` over the
following frame. One shuffle on the key.

Scale contract stated plainly: densification emits span/unit rows per
key — a key observed once a year at hour grain inflates 8 760×. Bound
the span upstream (filter the window you actually train on) or coarsen
``unit``; the operator is intentionally explicit rather than silently
capping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_INTERVAL = {
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "minute": "INTERVAL 1 MINUTE",
}


def _round_half_up(col, digits: int):
    """floor(x·10^d + 0.5)/10^d — explicit IEEE arithmetic instead of
    engine round(). Spark's round() stringifies the double (shortest
    repr, then HALF_UP) while DuckDB rounds the scaled binary value;
    they disagree whenever the shortest decimal repr sits on the tie
    side opposite the binary value (measured: 5 of 2 500 interpolated
    rows at 4 digits). This formula is the same float ops in both
    engines, so identical inputs give identical outputs. Half-ties
    round toward +∞ (fine for the magnitudes here; stated contract)."""
    s = F.lit(float(10**digits))
    return F.floor(col * s + F.lit(0.5)) / s


def resample_series(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    how: str = "locf",
    agg: str = "avg",
    round_obs: int | None = 6,
    round_fill: int | None = 4,
) -> DataFrame:
    """Regularize ``(key, ts, value)`` onto a per-key ``unit`` grid.

    Steps: (1) bucket observations to ``date_trunc(unit, ts)`` and
    aggregate duplicates with ``agg`` (rounded to ``round_obs`` so the
    DuckDB oracle's float summation-order differences can't leak into
    fills); (2) explode each key's [min, max] bucket span via
    ``sequence()``; (3) left-join observations onto the grid; (4) fill:

    - ``how="locf"``: last observed value at or before the bucket.
      Never NULL: the grid spans [first observed bucket, last observed
      bucket] per key, so every grid row has an observation at or
      before it. (The fill expressions still guard the pv-NULL case so
      a future span widening can't silently mint NULLs.)
    - ``how="linear"``: linear interpolation between the previous and
      next observed buckets, weighted by time distance; holes after
      the last observation (unreachable under the current span, same
      note) take the nearest observed value.

    Returns one row per key per grid bucket:
    ``key_cols…, bucket, value_filled, is_observed``.
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")
    if how not in ("locf", "linear"):
        raise ValueError("how must be 'locf' or 'linear'")
    kt = [F.col(c) for c in key_cols]
    v = getattr(F, agg)(value_col)
    if round_obs is not None:
        v = _round_half_up(v, round_obs)
    obs = df.groupBy(
        *kt, F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(v.alias("__v__"))
    grid = (
        obs.groupBy(*kt)
        .agg(F.min("bucket").alias("__mn__"), F.max("bucket").alias("__mx__"))
        .select(
            *key_cols,
            F.explode(
                F.expr(f"sequence(__mn__, __mx__, {_UNIT_INTERVAL[unit]})")
            ).alias("bucket"),
        )
    )
    j = grid.join(obs, [*key_cols, "bucket"], "left")
    wp = (
        Window.partitionBy(*kt)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(*kt)
        .orderBy("bucket")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    pv = F.last("__v__", ignorenulls=True).over(wp)
    if how == "locf":
        filled = pv
    else:
        obs_t = F.when(F.col("__v__").isNotNull(), F.col("bucket"))
        pt = F.last(obs_t, ignorenulls=True).over(wp)
        nv = F.first("__v__", ignorenulls=True).over(wn)
        nt = F.first(obs_t, ignorenulls=True).over(wn)
        frac = (
            F.unix_timestamp(F.col("bucket")) - F.unix_timestamp(pt)
        ).cast("double") / (
            F.unix_timestamp(nt) - F.unix_timestamp(pt)
        ).cast("double")
        filled = (
            F.when(F.col("__v__").isNotNull(), F.col("__v__"))
            .when(pv.isNull(), nv)  # before first observation
            .when(nv.isNull(), pv)  # after last observation
            .otherwise(pv + (nv - pv) * frac)
        )
    if round_fill is not None:
        filled = _round_half_up(filled, round_fill)
    return j.select(
        *key_cols,
        "bucket",
        filled.alias("value_filled"),
        F.col("__v__").isNotNull().alias("is_observed"),
    )
