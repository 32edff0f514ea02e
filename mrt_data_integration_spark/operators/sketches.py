"""Approximate-analytics sketches for corpus-scale profiling (E11).

The reference computes every summary exactly (its frames fit one R
session); at 100 TB the profiling queries themselves — distinct users,
quantiles of a skewed size distribution, heavy hitters — need
sub-linear state. Three shapes, all built on Spark's JVM-side sketch
aggregates (single scan, fixed-size partial state per partition, one
tiny merge — never a driver-side loop):

- **Heavy hitters, exact two-phase** (`heavy_hitters`): map-side
  partial counts → tiny keyed agg → broadcast total back. Exact (not a
  count-min estimate), one corpus scan, and the only full-cardinality
  frame (the per-key counts) is reduced before anything is broadcast.
- **HLL distinct, mergeable** (`hll_rollup`): per-bucket Datasketches
  HLL sketches (`hll_sketch_agg`) unioned to coarser granularities
  (`hll_union_agg`). The union of daily sketches IS the sketch of the
  union — the property that lets a 100 TB pipeline keep incremental
  per-day sketches and answer month/all-time distinct counts without
  rescanning (tests pin merged == direct).
- **Quantile/distinct profile** (`approx_profile`):
  `approx_count_distinct` (HLL++) + `percentile_approx` (Greenwald-
  Khanna) per group, with the exact twins alongside so the relative
  error is observable, not asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    min_share: float | None = None,
    weight_col: str | Column | None = None,
    uniform_multiple: float | None = None,
) -> DataFrame:
    """Exact keys whose (weighted) share of all rows clears a bar.

    Two bars, composable (a key must clear every one given):
    - ``min_share``: absolute share ≥ the constant — right when the
      key space has fixed cardinality (event types, languages);
    - ``uniform_multiple``: share ≥ multiple × (1 / #distinct keys) —
      "k× over-represented vs uniform". This is the scale-free bar for
      keys whose CARDINALITY GROWS with the corpus (users, documents):
      any absolute threshold silently converges to zero hits as per-key
      shares shrink ∝ 1/n_keys, while over-representation relative to
      uniform is invariant.

    Two phases: (1) groupBy partial-aggregates map-side, so the shuffle
    carries one row per key per input partition — never raw rows;
    (2) the grand total AND key count come from a single-row agg OVER
    THE COUNTS FRAME (no second corpus scan) broadcast back via a
    cross join. Returns (key_cols..., cnt, share) — share rounded to 6
    for cross-engine float portability; the threshold comparisons use
    the UNROUNDED share (identical IEEE ops on identical integers in
    any engine, no round-boundary ambiguity).
    """
    w = F.lit(1) if weight_col is None else F.col(weight_col) if isinstance(
        weight_col, str
    ) else weight_col
    counts = df.groupBy(*key_cols).agg(F.sum(w).alias("cnt"))
    total = counts.agg(
        F.sum("cnt").alias("__total__"), F.count(F.lit(1)).alias("__nk__")
    )
    out = counts.crossJoin(F.broadcast(total))
    # try_divide: a zero grand total (all-zero weight column) yields
    # NULL shares — every bar filters them out — instead of an ANSI
    # divide-by-zero; identical to SQL engines' x/0 → NULL.
    share = F.try_divide(F.col("cnt"), F.col("__total__"))
    if min_share is not None:
        out = out.filter(share >= min_share)
    if uniform_multiple is not None:
        out = out.filter(share >= F.lit(uniform_multiple) / F.col("__nk__"))
    return out.withColumn("share", F.round(share, 6)).drop("__total__", "__nk__")


def hll_rollup(
    df: DataFrame,
    bucket_col: Column | str,
    value_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """(per-bucket sketches, rolled-up estimate) for distinct
    ``value_col`` — the incremental-distinct shape.

    The first frame holds one HLL sketch per (group, bucket) — at scale
    these are what a pipeline persists per ingestion day (a few KB per
    row at ``lg_k``=12, ~2.5 % rel. std. error). The second unions the
    bucket sketches per group: ``hll_union_agg`` over the binary
    sketches, which equals sketching the concatenated data directly —
    HLL registers are a max per slot, and max is associative/commutative
    — so estimates never drift however the buckets are split or merged.
    """
    group_cols = group_cols or []
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    sketches = df.groupBy(*group_cols, b.alias("bucket")).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    rolled = (
        sketches.groupBy(*group_cols)
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("sketch"), F.lit(False))
            ).alias("distinct_est"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
    return sketches, rolled


def approx_profile(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    quantile_col: str,
    quantiles: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approx + exact profile in ONE pass each.

    ``approx_count_distinct`` (HLL++, default 5 % rsd) and
    ``percentile_approx`` (Greenwald-Khanna at 1/``accuracy`` rank
    error) next to their exact twins. Both sketches' merges are
    order-insensitive, so results are stable across partitionings; the
    exact columns are there so callers (and tests/test_sketches.py)
    check the error instead of trusting it. At 100 TB one drops the
    exact columns — the query shape is otherwise unchanged.
    """
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(distinct_col).alias("distinct_approx"),
        F.countDistinct(distinct_col).alias("distinct_exact"),
        F.percentile_approx(quantile_col, qs, F.lit(accuracy)).alias(
            "quantiles_approx"
        ),
        F.percentile(F.col(quantile_col), qs).alias("quantiles_exact"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_state(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    distinct_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable per-group aggregate STATE — the unit an incremental
    pipeline persists per ingestion batch: (group_cols..., n_rows,
    sum_value, user_sketch BINARY). Counts and sums merge by addition,
    the HLL sketch by union; nothing here needs the raw rows again.
    The binary sketch column survives a parquet round-trip unchanged
    (tests pin write → read → merge == direct)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_col).alias("sum_value"),
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("user_sketch"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Combine any number of rollup states into one (same schema).
    Union + one keyed agg: counts/sums add, sketches union — the
    incremental-ETL merge that replaces rescanning history. Associative
    and commutative, so batches can merge in any order or tree shape
    (daily → monthly → all-time) without drift."""
    key_cols = [
        c for c in states[0].columns
        if c not in ("n_rows", "sum_value", "user_sketch")
    ]
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*key_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_value").alias("sum_value"),
        F.hll_union_agg(F.col("user_sketch"), F.lit(False)).alias("user_sketch"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Resolve a rollup state into its report form: the sketch becomes
    a distinct estimate; counts/sums pass through."""
    return state.select(
        *[c for c in state.columns if c != "user_sketch"],
        F.hll_sketch_estimate(F.col("user_sketch"))
        .cast("long")
        .alias("distinct_est"),
    )
