"""Shared building blocks for the WCLS estimator family
(SURVEY.md §2.5): weighted fits from sufficient statistics, the spline
tilt-model ladder, and the recurring propensity cross-Hessian block.

All helpers speak (list[Column], Column) — design matrices are never
materialized; they are lists of codegen'd expressions over one scan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.glm import GlmFit, logistic_irls
from mrt_data_integration_spark.estimators.mest import SandwichBuilder
from mrt_data_integration_spark.functions.splines import bs_columns, bs_spec
from mrt_data_integration_spark.linalg import solve_wls


def prepare(
    df: DataFrame, computed: dict[str, Column], keep: list[str], persist: bool = True
) -> DataFrame:
    """Materialize computed expressions as flat columns in ONE narrow
    projection and cache the result.

    Multi-pass estimators reference design/weight columns dozens to
    hundreds of times (IRLS iterations, gram sums, score sums, Hessian
    cross-terms). Leaving them as raw expression trees makes every
    aggregate re-inline the whole tree (spline bases are ~50-node
    expressions), blowing up Catalyst analysis and codegen time — the
    dominant cost, not the data. One projection + cache turns every
    later reference into a plain attribute.

    At cluster scale the cache spills to disk per executor
    (MEMORY_AND_DISK); if evicted, lineage recomputes the projection
    from the parquet scan — correctness never depends on the cache.

    Pass ``persist=False`` when the computed columns are cheap (plain
    arithmetic): re-deriving them from the scan per pass beats paying
    the cache write — caching only wins when the columns are expensive
    (spline bases) or the passes are many (IRLS).
    """
    proj = df.select(*[F.col(k) for k in keep], *[v.alias(k) for k, v in computed.items()])
    if not persist:
        return proj
    # localCheckpoint (eager) both caches the rows AND truncates the
    # logical plan: later passes analyze a flat LogicalRDD instead of
    # re-walking the spline expression forest per aggregate — Catalyst
    # analysis of the wide sandwich/IRLS aggs was the dominant cost.
    # On a real cluster prefer a reliable checkpoint dir for fault
    # tolerance; semantics are identical. Tracked so the registry sweep
    # releases the checkpoint blocks after the fit's result is consumed.
    from mrt_data_integration_spark.cache_registry import checkpoint_tracked

    return checkpoint_tracked(proj)


def collect_cluster_stats(
    lvl1: DataFrame,
    stat_names: list[str],
    max_clusters: int | None = None,
) -> tuple[np.ndarray | None, dict[str, float], int, DataFrame | None]:
    """The one-scan estimators' shared probe/fallback over a per-cluster
    sufficient-statistics frame (one row per cluster):

    - Driver-sized cluster counts (the common case even at 100 TB rows —
      the level-1 frame has ONE row per cluster) finish in a single
      Arrow collect; ``limit(cap+1)`` is an exact probe (a result with
      ≤ cap rows IS the complete frame). Returns the per-cluster stats
      matrix so callers compute the meat in numpy.
    - Beyond the cap (≳10⁵ clusters, sized so the collect stays ≲70 MB)
      the frame stays persisted-distributed: returns ``stats=None`` plus
      the persisted handle, and callers run one more tiny agg with β as
      literals. Callers MUST unpersist (+ ``cache_registry.untrack``)
      the returned handle.

    Returns ``(stats, global_sums, n_clusters, persisted_lvl1)``.
    """
    from mrt_data_integration_spark.cache_registry import track_cache

    if max_clusters is None:  # injectable so tests can force the fallback
        max_clusters = max(65_536, 8_388_608 // max(1, len(stat_names)))
    # Scanning all partitions in the first attempt makes the limit probe
    # exactly one job instead of the incremental 1/4/16… escalation.
    # Scoped set/restore: the engine runs inside externally-created
    # sessions, so leaking this would pessimize the host's later
    # genuinely-small .limit() probes.
    conf = lvl1.sparkSession.conf
    _key = "spark.sql.limit.initialNumPartitions"
    _prev = conf.get(_key, None)
    conf.set(_key, "10000000")
    try:
        pdf = lvl1.limit(max_clusters + 1).toPandas()
    finally:
        if _prev is None:
            conf.unset(_key)
        else:
            conf.set(_key, _prev)
    if len(pdf) <= max_clusters:
        stats = np.nan_to_num(pdf[stat_names].to_numpy(dtype=float))
        g = {nm: float(v) for nm, v in zip(stat_names, stats.sum(axis=0))}
        return stats, g, stats.shape[0], None

    lvl1 = track_cache(lvl1.persist())
    glob = lvl1.agg(
        *[F.sum(nm).alias(nm) for nm in stat_names],
        F.count(F.lit(1)).alias("__n_clusters__"),
    ).collect()[0]
    g = {nm: float(glob[nm] if glob[nm] is not None else 0.0) for nm in stat_names}
    return None, g, int(glob["__n_clusters__"]), lvl1


def linear_combo(beta: np.ndarray | list[float], cols: list[Column]) -> Column:
    out = F.lit(float(beta[0])) * cols[0]
    for k in range(1, len(cols)):
        out = out + F.lit(float(beta[k])) * cols[k]
    return out


def wls_fit(
    df: DataFrame,
    design: list[Column],
    y: Column,
    weight: Column | None = None,
    mask: Column | None = None,
    extra_moments: dict[str, Column] | None = None,
) -> (
    tuple[np.ndarray, np.ndarray, int]
    | tuple[np.ndarray, np.ndarray, int, dict[str, float]]
):
    """Weighted least squares from one sufficient-statistics pass.
    Returns (beta, gram, n_rows_in_mask). ``mask`` restricts the fit to
    a row subset without a separate filtered scan.

    ``extra_moments``: named β-free row expressions whose global sums
    ride along in the SAME scan (returned as a 4th dict element). This
    is how two-stage estimators fuse their stage-2 sufficient statistics
    into the stage-1 pass: any stage-2 normal equation whose response is
    linear in stage-1 coefficients (X_rᵀ(Sβ_s) = [X_rᵀS]β_s) needs only
    β-free cross-moments, so the big table is scanned once, not twice.

    Physical plan: design/weight/y evaluate once in a projection; the
    gram + XᵀWy partials reduce per partition in BLAS via mapInPandas
    (fixed-size plan — the declarative d(d+1)/2-sum aggregate pays
    Janino compilation per call at d ≳ 10).
    """
    import pandas as pd

    d = len(design)
    w = weight
    if mask is not None:
        m = mask.cast("double")
        w = m if w is None else w * m
    cols = [c.cast("double").alias(f"x_{i}") for i, c in enumerate(design)]
    cols.append(y.cast("double").alias("__y__"))
    cols.append((w.cast("double") if w is not None else F.lit(1.0)).alias("__w__"))
    cols.append(
        (mask.cast("double") if mask is not None else F.lit(1.0)).alias("__m__")
    )
    em_names = list(extra_moments) if extra_moments else []
    cols += [
        extra_moments[nm].cast("double").alias(f"__em_{k}__")
        for k, nm in enumerate(em_names)
    ]
    proj = df.select(*cols)

    if d <= 6:
        # Small designs: one declarative agg (d(d+1)/2 + d + 1 sums)
        # stays entirely JVM-side / whole-stage-codegen — no Python
        # workers in the hot path and Janino compile is negligible at
        # this width. The wide-design path below keeps a fixed-size
        # plan instead (codegen cost grows ~d², the BLAS partial
        # doesn't).
        # SQL-string aggs: one py4j round-trip per aggregate instead of
        # ~6 per nested-Column build — expression construction, not the
        # Spark job, dominates a small fit's driver time otherwise.
        exprs = [F.expr(f"sum(__w__*x_{i}*x_{j})")
                 for i in range(d) for j in range(i, d)]
        exprs += [F.expr(f"sum(__w__*x_{i}*__y__)") for i in range(d)]
        exprs.append(F.expr("sum(__m__)"))
        exprs += [F.expr(f"sum(__em_{k}__)") for k in range(len(em_names))]
        vals = [float(v if v is not None else 0.0) for v in proj.agg(*exprs).collect()[0]]
        gram = np.zeros((d, d))
        k = 0
        for i in range(d):
            for j in range(i, d):
                gram[i, j] = gram[j, i] = vals[k]
                k += 1
        xty = np.array(vals[k : k + d])
        n = int(round(vals[k + d]))
        if extra_moments is None:
            return solve_wls(gram, xty), gram, n
        extras = dict(zip(em_names, vals[k + d + 1 :]))
        return solve_wls(gram, xty), gram, n, extras

    n_tri = d * (d + 1) // 2
    n_em = len(em_names)
    schema = (
        ", ".join(f"g_{k} double" for k in range(n_tri))
        + ", "
        + ", ".join(f"xy_{i} double" for i in range(d))
        + ", n double"
    )
    if n_em:
        schema += ", " + ", ".join(f"em_{k} double" for k in range(n_em))

    def reduce_task(batches):
        G = np.zeros((d, d))
        xy = np.zeros(d)
        n = 0.0
        em = np.zeros(n_em)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            X = pdf[[f"x_{i}" for i in range(d)]].to_numpy()
            yv = pdf["__y__"].to_numpy()
            wv = pdf["__w__"].to_numpy()
            Xw = X * wv[:, None]
            G += Xw.T @ X
            xy += Xw.T @ yv
            n += float(pdf["__m__"].sum())
            if n_em:
                em += np.nan_to_num(
                    pdf[[f"__em_{k}__" for k in range(n_em)]].to_numpy()
                ).sum(axis=0)
        if seen:
            iu = np.triu_indices(d)
            yield pd.DataFrame([list(G[iu]) + list(xy) + [n] + list(em)])

    parts = proj.mapInPandas(reduce_task, schema).toPandas()
    iu = np.triu_indices(d)
    gram = np.zeros((d, d))
    gram[iu] = parts[[f"g_{k}" for k in range(n_tri)]].to_numpy().sum(axis=0)
    gram = gram + gram.T - np.diag(np.diag(gram))
    xty = parts[[f"xy_{i}" for i in range(d)]].to_numpy().sum(axis=0)
    n = int(round(float(parts["n"].sum())))
    if extra_moments is None:
        return solve_wls(gram, xty), gram, n
    extras = dict(
        zip(em_names, parts[[f"em_{k}" for k in range(n_em)]].to_numpy().sum(axis=0))
    )
    return solve_wls(gram, xty), gram, n, extras


@dataclass
class TiltModel:
    """Fitted exponential-tilting model (methods/etwcls.R:110-137)."""

    omega: np.ndarray          # coefficients with adjusted intercept
    design: list[Column]       # X_omega columns (intercept first)
    warning: bool
    pi_internal: float
    gram: np.ndarray | None = None  # X_om' diag(mu(1-mu)) X_om at the MLE
    # NOTE: the adjusted-omega p_omega (rho*exp(X om_adj)/(1+...)) equals
    # the glm fitted mu, so this gram IS the tilt-equation Hessian block.

    @property
    def d(self) -> int:
        return len(self.omega)

    def raw_tilt(self) -> Column:
        return F.exp(linear_combo(self.omega, self.design))

    def tilt_ratios(self, is_internal: Column) -> Column:
        return F.when(is_internal, F.lit(1.0)).otherwise(self.raw_tilt())

    def p_omega(self) -> Column:
        """Implied P(internal|x) under the adjusted omega:
        rho·exp(Xω) / (1 + rho·exp(Xω)) with rho = π/(1−π)."""
        rho = self.pi_internal / (1.0 - self.pi_internal)
        num = F.lit(rho) * self.raw_tilt()
        return num / (F.lit(1.0) + num)


def _tensor_spline_design(
    df: DataFrame, x1: str, x2: str, df_: int, degree: int
) -> list[Column]:
    """model.matrix of ``is_internal ~ bs(x1)*I(bs(x2))``: intercept,
    bs(x1) cols, bs(x2) cols, all pairwise products."""
    s1 = bs_columns(F.col(x1), bs_spec(df, x1, df_, degree))
    s2 = bs_columns(F.col(x2), bs_spec(df, x2, df_, degree))
    cols: list[Column] = [F.lit(1.0)]
    cols += s1
    cols += s2
    for b2 in s2:
        for b1 in s1:
            cols.append(b1 * b2)
    return cols


def fit_tilt_ladder(
    df: DataFrame,
    is_internal: Column | str = "is_internal",
    x1: str = "x1",
    x2: str = "x2",
) -> TiltModel:
    """The reference's adaptive tilt-model complexity ladder
    (etwcls.R:112-130): bs(df=3,deg=2) tensor → on glm warning retry
    df=2 → df=1 linear. tilt_warning ⇔ final model has ≤10 coefficients.
    The fitted intercept is then offset by the sampling log-odds
    (etwcls.R:132-133)."""
    flag = (F.col(is_internal) if isinstance(is_internal, str) else is_internal).cast(
        "double"
    )
    pi_internal = float(df.agg(F.avg(flag)).collect()[0][0])

    fit: GlmFit | None = None
    design: list[Column] | None = None
    for df_, degree in [(3, 2), (2, 2), (1, 1)]:
        design = _tensor_spline_design(df, x1, x2, df_, degree)
        # Materialize the spline design once so each IRLS pass aggregates
        # plain attributes, not re-inlined spline expression trees.
        # persist=False (r4): with driver-collected IRLS the projection
        # is consumed by exactly one Arrow collect — the eager
        # localCheckpoint write per ladder rung cost more than it saved.
        # The distributed IRLS fallback (huge panels) re-derives the
        # spline exprs per iteration from the scan, which is still
        # cheaper than checkpointing the whole widened panel.
        work = prepare(
            df,
            {"__flag__": flag, **{f"__om_{k}__": c for k, c in enumerate(design)}},
            keep=[],
            persist=False,
        )
        fit = logistic_irls(
            work,
            [F.col(f"__om_{k}__") for k in range(len(design))],
            F.col("__flag__"),
        )
        if not fit.warning:
            break
    assert fit is not None and design is not None
    omega = fit.beta.copy()
    omega[0] -= math.log(pi_internal / (1.0 - pi_internal))
    return TiltModel(
        omega=omega,
        design=design,
        warning=len(omega) <= 10,
        pi_internal=pi_internal,
        gram=fit.final_gram,
    )


def add_propensity_cross_block(
    builder: SandwichBuilder,
    alpha_pos: int,
    stage_pos: list[int],
    design: list[Column],
    n_nuisance: int,
    raw_cols: list[Column],
    beta_mod: np.ndarray,
    p: Column,
    p_a: Column,
    a: Column,
    weight: Column,
    wres: Column,
) -> None:
    """The recurring Hessian cross block coupling a stage's (nuisance +
    moderated) coefficients to an intercept-only propensity equation —
    the three-term sum at wcls.R:94-97 / pwcls.R:98-101 / drwcls.R:85-88
    / petwcls.R:96-99,116-120.

    ``design`` = stage design columns (nuisance first, then moderated);
    ``raw_cols`` = the moderated columns divided by a_centered;
    ``beta_mod`` = fitted coefficients of the moderated block;
    ``weight`` = the stage's full row weight (incl. tilt if any);
    ``wres`` = weight * residual.
    """
    log_pa_deriv = (-(2.0 * a - 1.0) * p * (1.0 - p)) / p_a
    p_deriv = -(1.0 - p)
    fit_raw = linear_combo(beta_mod, raw_cols)
    for k, pos in enumerate(stage_pos):
        term = design[k] * wres * log_pa_deriv
        term = term + design[k] * (p * fit_raw * weight) * p_deriv
        if k >= n_nuisance:
            term = term + (-(p * raw_cols[k - n_nuisance]) * wres) * p_deriv
        builder.add_hessian_expr(pos, alpha_pos, term)


def masked(mask: Column, expr: Column) -> Column:
    return F.when(mask, expr).otherwise(F.lit(0.0))
