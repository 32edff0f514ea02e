"""Synthetic MRT panel generator (SURVEY.md §2.1 S4, §2.7 R1-R3).

Semantics parity: generate_data.R:2-94 — AR(1) covariate and noise,
Student-t covariate shocks, logistic randomization, the same outcome
model and column set. Two physical forms, one distribution:

- ``generate_panel_pdf``: numpy kernel producing a pandas DataFrame for
  a user-id range. Deterministic in (seed, user range). This is the
  task-local path used inside the Monte-Carlo fan-out.
- ``generate_panel``: distributed — splits the user range into chunks,
  fans the kernel out via ``mapInPandas`` (Arrow-batched), and returns
  a DataFrame of n·t_max rows keyed by (user_id, t). At 100 TB-scale
  panel sizes each chunk is one task; no driver materialization.

Deviation from the reference (deliberate, documented): the reference
draws ONE long AR(1) series and splits it across users
(generate_data.R:15-21), leaking a little cross-user dependence and
making values depend on global row order. Here each user's AR(1) series
starts from its stationary distribution, seeded per user — the
distribution the reference's own burn-in approximates, and the only
order-free definition that parallelizes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PANEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t", LongType()),
        StructField("is_internal", BooleanType()),
        StructField("is_external", BooleanType()),
        StructField("x1", DoubleType()),
        StructField("x2", DoubleType()),
        StructField("x3", DoubleType()),
        StructField("p_h", DoubleType()),
        StructField("p_h_a", DoubleType()),
        StructField("a_logical", BooleanType()),
        StructField("a", DoubleType()),
        StructField("epsilon", DoubleType()),
        StructField("treatment_effect", DoubleType()),
        StructField("y", DoubleType()),
        StructField("ones", DoubleType()),
    ]
)


def _ar1_paths(
    rngs: list[np.random.Generator], t_max: int, ar: float
) -> np.ndarray:
    """(n_users, t_max) stationary AR(1) paths, one independent RNG per
    user (order- and chunk-invariant)."""
    n = len(rngs)
    innov = np.stack([r.standard_normal(t_max) for r in rngs])
    x = np.empty((n, t_max))
    x[:, 0] = innov[:, 0] / np.sqrt(1.0 - ar * ar)
    for t in range(1, t_max):
        x[:, t] = ar * x[:, t - 1] + innov[:, t]
    return x


def generate_panel_pdf(
    seed: int,
    user_start: int,
    n_users_chunk: int,
    n_internal: int,
    t_max: int = 20,
    dof: float = 10.0,
    ar_param: float = 0.5,
    x2_coef: float = -3.0,
    x21sq_coef: float = 0.0,
) -> pd.DataFrame:
    """Generate rows for users [user_start, user_start + n_users_chunk)
    of a panel whose first ``n_internal`` users are internal.

    Each user has an independent RNG seeded (seed, user_id), so ANY
    chunking of the user range yields byte-identical rows — generation
    is order- and partition-free (the distributed and task-local paths
    produce the same panel).
    """
    nu = n_users_chunk
    user_ids = np.arange(user_start, user_start + nu)
    rngs = [
        np.random.default_rng(np.random.SeedSequence([seed, int(u)]))
        for u in user_ids
    ]
    is_int_user = user_ids <= n_internal  # user_id is 1-based
    is_int = np.repeat(is_int_user[:, None], t_max, axis=1)

    x1 = _ar1_paths(rngs, t_max, ar_param)
    t_x2 = np.stack([r.standard_t(dof, t_max) for r in rngs])
    x2 = np.where(
        is_int,
        1.0 - x1 + x21sq_coef * x1**2 + 3.0 * t_x2,
        2.7 * t_x2,
    )
    x3 = -1.0 + 0.5 * x1 - 0.8 * x2 + np.stack([r.standard_t(dof, t_max) for r in rngs])
    # generate_data.R:47-48 — logistic of the NEGATED linear predictor.
    p_h = 1.0 / (
        1.0 + np.exp(0.2 + 0.3 * is_int + 0.05 * x1 - 0.03 * x2 + 0.06 * x3)
    )
    a_logical = np.stack([r.uniform(size=t_max) for r in rngs]) < p_h
    a = a_logical.astype(float)
    p_h_a = a * p_h + (1.0 - a) * (1.0 - p_h)
    epsilon = _ar1_paths(rngs, t_max, ar_param)
    te = 1.0 + 2.0 * x1 + x2_coef * x2
    y = 4.0 + 2.0 * x1 - 1.5 * x1 * x2 + 0.4 * x3**3 + a * te + epsilon

    t_idx = np.tile(np.arange(1, t_max + 1), nu)
    flat = lambda m: m.reshape(-1)  # noqa: E731  (row-major: user-major order)
    return pd.DataFrame(
        {
            "user_id": np.repeat(user_ids, t_max),
            "t": t_idx,
            "is_internal": flat(is_int),
            "is_external": ~flat(is_int),
            "x1": flat(x1),
            "x2": flat(x2),
            "x3": flat(x3),
            "p_h": flat(p_h),
            "p_h_a": flat(p_h_a),
            "a_logical": flat(a_logical),
            "a": flat(a),
            "epsilon": flat(epsilon),
            "treatment_effect": flat(te),
            "y": flat(y),
            "ones": np.ones(nu * t_max),
        }
    )


def generate_panel(
    spark: SparkSession,
    seed: int,
    n_internal: int,
    n_external: int,
    t_max: int = 20,
    dof: float = 10.0,
    ar_param: float = 0.5,
    x2_coef: float = -3.0,
    x21sq_coef: float = 0.0,
    users_per_chunk: int = 10_000,
) -> DataFrame:
    """Distributed panel generation: one task per user chunk."""
    n = n_internal + n_external
    starts = list(range(1, n + 1, users_per_chunk))
    chunks = spark.createDataFrame(
        [(s, min(users_per_chunk, n + 1 - s)) for s in starts],
        "user_start long, n_users long",
    ).repartition(max(1, len(starts)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                yield generate_panel_pdf(
                    seed=seed,
                    user_start=int(row.user_start),
                    n_users_chunk=int(row.n_users),
                    n_internal=n_internal,
                    t_max=t_max,
                    dof=dof,
                    ar_param=ar_param,
                    x2_coef=x2_coef,
                    x21sq_coef=x21sq_coef,
                )

    return chunks.mapInPandas(gen, PANEL_SCHEMA)
