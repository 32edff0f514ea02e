"""Two-sample distribution-drift statistics — the Kolmogorov-Smirnov
profile between two corpus slices (ingest-monitoring QA: "did this
crawl's length/quality distribution move?", the check every
continuously-ingested training corpus runs between releases; the KS
statistic is the classic distribution-free two-sample test,
Kolmogorov 1933 / Smirnov 1939).

Scale design — the naive formulation (global sort of ALL observations,
one running rank window) is a single-partition bottleneck at corpus
scale. The engine's shape instead:

1. collapse to the VALUE GRAIN first: one partial-agg hash shuffle
   produces (value, n_a, n_b) — a table bounded by the value DOMAIN
   (a length in characters, a bucketed score), not the corpus;
2. the empirical-CDF running sums then run a global window over that
   bounded table (the exact_percentiles precedent: a global window is
   sanctioned exactly when its input is domain-bounded — document
   lengths, not documents);
3. totals ride a 1-row crossJoin broadcast (the DSIR/BM25 pattern).

Continuous-valued columns must be bucketed by the caller before the
profile (the same contract as every fixed-width histogram here); the
KS statistic of the bucketed profile lower-bounds the unbucketed one.

All integer counts; the only divisions are the two final CDF ratios,
rounded to 6 (the float-combination discipline) — fully
SQL-replayable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_sample_ks_profile(
    df: DataFrame,
    value_col: str,
    in_a: Column,
) -> DataFrame:
    """The CDF-difference profile between the ``in_a`` slice (sample
    A) and its complement (sample B) over ``value_col``: one row per
    DISTINCT value — (value_col, n_a, n_b, cdf_a, cdf_b, ks_term =
    |cdf_a − cdf_b|, all CDFs rounded to 6). ``max(ks_term)`` IS the
    two-sample KS statistic; emitting the whole profile keeps the
    drift LOCATION visible (which lengths moved), not just the
    magnitude, and gives the oracle a full surface to hash.

    Rows with a NULL value are excluded (a CDF has no place for
    them); an empty side yields NULL CDFs for that side (no
    silent 0/0)."""
    return ks_profile_from_value_counts(
        value_counts(df, value_col, in_a), value_col
    )


def value_counts(
    df: DataFrame, value_col: str, in_a: Column
) -> DataFrame:
    """The KS profile's MERGEABLE sufficient statistic: one row per
    non-NULL distinct value — (__v__, n_a, n_b) counts; two such
    frames merge by unioning and summing per value (counts add) —
    shared with :func:`category_counts` via the same shape."""
    flagged = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("__v__"),
        in_a.cast("boolean").alias("__a__"),
    )
    return flagged.groupBy("__v__").agg(
        F.count(F.when(F.col("__a__"), 1)).alias("n_a"),
        F.count(F.when(~F.col("__a__"), 1)).alias("n_b"),
    )


def merge_value_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union-sum merge of two :func:`value_counts` states."""
    return (
        a.unionByName(b)
        .groupBy("__v__")
        .agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("n_b").cast("long").alias("n_b"),
        )
    )


def ks_profile_from_value_counts(
    per_value: DataFrame, value_col: str
) -> DataFrame:
    """Finalize a value-grain counts state into the KS profile. The
    totals are the state's own column sums (equal to the raw-row
    counts by construction), so a batch profile and a streaming
    drain's merged state finalize through the SAME expressions."""
    totals = per_value.agg(
        F.coalesce(F.sum("n_a"), F.lit(0))
        .cast("double")
        .alias("__ta__"),
        F.coalesce(F.sum("n_b"), F.lit(0))
        .cast("double")
        .alias("__tb__"),
    )
    w = Window.orderBy("__v__").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf_a = F.when(
        F.col("__ta__") > 0,
        F.round(F.sum("n_a").over(w) / F.col("__ta__"), 6),
    )
    cdf_b = F.when(
        F.col("__tb__") > 0,
        F.round(F.sum("n_b").over(w) / F.col("__tb__"), 6),
    )
    return (
        per_value.crossJoin(F.broadcast(totals))  # 1 row: constants
        .select(
            F.col("__v__").alias(value_col),
            "n_a",
            "n_b",
            cdf_a.alias("cdf_a"),
            cdf_b.alias("cdf_b"),
        )
        .withColumn(
            "ks_term",
            F.round(F.abs(F.col("cdf_a") - F.col("cdf_b")), 6),
        )
    )


def ks_statistic(profile: DataFrame) -> float:
    """max ks_term of a :func:`two_sample_ks_profile` frame — the
    two-sample KS statistic (driver-side scalar; the profile is the
    distributed artifact)."""
    row = profile.agg(F.max("ks_term").alias("ks")).collect()[0]
    return float(row.ks) if row.ks is not None else float("nan")


def category_drift_profile(
    df: DataFrame,
    cat_col: str,
    in_a: Column,
) -> DataFrame:
    """CATEGORICAL drift between the ``in_a`` slice (sample A) and its
    complement (sample B) over ``cat_col`` — the discrete complement
    of :func:`two_sample_ks_profile` (a CDF needs an ordered domain;
    language / source / topic labels have none): one row per category
    present in either slice — (cat_col, n_a, n_b, frac_a, frac_b,
    psi_term, chi2_term).

    ``sum(psi_term)`` IS the Population Stability Index (the
    score-monitoring standard: PSI < 0.1 stable, > 0.25 action) and
    ``sum(chi2_term)`` the Pearson two-sample chi-square statistic
    (homogeneity test, df = k − 1); emitting the per-category profile
    keeps the drift LOCATION visible (which language moved), the same
    contract as the KS profile.

    Term semantics (all rounded to 6, the float-combination
    discipline):
    - ``frac_a/frac_b``: category share of its slice; NULL when that
      slice is empty (no silent 0/0).
    - ``psi_term`` = (frac_a − frac_b) · ln(frac_a / frac_b); NULL
      when either side's count is zero — PSI is undefined at empty
      cells (callers smooth or bucket rare categories first; an
      honest NULL beats an invented epsilon).
    - ``chi2_term`` = Σ_side (observed − expected)² / expected with
      expected from the pooled margin — defined whenever both slice
      totals are positive (zero cells are fine here).

    Rows with a NULL category are excluded (same convention as the
    KS profile's NULL values).

    Scale shape: one partial-agg hash shuffle to the CATEGORY grain
    (bounded by the label domain, not the corpus), totals on a 1-row
    crossJoin broadcast; no window at all — strictly cheaper than the
    KS profile at any scale.
    """
    return profile_from_category_counts(
        category_counts(df, cat_col, in_a), cat_col
    )


def category_counts(
    df: DataFrame, cat_col: str, in_a: Column
) -> DataFrame:
    """The drift profile's MERGEABLE sufficient statistic: one row per
    non-NULL category — (__c__, n_a, n_b) counts. Two such frames
    merge by unioning and summing per category (counts add), which is
    what the streaming drain does per micro-batch."""
    flagged = df.filter(F.col(cat_col).isNotNull()).select(
        F.col(cat_col).alias("__c__"),
        in_a.cast("boolean").alias("__a__"),
    )
    return flagged.groupBy("__c__").agg(
        F.count(F.when(F.col("__a__"), 1)).alias("n_a"),
        F.count(F.when(~F.col("__a__"), 1)).alias("n_b"),
    )


def merge_category_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union-sum merge of two :func:`category_counts` states."""
    return (
        a.unionByName(b)
        .groupBy("__c__")
        .agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("n_b").cast("long").alias("n_b"),
        )
    )


def profile_from_category_counts(
    per_cat: DataFrame, cat_col: str
) -> DataFrame:
    """Finalize a counts state into the drift profile. The totals are
    the state's own column sums (equal to the raw-row counts by
    construction), so a batch profile and a streaming drain's merged
    state finalize through the SAME expressions — identical rounded
    doubles, not merely close ones."""
    totals = per_cat.agg(
        F.coalesce(F.sum("n_a"), F.lit(0))
        .cast("double")
        .alias("__ta__"),
        F.coalesce(F.sum("n_b"), F.lit(0))
        .cast("double")
        .alias("__tb__"),
    )
    fa = F.when(F.col("__ta__") > 0, F.col("n_a") / F.col("__ta__"))
    fb = F.when(F.col("__tb__") > 0, F.col("n_b") / F.col("__tb__"))
    psi = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        (fa - fb) * F.log(fa / fb),
    )
    ea = (
        (F.col("n_a") + F.col("n_b"))
        * F.col("__ta__")
        / (F.col("__ta__") + F.col("__tb__"))
    )
    eb = (
        (F.col("n_a") + F.col("n_b"))
        * F.col("__tb__")
        / (F.col("__ta__") + F.col("__tb__"))
    )
    chi2 = F.when(
        (F.col("__ta__") > 0) & (F.col("__tb__") > 0),
        (F.col("n_a") - ea) ** 2 / ea + (F.col("n_b") - eb) ** 2 / eb,
    )
    return per_cat.crossJoin(F.broadcast(totals)).select(
        F.col("__c__").alias(cat_col),
        "n_a",
        "n_b",
        F.round(fa, 6).alias("frac_a"),
        F.round(fb, 6).alias("frac_b"),
        F.round(psi, 6).alias("psi_term"),
        F.round(chi2, 6).alias("chi2_term"),
    )


def psi_statistic(profile: DataFrame) -> float:
    """sum(psi_term) of a :func:`category_drift_profile` frame — the
    Population Stability Index (driver-side scalar; NULL terms — empty
    cells — are skipped by the sum, matching the smoothed-PSI
    convention of dropping undefined cells)."""
    row = profile.agg(F.sum("psi_term").alias("psi")).collect()[0]
    return float(row.psi) if row.psi is not None else float("nan")


def source_js_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_v: int = 10000,
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between every two sources'
    unigram distributions — the DISTRIBUTIONAL complement of the
    set-overlap audit (two sources can share most of their vocabulary
    yet use it at very different rates: the overlap matrix reads
    similar, THIS matrix reads drifted) and the all-pairs form of the
    two-slice drift profiles (Lin 1991; JS is symmetric, bounded by
    ln 2, and defined for zero-probability cells — no smoothing
    constant to pick). One row per unordered source pair:
    (source_a < source_b, n_common (shared support buckets), js
    rounded 6). js = 0 for identical distributions, ln 2 ≈ 0.6931 for
    disjoint support; pairs sharing nothing still appear (at ln 2).

    VOCABULARY CAP: probabilities are computed over the global
    top-``top_v`` tokens (freq DESC, token tie — the zipf ranking)
    with every other token folded into one ``__oov__`` bucket per
    source. The capped statistic is itself exact and engine-replayable
    (the capped-universe convention); it lower-bounds the uncapped JS
    (bucketing is a deterministic coarsening, and coarsening never
    increases an f-divergence). The cap is what bounds EVERY per-pair
    structure at a config constant — without it the per-pair fold
    arrays grow with the open vocabulary.

    Scale shape: one (source, token) hash aggregate (bounded by
    |S| × vocab), the global top-V via the two-phase bounded_topk
    (never a vocabulary-wide single-reducer window), a re-aggregate to
    (source, bucket) ≤ |S|·(V+1) rows, then a bucket-keyed pair join
    whose fan-out per bucket is ≤ |S|²; the three float sums per pair
    (Σ term, Σ p_a, Σ p_b over the shared support) fold SEQUENTIALLY
    over bucket-sorted arrays ≤ V+1 long (order-pinned, the zipf
    discipline), with the disjoint-support mass closed-form:
    js = Σ_shared 0.5·[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
       + 0.5·(1−P_shared)·ln2 + 0.5·(1−Q_shared)·ln2.
    Each ln rounds to 12 before combining (the engine's cross-libm
    log discipline); totals and the |S|²-bounded pair frame never
    touch corpus-sized data.
    """
    from mrt_data_integration_spark.operators.similarity import bounded_topk
    from mrt_data_integration_spark.operators.text import tokens

    ln2 = round(math.log(2.0), 12)
    tok = (
        docs.filter(
            F.col(text_col).isNotNull() & F.col(source_col).isNotNull()
        )
        .select(
            F.col(source_col).alias("source"),
            F.explode(tokens(text_col)).alias("token"),
        )
    )
    cnt = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    glob = cnt.groupBy("token").agg(F.sum("n").alias("gn"))
    top = bounded_topk(
        glob.withColumn("__k__", F.lit(0)),
        int(top_v),
        "gn",
        rank_col="__r__",
        key_col="__k__",
        tie_col="token",
    ).select("token", F.lit(True).alias("__kept__"))
    bucketed = (
        cnt.join(top, "token", "left")
        .select(
            "source",
            F.when(F.col("__kept__"), F.col("token"))
            .otherwise(F.lit("__oov__"))
            .alias("bucket"),
            "n",
        )
        .groupBy("source", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    totals = bucketed.groupBy("source").agg(
        F.sum("n").cast("long").alias("t")
    )
    p = bucketed.join(totals, "source").select(
        "source", "bucket", (F.col("n") / F.col("t")).alias("p")
    )
    a = p.select(
        F.col("source").alias("source_a"),
        "bucket",
        F.col("p").alias("pa"),
    )
    b = p.select(
        F.col("source").alias("source_b"),
        "bucket",
        F.col("p").alias("pb"),
    )
    rln = lambda x: F.round(F.log(x), 12)  # noqa: E731
    term = 0.5 * (
        F.col("pa") * rln(2 * F.col("pa") / (F.col("pa") + F.col("pb")))
        + F.col("pb") * rln(2 * F.col("pb") / (F.col("pa") + F.col("pb")))
    )
    shared = (
        a.join(b, "bucket")
        .filter(F.col("source_a") < F.col("source_b"))
        .select("source_a", "source_b", "bucket", term.alias("term"), "pa", "pb")
    )
    # bucket-ordered sequential fold of the three float sums
    arr = F.sort_array(
        F.collect_list(F.struct("bucket", "term", "pa", "pb"))
    )
    init = F.struct(
        F.lit(0.0).alias("st"),
        F.lit(0.0).alias("sa"),
        F.lit(0.0).alias("sb"),
    )
    folded = F.aggregate(
        arr,
        init,
        lambda acc, e: F.struct(
            (acc["st"] + e["term"]).alias("st"),
            (acc["sa"] + e["pa"]).alias("sa"),
            (acc["sb"] + e["pb"]).alias("sb"),
        ),
    )
    stats = shared.groupBy("source_a", "source_b").agg(
        folded.alias("__s__"),
        F.count(F.lit(1)).alias("n_common"),
    )
    srcs = totals.select("source")
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            F.broadcast(srcs.select(F.col("source").alias("source_b"))),
            F.col("source_a") < F.col("source_b"),
        )
    )
    js = F.round(
        F.coalesce(F.col("__s__.st"), F.lit(0.0))
        + 0.5 * (1 - F.coalesce(F.col("__s__.sa"), F.lit(0.0))) * F.lit(ln2)
        + 0.5 * (1 - F.coalesce(F.col("__s__.sb"), F.lit(0.0))) * F.lit(ln2),
        6,
    )
    return (
        pairs.join(stats, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            js.alias("js"),
        )
    )
