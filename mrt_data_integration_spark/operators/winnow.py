"""Winnowing document fingerprints — Schleimer, Wilkerson & Aiken
(SIGMOD 2003), the MOSS local fingerprinting algorithm: hash every
word k-gram, slide a window of ``w`` consecutive hashes, and select
each window's MINIMUM. The selection guarantee (the reason winnowing
beats "every i-th hash" schemes): any common run of at least
``w + k - 1`` tokens between two documents shares at least one
selected fingerprint — so fingerprint postings find every long-enough
overlap, with expected density 2/(w+1) of the gram stream.

Position in the E3 family: MinHash/SimHash fingerprint the WHOLE
document (set-level similarity); CDC chunking splits at content-
defined anchors (span-level rewrite); winnowing is the LOCAL
guarantee-carrying selection — the right index for "find documents
sharing any ≥L-token passage" without materializing every gram.

Engine mapping, all JVM expressions (no UDFs, DuckDB-replayable):
- gram hashes ride a SINGLE combined BIGINT ``h * 2^31 + pos`` (md5
  prefix h < 2^32, so the product stays under 2^63): the numeric min
  over a window IS the (h, pos)-lexicographic argmin with ties broken
  to the LEFTMOST position (deterministic; the paper's "robust"
  variant prefers rightmost — same guarantee, either way, as long as
  the rule is fixed).
- the hash array is MATERIALIZED in its own projection and window
  lambdas touch only that column ref and their own argument (the r11
  interpreted-HOF discipline: a captured expression would re-tokenize
  per window).
- fingerprint selection is a pure map — one scan, no shuffle; the
  postings explode and the pair join shuffle ONLY (fp, doc) longs,
  never text (the skew discipline of the dedup family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.decontaminate import word_ngrams

_POS_BASE = 1 << 31  # h * 2^31 + pos stays inside BIGINT


def _fingerprint_array(
    text_col: str, k: int, w: int
) -> tuple[Column, Column]:
    """(materialize-me hash array expression, selector over the
    materialized column): callers must project the first into a column
    named ``__hs__`` and apply the second on top — the two-step select
    that keeps the gram builder out of the window lambdas."""
    grams = word_ngrams(text_col, k)
    hs = F.transform(
        grams,
        lambda g, i: (
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
            * F.lit(_POS_BASE)
            + i.cast("long")
        ),
    )
    m = F.size("__hs__")
    windows = F.transform(
        F.sequence(F.lit(1), m - (w - 1)),
        lambda j: F.array_min(F.slice(F.col("__hs__"), j, w)),
    )
    sel = (
        F.when(m >= w, F.array_distinct(windows))
        .when(m >= 1, F.array(F.array_min("__hs__")))
        .otherwise(F.array().cast("array<long>"))
    )
    return hs, sel


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exploded fingerprint postings: one row per selected fingerprint
    — (id_col, fp_hash, pos), where ``fp_hash`` is the k-gram's 32-bit
    md5-prefix hash and ``pos`` its 0-based gram offset. Documents
    shorter than ``w`` grams contribute their single minimum (the
    whole doc is one window); gram-less docs contribute nothing."""
    hs, sel = _fingerprint_array(text_col, k, w)
    return (
        docs.select(F.col(id_col), hs.alias("__hs__"))
        .select(id_col, F.explode(sel).alias("__fp__"))
        .select(
            id_col,
            # exact integer decode (ADVICE r12): the combined key is
            # non-negative (h < 2^32, pos >= 0), so an arithmetic shift
            # IS the oracle's integer `//` by construction — no
            # float-division rounding window even if the position
            # encoding ever widens toward 2^31.
            F.shiftright("__fp__", 31).alias("fp_hash"),
            (F.col("__fp__") % _POS_BASE).cast("long").alias("pos"),
        )
    )


def winnow_profile(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document fingerprint profile WITHOUT the explode — a pure
    map (one scan, zero shuffles): (id_col, n_grams, n_fps, density
    rounded to 6, min_fp, max_fp). ``density`` = n_fps / n_windows,
    expected ≈ 2/(w+1) for random text (the paper's §5 bound) — a
    corpus-health signal: density far above it means short repetitive
    docs, far below means degenerate token streams."""
    hs, sel = _fingerprint_array(text_col, k, w)
    n_grams = F.size("__hs__")
    n_windows = F.greatest(n_grams - (w - 1), F.least(n_grams, F.lit(1)))
    fp_of = lambda c: F.shiftright(c, 31)  # exact integer decode  # noqa: E731
    return (
        docs.select(F.col(id_col), hs.alias("__hs__"))
        .select(
            id_col,
            n_grams.alias("n_grams"),
            sel.alias("__sel__"),
            n_windows.alias("__nw__"),
        )
        .select(
            id_col,
            "n_grams",
            F.size("__sel__").alias("n_fps"),
            F.when(
                F.col("__nw__") > 0,
                F.round(
                    F.size("__sel__")
                    / F.col("__nw__").cast("double"),
                    6,
                ),
            ).alias("density"),
            fp_of(F.array_min("__sel__")).alias("min_fp"),
            fp_of(F.array_max("__sel__")).alias("max_fp"),
        )
    )


def winnow_candidate_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fp_df: int | None = 200,
) -> DataFrame:
    """Canonical candidate pairs (id_a < id_b, n_shared fingerprints):
    documents sharing any run of ≥ w+k-1 tokens are GUARANTEED to
    surface (the winnowing selection guarantee — pinned by test).

    The join shuffles only (fp_hash, doc) longs — bodies never move —
    and ``max_fp_df`` drops fingerprints held by more than that many
    documents before the self-join (the hot-band cap of
    `lsh_candidate_pairs`, whose band→equi-join→count physical shape
    this is verbatim on a different key; boilerplate chunks are
    exactly the degenerate fingerprints the cap exists for)."""
    fps = winnow_fingerprints(docs, k, w, id_col, text_col).select(
        F.col(id_col), "fp_hash"
    ).distinct()
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp_hash")
            .agg(F.count(F.lit(1)).alias("__df__"))
            .filter(F.col("__df__") > int(max_fp_df))
            .select("fp_hash")
        )
        fps = fps.join(F.broadcast(hot), "fp_hash", "left_anti")
    a = fps.select(F.col(id_col).alias("id_a"), "fp_hash")
    b = fps.select(F.col(id_col).alias("id_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def winnow_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Substring-level decontamination through the winnowing index —
    the >=L-token-run contamination rule (the Lee et al. / LLaMA-class
    "drop documents sharing a long verbatim run with the eval set")
    carried by the selection guarantee: any corpus document sharing a
    run of >= w+k-1 tokens with a benchmark document is GUARANTEED to
    share a selected fingerprint, while the index holds only
    ~2/(w+1) of the gram stream — the scale story vs the exact n-gram
    decontamination path, which must index EVERY gram to make the
    same promise (operators/decontaminate.py's dense-gram or
    Bloom-gated frames).

    Output: (id_col, bench_id, n_shared) for pairs sharing >=
    ``min_shared`` distinct selected fingerprints. A shared
    fingerprint IS an exact shared k-gram (md5-prefix equality; the
    2^-32 collision tail is the documented boundary, same as every
    md5-keyed operator here) at winnowed positions — so min_shared=1
    with the guarantee gives a SUPERSET of all >= w+k-1-token
    contaminations and never misses one; raising min_shared trades
    recall below the guarantee length for precision.

    Scale shape: both sides reduce to DISTINCT (doc, fp) longs before
    any join (bodies never shuffle); the benchmark side is an eval
    set — small by construction — and broadcasts
    (``broadcast_benchmark=False`` escape hatch → shuffle equi-join
    on the fingerprint key, the same gating convention as
    semantic_decontamination)."""
    bid = bench_id_col or "bench_id"
    cfp = winnow_fingerprints(corpus, k, w, id_col, text_col).select(
        F.col(id_col), "fp_hash"
    ).distinct()
    bfp = winnow_fingerprints(
        benchmark, k, w, id_col, text_col
    ).select(F.col(id_col).alias(bid), "fp_hash").distinct()
    if broadcast_benchmark:
        bfp = F.broadcast(bfp)
    return (
        cfp.join(bfp, "fp_hash")
        .groupBy(id_col, bid)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
