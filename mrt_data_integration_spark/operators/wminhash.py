"""Weighted MinHash — order-sampling signatures over WEIGHTED term
bags (Efraimidis-Spirakis exponential-race keys shared across docs;
Moulton & Jiang 2018, "Maximally consistent sampling and the Jaccard
index of probability distributions"): per hash seed, a doc's signature
slot is the term MAXIMIZING u_s(term)^(1/w), with u_s(term) a
term-keyed md5 uniform SHARED across documents. Two docs agree on a
slot with probability equal to their probability-Jaccard similarity
J_P(A, B) = Σ_t 1 / Σ_u max(wA_u/wA_t, wB_u/wB_t) — so the agreement
fraction over n_hashes seeds is an unbiased similarity estimate, and
banding on (seed, winner) is an LSH for weighted near-dup detection.

Why this exists: every signature in the dedup family (MinHash, SimHash,
fingerprints) treats a document as an UNWEIGHTED token set — a doc
sharing only stopwords with another looks as similar as one sharing
its distinctive vocabulary. Weighted signatures let tf-idf (or any
importance weighting) drive the collision probability: the
importance-weighted dedup primitive.

Scale shape: keys are map-side expressions over the exploded
(id, term, w) frame (n_hashes per row); the winner per (id, seed) is
one max_by hash aggregate (partial map-side — doc bodies never appear,
the frame holds terms and floats); pair generation is the MinHash
family's band-keyed equi-join on (seed, winner) with the same hot-band
cap. Determinism: u = md5-hex/2^32 exactly representable, keys
round(pow(u, 1/w), 12) with term tie-breaks — the A-ES
weighted_doc_sample float-proofing verbatim; weights must arrive
rounded (the caller rounds tf·idf to 6) so 1/w is cross-engine
identical.

Reference basis: the reference repo has no dedup surface; this extends
SURVEY.md §2 E3 alongside MinHash/SimHash/PPJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _uniform(seed: int, term: Column, salt: str) -> Column:
    """Term-keyed md5 uniform in [0,1): first 8 md5 hex chars / 2^32 —
    exactly representable, identical across engines and docs (the
    SHARED-clock property the collision probability rides on)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{seed}:"), term)), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )


def weighted_minhash_signatures(
    weights: DataFrame,
    id_col: str = "doc_id",
    term_col: str = "term",
    w_col: str = "w",
    n_hashes: int = 8,
    salt: str = "wmh",
) -> DataFrame:
    """(id, seed, winner): the order-sampling signature — per seed the
    term maximizing ``round(pow(u_seed(term), 1/w), 12)`` (ties to the
    LEXICOGRAPHICALLY SMALLEST term, then the rounded key rides along
    implicitly). Weights must arrive pre-rounded by the caller (so
    1/w is cross-engine identical); NULL or non-positive weights are
    FILTERED (pow semantics at w <= 0 are engine-dependent — NULL
    under Spark non-ANSI vs inf/domain-error elsewhere — and a term
    with no positive mass has no sampling probability anyway: the
    NULL-in/NULL-out convention, documented for the oracle which
    applies the same predicate).

    One max_by aggregate per (id, seed) over the n_hashes-exploded
    frame; everything before it is map-side."""
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    term = F.col(term_col)
    weights = weights.filter(F.col(w_col) > 0)
    # winner = max (key, reversed-term) — term DESC inside max picks the
    # lexicographically smallest term on key ties only if we invert;
    # instead order by (key, term) with max_by on a struct where the
    # tie-break must prefer the SMALLER term: max of (key, negated term)
    # is inexpressible for strings, so rank via min_by on
    # (-key, term)-ordered struct: struct comparison is field-by-field,
    # and (-key ASC, term ASC) min == (key DESC, term ASC) first.
    #
    # Shape (opt r14): ONE aggregate grouped by id over the UN-EXPLODED
    # (id, term, w) frame, with n_hashes min_by functions — one per
    # seed — then a posexplode of the n_hashes winners back to
    # (id, seed, winner) grain. min_by's struct ordering column forces
    # a SortAggregate (immutable buffer), so the previous
    # explode-then-group-by-(id, seed) form SORTED the n_hashes×
    # exploded frame; grouping by id alone sorts n_hashes× fewer rows
    # for the identical per-seed argmin (each min_by folds over
    # exactly the rows of its (id, seed) group). Winner values are
    # bit-identical; only the aggregation grain changed (guide §1.2 —
    # fix the shape before the per-task work).
    def _key(s: int) -> Column:
        return F.round(
            F.pow(_uniform(s, term, salt), F.lit(1.0) / F.col(w_col)), 12
        )

    ranked = (
        weights.groupBy(id_col)
        .agg(
            F.array(
                *[
                    F.min_by(
                        term,
                        F.struct(
                            (-_key(s)).alias("nk"), term.alias("t")
                        ),
                    )
                    for s in range(n_hashes)
                ]
            ).alias("__winners__")
        )
        .select(
            id_col,
            F.posexplode("__winners__").alias("seed", "winner"),
        )
    )
    return ranked


def weighted_minhash_pairs(
    weights: DataFrame,
    id_col: str = "doc_id",
    term_col: str = "term",
    w_col: str = "w",
    n_hashes: int = 8,
    min_agree: int = 2,
    max_band_df: int | None = None,
    salt: str = "wmh",
) -> DataFrame:
    """(id_a, id_b, n_agree, est_sim) for id_a < id_b agreeing on at
    least ``min_agree`` of the ``n_hashes`` signature slots;
    ``est_sim = n_agree / n_hashes`` estimates the probability-Jaccard
    similarity J_P (unbiased per slot — Moulton & Jiang 2018).

    The MinHash family's band join verbatim: signatures self-join on
    the (seed, winner) band key, agreements count per pair, and
    ``max_band_df`` drops degenerate bands (a corpus-wide dominant
    term wins some seed in MOST docs — that band's join would be
    quadratic; dropping it only LOWERS recall for pairs whose
    similarity rests on the corpus-dominant term, the same trade
    ``ngram_jaccard_pairs`` documents for hot shingles)."""
    sigs = weighted_minhash_signatures(
        weights, id_col, term_col, w_col, n_hashes, salt
    )
    if max_band_df is not None:
        band_df = sigs.groupBy("seed", "winner").agg(
            F.count(F.lit(1)).alias("__df__")
        )
        sigs = sigs.join(
            F.broadcast(
                band_df.filter(F.col("__df__") > int(max_band_df)).select(
                    "seed", "winner"
                )
            ),
            ["seed", "winner"],
            "left_anti",
        )
    a = sigs.select(
        F.col(id_col).alias("id_a"), "seed", "winner"
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"), "seed", "winner"
    )
    pairs = (
        a.join(b, ["seed", "winner"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_agree"))
        .filter(F.col("n_agree") >= int(min_agree))
        .select(
            "id_a",
            "id_b",
            "n_agree",
            (F.col("n_agree") / F.lit(float(n_hashes))).alias("est_sim"),
        )
    )
    return pairs
