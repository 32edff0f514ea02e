"""n-gram containment pairs (operators/dedup.containment_pairs):
python twin, the planted-fragment case symmetric Jaccard misses,
directional containments, hot-shingle cap, cache release."""

from __future__ import annotations

import hashlib
import random

from mrt_data_integration_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_shingles(text, n=3):
    toks = text.split(" ")
    m = max(len(toks) - (n - 1), 1)
    out = {" ".join(toks[i : i + n]) for i in range(m)}
    return {hashlib.md5(s.encode()).hexdigest()[:16] for s in out}


def _py_pairs(rows, threshold, n=3):
    sh = {i: _py_shingles(t, n) for i, t in rows}
    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            ov = inter / min(len(sh[a]), len(sh[b]))
            if ov >= threshold:
                out[(a, b)] = (
                    inter,
                    len(sh[a]),
                    len(sh[b]),
                    round(ov, 4),
                    round(inter / len(sh[a]), 4),
                    round(inter / len(sh[b]), 4),
                )
    return out


def test_containment_matches_python_twin(spark):
    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(40)
    ]
    out = dd.containment_pairs(
        _docs(spark, rows), threshold=0.3, max_shingle_df=None
    )
    got = {
        (r.id_a, r.id_b): (
            r.n_inter, r.n_a, r.n_b,
            r.overlap, r.containment_a, r.containment_b,
        )
        for r in out.collect()
    }
    dd.release_cache(out)
    assert got == _py_pairs(rows, 0.3)


def test_containment_catches_fragment_jaccard_misses(spark):
    """The raison d'être: a short quote embedded verbatim in a long
    article has overlap 1.0 (and containment_a = 1.0 on the fragment
    side) while its Jaccard is far below any dedup threshold."""
    rng = random.Random(4)
    quote = " ".join(f"q{i}" for i in range(8))
    article = " ".join(
        [f"body{i}" for i in range(300)] + [quote] + [f"tail{i}" for i in range(300)]
    )
    rows = [(1, quote), (2, article)]
    cont = dd.containment_pairs(
        _docs(spark, rows), threshold=0.9, max_shingle_df=None
    )
    got = {(r.id_a, r.id_b): r for r in cont.collect()}
    dd.release_cache(cont)
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.overlap == 1.0 and r.containment_a == 1.0
    assert r.containment_b < 0.05  # the article barely notices
    jac = dd.ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.2, max_shingle_df=None
    )
    assert jac.collect() == []  # symmetric Jaccard misses it entirely
    dd.release_cache(jac)


def test_containment_hot_shingle_cap_bounds_fanout(spark):
    """Containment has NO size-ratio join prune (by design), so the
    document-frequency cap is the only fan-out control — it must
    actually remove boilerplate-driven pairs."""
    rows = [
        (i, f"all rights reserved legal notice unique{i} tail{i} word{i}")
        for i in range(40)
    ]
    uncapped = dd.containment_pairs(
        _docs(spark, rows), threshold=0.0, max_shingle_df=None
    )
    capped = dd.containment_pairs(
        _docs(spark, rows), threshold=0.0, max_shingle_df=10
    )
    n_un, n_cap = uncapped.count(), capped.count()
    dd.release_cache(uncapped)
    dd.release_cache(capped)
    assert n_un >= 780  # C(40,2) from the shared boilerplate shingles
    assert n_cap == 0  # unique tails share nothing once the cap bites


def test_containment_plan_shape(spark):
    rows = [(i, f"a b c d e unique{i}") for i in range(30)]
    out = dd.containment_pairs(
        _docs(spark, rows), threshold=0.5, max_shingle_df=500
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    dd.release_cache(out)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan  # shingle-keyed equi-join only


def test_containment_dominates_jaccard_pointwise(spark):
    """Structural property fuzz: on any pair, jaccard <= overlap
    (|A∩B|/|A∪B| <= |A∩B|/min) with equality exactly when the two
    shingle sets coincide — so a containment screen at threshold t
    always catches at least the Jaccard-t pairs."""
    rng = random.Random(20260823)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(30)
    ]
    cont = dd.containment_pairs(
        _docs(spark, rows), threshold=0.0, max_shingle_df=None
    )
    c = {(r.id_a, r.id_b): r for r in cont.collect()}
    dd.release_cache(cont)
    jac = dd.ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.0, max_shingle_df=None
    )
    j = {(r.id_a, r.id_b): r.jaccard for r in jac.collect()}
    dd.release_cache(jac)
    assert set(j) == set(c), "same candidate pairs (shared-shingle grain)"
    for k, r in c.items():
        assert j[k] <= r.overlap + 1e-9
        if r.n_a == r.n_b == r.n_inter:
            assert j[k] == r.overlap == 1.0


def test_capped_universe_denominators(spark):
    """The capped-universe contract (docstring, r13 verdict item 4):
    under ``max_shingle_df`` EVERY reported quantity — n_a/n_b,
    n_inter, and all three ratios — is computed over the CAPPED
    shingle sets (sizes and intersections see the same universe).
    A boilerplate-heavy fragment therefore reads overlap 1.0 when all
    its DISTINCTIVE shingles are contained, even though its uncapped
    textbook containment is well below 1."""
    from collections import Counter

    cap = 5
    boiler = " ".join(f"legal{i}" for i in range(12))
    rare = " ".join(f"rare{i}" for i in range(6))
    rows = [
        # fragment: mostly boilerplate, distinctive part = the rare run
        (1, f"{boiler} {rare}"),
        # host: different filler + the same rare run embedded
        (2, " ".join([f"host{i}" for i in range(80)]) + f" {rare} "
            + " ".join([f"tail{i}" for i in range(80)])),
    ] + [
        # enough boilerplate-only docs to push its shingles past the cap
        (10 + i, boiler) for i in range(8)
    ]
    out = dd.containment_pairs(
        _docs(spark, rows), threshold=0.0, max_shingle_df=cap
    )
    got = {
        (r.id_a, r.id_b): (
            r.n_inter, r.n_a, r.n_b,
            r.overlap, r.containment_a, r.containment_b,
        )
        for r in out.collect()
    }
    dd.release_cache(out)
    # python twin with the SAME capped-universe rule
    sh = {i: _py_shingles(t) for i, t in rows}
    df = Counter(x for s in sh.values() for x in s)
    capped = {i: {x for x in s if df[x] <= cap} for i, s in sh.items()}
    want = {}
    ids = sorted(capped)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(capped[a] & capped[b])
            if inter == 0:
                continue
            want[(a, b)] = (
                inter, len(capped[a]), len(capped[b]),
                round(inter / min(len(capped[a]), len(capped[b])), 4),
                round(inter / len(capped[a]), 4),
                round(inter / len(capped[b]), 4),
            )
    assert got == want
    # the contract's sharp consequence: the fragment's denominators are
    # its capped (distinctive) size — boiler→rare boundary shingles are
    # doc-1-unique so they survive the cap, which is why the ratio is
    # high-but-not-1.0 — while the uncapped textbook ratios over the
    # full shingle sets are far lower (the inflation the docstring
    # warns production callers about).
    assert (1, 2) in got
    n_inter, n_a, n_b, overlap, c_a, _ = got[(1, 2)]
    assert n_a == len(capped[1]) and n_b == len(capped[2])
    inter_full = len(sh[1] & sh[2])
    uncapped_overlap = inter_full / min(len(sh[1]), len(sh[2]))
    uncapped_c_a = inter_full / len(sh[1])
    assert overlap >= 2 * uncapped_overlap
    assert c_a >= 2 * uncapped_c_a


def test_containment_cross_pairs_twin_and_fragment(spark):
    """Cross-corpus form: a new doc quoting a reference doc verbatim
    flags at containment_new ~ 1.0; python twin over random corpora;
    within==cross consistency on a mirrored corpus."""
    rng = random.Random(20260825)
    vocab = [f"w{i}" for i in range(25)]
    new_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 20))))
        for i in range(15)
    ]
    ref_rows = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(20)
    ]
    got = {
        (r.new_id, r.ref_id): (
            r.n_inter, r.n_new, r.n_ref, r.containment_new, r.overlap
        )
        for r in dd.containment_cross_pairs(
            _docs(spark, new_rows),
            _docs(spark, ref_rows),
            threshold=0.3,
            max_shingle_df=None,
        ).collect()
    }
    sh_new = {i: _py_shingles(t) for i, t in new_rows}
    sh_ref = {i: _py_shingles(t) for i, t in ref_rows}
    want = {}
    for a, sa in sh_new.items():
        for b, sb in sh_ref.items():
            inter = len(sa & sb)
            if inter and inter / len(sa) >= 0.3:
                want[(a, b)] = (
                    inter, len(sa), len(sb),
                    round(inter / len(sa), 4),
                    round(inter / min(len(sa), len(sb)), 4),
                )
    assert got == want
    # the fragment case: a quote of ref doc 100 ingested as new doc 1
    quote = " ".join(ref_rows[0][1].split(" ")[:8])
    frag = dd.containment_cross_pairs(
        _docs(spark, [(1, quote)]),
        _docs(spark, ref_rows),
        threshold=0.9,
        max_shingle_df=None,
    ).collect()
    assert any(
        r.ref_id == 100 and r.containment_new == 1.0 for r in frag
    )


# ---------------------------------------------------------------------------
# source_overlap_matrix (r14) — the corpus-grain form


def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _py_source_matrix(rows, cap=None):
    from collections import Counter

    per_src: dict[str, set] = {}
    for _, src, t in rows:
        if t is None:
            continue
        per_src.setdefault(src, set()).update(_py_shingles(t))
    if cap is not None:
        df = Counter(x for s in per_src.values() for x in s)
        per_src = {k: {x for x in s if df[x] <= cap} for k, s in per_src.items()}
    out = {}
    srcs = sorted(per_src)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            inter = len(per_src[a] & per_src[b])
            if inter == 0:
                continue
            na, nb = len(per_src[a]), len(per_src[b])
            out[(a, b)] = (
                inter, na, nb,
                round(inter / (na + nb - inter), 4),
                round(inter / min(na, nb), 4),
                round(inter / na, 4),
                round(inter / nb, 4),
            )
    return out


def test_source_matrix_matches_python_twin(spark):
    rng = random.Random(20260827)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (
            i,
            f"s{rng.randint(0, 5)}",
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))),
        )
        for i in range(80)
    ] + [(999, "s0", None)]
    out = dd.source_overlap_matrix(_src_docs(spark, rows))
    got = {
        (r.source_a, r.source_b): (
            r.n_shared, r.n_a, r.n_b,
            r.jaccard, r.overlap, r.containment_a, r.containment_b,
        )
        for r in out.collect()
    }
    dd.release_cache(out)
    assert got == _py_source_matrix(rows)


def test_source_matrix_flags_subset_source(spark):
    """The corpus-grain raison d'être: a source that is a strict
    subset of another reads containment 1.0 with a small jaccard —
    the same asymmetry containment_pairs flags at document grain."""
    big = [(i, "full", " ".join(f"u{i}_{j}" for j in range(12))) for i in range(40)]
    sub = [(100 + i, "subset", big[i][2]) for i in range(4)]
    other = [(200, "other", "entirely different words here now")]
    out = dd.source_overlap_matrix(_src_docs(spark, big + sub + other))
    got = {(r.source_a, r.source_b): r for r in out.collect()}
    dd.release_cache(out)
    r = got[("full", "subset")]
    assert r.overlap == 1.0 and r.containment_b == 1.0
    assert r.jaccard == round(r.n_shared / r.n_a, 4) and r.jaccard < 0.2
    assert ("full", "other") not in got  # no shared shingles at all


def test_source_matrix_cap_contract_and_plan(spark):
    """max_shingle_sources drops shingles present in more than that
    many sources BEFORE sizes and intersections (the containment
    family's capped-universe contract verbatim), and the plan stays
    lint-clean with no pair-grain shuffle wider than the source
    domain."""
    rng = random.Random(3)
    boiler = "all rights reserved legal notice"
    rows = [
        (i, f"s{i % 6}", f"{boiler} unique{i} tail{i} word{i} end{i}")
        for i in range(30)
    ]
    capped = dd.source_overlap_matrix(
        _src_docs(spark, rows), max_shingle_sources=3
    )
    got = {
        (r.source_a, r.source_b): (
            r.n_shared, r.n_a, r.n_b,
            r.jaccard, r.overlap, r.containment_a, r.containment_b,
        )
        for r in capped.collect()
    }
    dd.release_cache(capped)
    assert got == _py_source_matrix(rows, cap=3)
    full = dd.source_overlap_matrix(_src_docs(spark, rows))
    plan = full._jdf.queryExecution().executedPlan().toString()
    dd.release_cache(full)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
