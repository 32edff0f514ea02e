"""Idf-weighted shingle-cosine neighbors (operators/docsim): python
twin, the boilerplate-downweighting separation unweighted Jaccard
cannot make, capped-universe contract, determinism, plan shape,
cache release."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

from mrt_data_integration_spark.operators import docsim as ds
from mrt_data_integration_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_shingles(text, n=3):
    toks = text.split(" ")
    m = max(len(toks) - (n - 1), 1)
    out = {" ".join(toks[i : i + n]) for i in range(m)}
    return {hashlib.md5(s.encode()).hexdigest()[:16] for s in out}


def _py_topk(rows, k=3, threshold=0.05, n=3, cap=None):
    """Twin of idf_cosine_topk: smoothed idf ln((1+N)/(1+df)) rounded
    12, zero-weight prune, VALUE-ordered float folds (the operator
    sorts the summands themselves), cosine rounded 6 before ranking,
    ties (cosine DESC, neighbor ASC)."""
    sh = {i: _py_shingles(t, n) for i, t in rows if t is not None}
    n_docs = len(sh)
    df = Counter(s for ss in sh.values() for s in ss)
    # dropping hot shingles does not change the df of survivors, so
    # idf uses the same df either way (the operator caps BEFORE the
    # df window for the same reason)
    if cap is not None:
        sh = {i: {s for s in ss if df[s] <= cap} for i, ss in sh.items()}
    w = {
        s: round(math.log((1 + n_docs) / (1 + c)), 12)
        for s, c in df.items()
        if (cap is None or c <= cap)
    }
    w = {s: v for s, v in w.items() if v != 0.0}
    vec = {i: {s for s in ss if s in w} for i, ss in sh.items()}
    norms = {}
    for i, ss in vec.items():
        acc = 0.0
        for v in sorted(w[s] * w[s] for s in ss):
            acc += v
        norms[i] = acc
    nbrs = {i: [] for i in vec}
    ids = sorted(vec)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = vec[a] & vec[b]
            if not inter:
                continue
            dot = 0.0
            for v in sorted(w[s] * w[s] for s in inter):
                dot += v
            cos = round(dot / (math.sqrt(norms[a]) * math.sqrt(norms[b])), 6)
            if cos >= threshold:
                nbrs[a].append((b, len(inter), cos))
                nbrs[b].append((a, len(inter), cos))
    out = {}
    for i, lst in nbrs.items():
        lst.sort(key=lambda t: (-t[2], t[0]))
        for rank, (nb, n_shared, cos) in enumerate(lst[:k], start=1):
            out[(i, rank)] = (nb, n_shared, cos)
    return out


def test_idf_topk_matches_python_twin(spark):
    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 35))))
        for i in range(35)
    ]
    out = ds.idf_cosine_topk(
        _docs(spark, rows), k=3, threshold=0.05, max_shingle_df=None
    )
    got = {
        (r.doc_id, r.rank): (r.neighbor_id, r.n_shared, r.cosine)
        for r in out.collect()
    }
    dd.release_cache(out)
    assert got == _py_topk(rows, k=3, threshold=0.05)
    assert len(got) > 0


def test_idf_downweights_boilerplate_to_zero(spark):
    """The family's reason to exist: docs sharing ONLY a corpus-wide
    boilerplate shingle never pair (its idf is exactly 0 → pruned),
    while docs sharing one rare shingle rank each other #1 — the
    separation unweighted Jaccard cannot make (it scores both kinds
    of overlap alike)."""
    rows = []
    for i in range(8):
        extra = " r1 r2 r3" if i in (3, 4) else ""
        rows.append(
            (i, f"u{i}a u{i}b u{i}c b1 b2 b3 u{i}d u{i}e{extra}")
        )
    out = ds.idf_cosine_topk(
        _docs(spark, rows), k=3, threshold=0.0, max_shingle_df=None
    )
    got = {(r.doc_id, r.neighbor_id): r.cosine for r in out.collect()}
    dd.release_cache(out)
    # every doc shares "b1 b2 b3" with every other (its Jaccard is
    # positive for all pairs) — but only the rare-shingle pair appears
    assert set(got) == {(3, 4), (4, 3)}
    assert got[(3, 4)] == got[(4, 3)] > 0
    jac = dd.ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.0, max_shingle_df=None
    )
    j = {(r.id_a, r.id_b): r.jaccard for r in jac.collect()}
    dd.release_cache(jac)
    assert j[(0, 1)] > 0, "Jaccard DOES pair the boilerplate-only docs"


def test_idf_topk_capped_universe_matches_twin(spark):
    """Under max_shingle_df every downstream quantity (weights, norms,
    dots, n_shared) sees the capped shingle universe — the
    same-universe convention, twinned exactly."""
    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(30)
    ]
    cap = 6
    out = ds.idf_cosine_topk(
        _docs(spark, rows), k=4, threshold=0.0, max_shingle_df=cap
    )
    got = {
        (r.doc_id, r.rank): (r.neighbor_id, r.n_shared, r.cosine)
        for r in out.collect()
    }
    dd.release_cache(out)
    assert got == _py_topk(rows, k=4, threshold=0.0, cap=cap)


def test_idf_topk_deterministic(spark):
    rng = random.Random(20260818)
    vocab = [f"w{i}" for i in range(20)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30))))
        for i in range(40)
    ]
    runs = []
    for _ in range(2):
        out = ds.idf_cosine_topk(_docs(spark, rows), k=3, threshold=0.02)
        runs.append(sorted(tuple(r) for r in out.collect()))
        dd.release_cache(out)
    assert runs[0] == runs[1]


def test_idf_topk_plan_shape(spark):
    rows = [(i, f"a b c d e unique{i} tail{i}") for i in range(30)]
    out = ds.idf_cosine_topk(_docs(spark, rows), k=3, threshold=0.05)
    plan = out._jdf.queryExecution().executedPlan().toString()
    dd.release_cache(out)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan  # shingle-keyed equi-join only


def test_idf_topk_null_text_dropped(spark):
    rows = [
        (0, "x1 x2 x3 s1 s2 s3"),
        (1, None),
        (2, "y1 y2 y3 s1 s2 s3"),
        # third real doc so the shared shingle's df < N (idf > 0)
        (3, "z1 z2 z3 q1 q2 q3"),
    ]
    out = ds.idf_cosine_topk(
        _docs(spark, rows), k=3, threshold=0.0, max_shingle_df=None
    )
    got = {(r.doc_id, r.neighbor_id) for r in out.collect()}
    dd.release_cache(out)
    assert got == {(0, 2), (2, 0)}


def _py_cross_topk(batch_rows, ref_rows, k=3, threshold=0.05, n=3, cap=None):
    """Twin of idf_cross_topk: reference-side idf statistics, OOV
    batch shingles dropped, consistent-universe norms, value-ordered
    folds, rounded cosine, ties (cosine DESC, ref ASC)."""
    ref_sh = {i: _py_shingles(t, n) for i, t in ref_rows if t is not None}
    n_ref = len(ref_sh)
    df = Counter(s for ss in ref_sh.values() for s in ss)
    if cap is not None:
        ref_sh = {i: {s for s in ss if df[s] <= cap} for i, ss in ref_sh.items()}
    w = {
        s: round(math.log((1 + n_ref) / (1 + c)), 12)
        for s, c in df.items()
        if (cap is None or c <= cap)
    }
    w = {s: v for s, v in w.items() if v != 0.0}
    ref_vec = {i: {s for s in ss if s in w} for i, ss in ref_sh.items()}
    batch_vec = {
        i: {s for s in _py_shingles(t, n) if s in w}
        for i, t in batch_rows
        if t is not None
    }
    def n2(ss):
        acc = 0.0
        for v in sorted(w[s] * w[s] for s in ss):
            acc += v
        return acc
    out = {}
    for q, qs in batch_vec.items():
        if not qs:
            continue
        cands = []
        for r, rs in ref_vec.items():
            inter = qs & rs
            if not inter:
                continue
            dot = 0.0
            for v in sorted(w[s] * w[s] for s in inter):
                dot += v
            cos = round(dot / (math.sqrt(n2(qs)) * math.sqrt(n2(rs))), 6)
            if cos >= threshold:
                cands.append((r, len(inter), cos))
        cands.sort(key=lambda t: (-t[2], t[0]))
        for rank, (r, n_shared, cos) in enumerate(cands[:k], start=1):
            out[(q, rank)] = (r, n_shared, cos)
    return out


def test_idf_cross_topk_matches_python_twin(spark):
    rng = random.Random(20260824)
    vocab = [f"w{i}" for i in range(25)]
    ref_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 35))))
        for i in range(30)
    ]
    batch_rows = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(15)
    ]
    out = ds.idf_cross_topk(
        _docs(spark, batch_rows), _docs(spark, ref_rows),
        k=3, threshold=0.05, max_shingle_df=None,
    )
    got = {
        (r.doc_id, r.rank): (r.ref_id, r.n_shared, r.cosine)
        for r in out.collect()
    }
    dd.release_cache(out)
    assert got == _py_cross_topk(batch_rows, ref_rows, k=3, threshold=0.05)
    assert len(got) > 0


def test_idf_cross_topk_quoting_batch_ranks_source_first(spark):
    """The retrieval use-case: a batch doc quoting a reference doc's
    rare passage must rank THAT reference doc #1 — and a batch doc
    with no reference vocabulary at all (all OOV) is absent."""
    ref_rows = [
        (0, "r0a r0b r0c rare1 rare2 rare3 r0d"),
        (1, "r1a r1b r1c r1d r1e"),
        (2, "r2a r2b r2c r2d common1 common2 common3"),
        (3, "r3a r3b common1 common2 common3 r3c"),
    ]
    batch_rows = [
        (100, "q0a q0b rare1 rare2 rare3 q0c"),  # quotes ref 0
        (101, "zzz1 zzz2 zzz3 zzz4"),            # fully OOV
    ]
    out = ds.idf_cross_topk(
        _docs(spark, batch_rows), _docs(spark, ref_rows),
        k=2, threshold=0.0, max_shingle_df=None,
    )
    rows = [
        (r.doc_id, r.rank, r.ref_id, r.cosine) for r in out.collect()
    ]
    dd.release_cache(out)
    by_doc = {}
    for doc, rank, ref, cos in rows:
        by_doc.setdefault(doc, []).append((rank, ref, cos))
    assert 101 not in by_doc, "all-OOV batch doc must be absent"
    assert by_doc[100][0][:2] == (1, 0), "the quoted source ranks #1"


def test_idf_cross_topk_self_query_is_identity(spark):
    """Querying a corpus against itself: every doc's #1 neighbor is
    itself at cosine 1.0 (the batch==reference sanity contract)."""
    rows = [
        (0, "a1 a2 a3 a4 x1 x2"),
        (1, "b1 b2 b3 b4 x1 x2"),
        (2, "c1 c2 c3 c4 c5 c6"),
    ]
    corpus = _docs(spark, rows)
    out = ds.idf_cross_topk(corpus, corpus, k=1, threshold=0.0)
    got = {r.doc_id: (r.ref_id, r.cosine) for r in out.collect()}
    dd.release_cache(out)
    for i in (0, 1, 2):
        assert got[i] == (i, 1.0)
