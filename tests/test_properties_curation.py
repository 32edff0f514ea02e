"""Randomized-twin properties for the r10 curation operators: k-means
and DSIR weights against local replicas on random synthetic inputs
(the repo's seed-parametrized discipline — deterministic, no flaky
statistical assertions)."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with peers)

from mrt_data_integration_spark.operators.cluster import kmeans_lloyd
from mrt_data_integration_spark.operators.dedup import release_cache
from mrt_data_integration_spark.operators.dsir import dsir_log_weights


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_kmeans_numpy_twin_random_corpora(spark, seed):
    """Assignments exactly equal the local Lloyd's replica on random
    gaussian-mixture data at random (k, n_iter, d) — the sf-data twin
    generalized to arbitrary shapes, including likely empty cells
    (k exceeds the true mixture count)."""
    rng = random.Random(seed)
    n, d = rng.randint(40, 120), rng.choice([2, 5, 16])
    k, n_iter = rng.randint(2, 9), rng.randint(0, 4)
    nprng = np.random.default_rng(seed)
    centers_true = nprng.normal(size=(3, d)) * 5
    X = np.vstack(
        [nprng.normal(size=(n // 3 + 1, d)) + c for c in centers_true]
    )[:n]
    ids = list(range(n))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    assignments, centers = kmeans_lloyd(df, k=k, n_iter=n_iter)
    got = {r.vec_id: r.cell for r in assignments.collect()}
    release_cache(assignments)

    C = X[np.argsort(ids)[:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        cells = d2.argmin(1)
        for i in range(k):
            m = cells == i
            if m.any():
                C[i] = X[m].mean(0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    want = {i: int(c) for i, c in enumerate(d2.argmin(1))}
    assert got == want, (seed, k, n_iter, d)
    np.testing.assert_allclose(np.array(centers), C, atol=1e-9)


def _twin_dsir(raw_rows, tgt_rows, b):
    def grams(t):
        toks = t.split()
        out = list(toks)
        out += [
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ]
        return out

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % b

    tgt = Counter()
    for _, t in tgt_rows:
        for g in grams(t):
            tgt[bucket(g)] += 1
    raw = Counter()
    docs = {}
    for i, t in raw_rows:
        c = Counter(bucket(g) for g in grams(t))
        docs[i] = c
        raw.update(c)
    tt, tr = sum(tgt.values()), sum(raw.values())
    return {
        i: round(
            sum(
                n
                * round(
                    math.log((tgt.get(bk, 0) + 1.0) / (tt + b))
                    - math.log((raw[bk] + 1.0) / (tr + b)),
                    12,
                )
                for bk, n in c.items()
            ),
            4,
        )
        for i, c in docs.items()
    }


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_dsir_weights_twin_random_corpora(spark, seed):
    """Weights match the local replica on random word soups with a
    SMALL bucket count (forced collisions — the hashing-trick regime
    the sf-data twin barely exercises)."""
    rng = random.Random(seed)
    vocab_t = [f"t{j}" for j in range(20)]
    vocab_r = [f"r{j}" for j in range(20)]

    def doc(vs, lo, hi):
        return " ".join(rng.choice(vs) for _ in range(rng.randint(lo, hi)))

    tgt_rows = [(100 + i, doc(vocab_t, 3, 15)) for i in range(8)]
    raw_rows = [
        (i, doc(vocab_t + vocab_r, 1, 20)) for i in range(25)
    ]
    b = 64  # tiny → heavy collisions
    tgt_df = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    raw_df = spark.createDataFrame(raw_rows, "doc_id long, text string")
    got = {
        r.doc_id: r.log_w
        for r in dsir_log_weights(raw_df, tgt_df, n_buckets=b).collect()
    }
    want = _twin_dsir(raw_rows, tgt_rows, b)
    assert set(got) == set(want), seed
    for i in got:
        assert abs(got[i] - want[i]) < 2e-4, (seed, i, got[i], want[i])


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_pmi_collocations_twin_random_corpora(spark, seed):
    """PMI scores exactly equal the local replica on random Zipf-ish
    corpora at random (window, min_count) — including repeated words
    inside a doc (pair mass counts EVERY co-occurrence, bag not set)
    and docs shorter than the window."""
    from mrt_data_integration_spark.operators.collocations import (
        pmi_collocations,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(rng.randint(5, 12))]
    n_docs = rng.randint(8, 25)
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for _ in range(n_docs)
    ]
    window, min_count = rng.randint(1, 3), rng.randint(1, 4)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.pmi)
        for r in pmi_collocations(
            df, window=window, min_count=min_count
        ).collect()
    }

    pair_c, uni_c, n_pairs = Counter(), Counter(), 0
    for t in texts:
        toks = t.split()
        uni_c.update(toks)
        for j in range(1, window + 1):
            for i in range(len(toks) - j):
                pair_c[(toks[i], toks[i + j])] += 1
                n_pairs += 1
    nw = sum(uni_c.values())
    want = {}
    for (w1, w2), c in pair_c.items():
        if c < min_count:
            continue
        pmi = (
            (round(math.log(c), 12) - round(math.log(n_pairs), 12))
            - (round(math.log(uni_c[w1]), 12) - round(math.log(nw), 12))
            - (round(math.log(uni_c[w2]), 12) - round(math.log(nw), 12))
        )
        want[(w1, w2)] = (c, uni_c[w1], uni_c[w2], round(pmi, 6))
    assert got == want, (seed, window, min_count)


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_boilerplate_invariant_properties_random_corpora(spark, seed):
    """Structural invariants on random corpora with planted shared
    passages: (a) one output row per non-empty input doc; (b) every
    clean_text is an in-order token SUBSEQUENCE of its original (the
    rewrite only deletes, never reorders or invents); (c) removals
    under min_docs=3 are a subset of removals under min_docs=2 (the
    threshold is monotone); (d) n_kept == n_chunks implies
    byte-identity."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    rng = random.Random(seed)
    vocab = [f"v{i}" for i in range(25)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 12)))
        for _ in range(3)
    ]
    rows = []
    for i in range(30):
        parts = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.5:
                parts.append(rng.choice(passages))
            else:
                parts.append(
                    " ".join(
                        rng.choice(vocab)
                        for _ in range(rng.randint(0, 8))
                    )
                )
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    loose = {
        r.doc_id: r for r in remove_boilerplate_spans(df, min_docs=2).collect()
    }
    strict = {
        r.doc_id: r for r in remove_boilerplate_spans(df, min_docs=3).collect()
    }
    originals = dict(rows)
    non_empty = {i for i, t in rows if t}
    assert set(loose) == non_empty and set(strict) == non_empty

    def is_subsequence(sub: list[str], full: list[str]) -> bool:
        it = iter(full)
        return all(tok in it for tok in sub)

    for did in non_empty:
        orig_toks = originals[did].split(" ")
        for out in (loose[did], strict[did]):
            kept = out.clean_text.split(" ") if out.clean_text else []
            assert is_subsequence(kept, orig_toks), (seed, did)
            assert out.n_kept <= out.n_chunks
            if out.n_kept == out.n_chunks:
                assert out.clean_text == originals[did]
        # monotone: whatever strict removed, loose removed too
        assert strict[did].n_kept >= loose[did].n_kept, (seed, did)


@pytest.mark.parametrize("seed", [5, 13, 31])
def test_span_corruption_token_accounting_random_corpora(spark, seed):
    """Exact token accounting on random corpora: input tokens ==
    n − n_masked + n_windows (each span swaps for one sentinel),
    target tokens == n_masked + n_windows + 1 (sentinel per span +
    terminator), and every non-sentinel input/target token appears in
    the original document's bag."""
    from mrt_data_integration_spark.operators.denoise import (
        span_corruption_pairs,
    )

    rng = random.Random(seed)
    rows = [
        (
            i,
            " ".join(
                f"u{rng.randint(0, 40)}" for _ in range(rng.randint(1, 75))
            ),
        )
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_corruption_pairs(df).collect()}
    for did, text in rows:
        r = out[did]
        n = len(text.split(" "))
        n_win = n // 20
        assert r.n_tokens == n and r.n_masked == n_win * 3
        itoks = r.input_text.split(" ")
        ttoks = r.target_text.split(" ")
        assert len(itoks) == n - r.n_masked + n_win, (seed, did)
        assert len(ttoks) == r.n_masked + n_win + 1, (seed, did)
        bag = Counter(text.split(" "))
        for tok in itoks + ttoks:
            if not tok.startswith("<extra_id_"):
                assert bag[tok] > 0, (seed, did, tok)
