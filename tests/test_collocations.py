"""PMI collocation extraction (operators/collocations.py): python-twin
parity of the scores, planted-collocation ranking, window semantics,
partitioning invariance, NULL/short-doc contracts."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.collocations import (
    pmi_collocations,
    word_pairs,
)


def _twin(texts, window=2, min_count=1):
    pair_c, uni_c, n_pairs = Counter(), Counter(), 0
    for t in texts:
        if t is None:
            continue
        toks = t.split()
        uni_c.update(toks)
        for j in range(1, window + 1):
            for i in range(len(toks) - j):
                pair_c[(toks[i], toks[i + j])] += 1
                n_pairs += 1
    nw = sum(uni_c.values())
    out = {}
    for (w1, w2), c in pair_c.items():
        if c < min_count:
            continue
        pmi = (
            (round(math.log(c), 12) - round(math.log(n_pairs), 12))
            - (round(math.log(uni_c[w1]), 12) - round(math.log(nw), 12))
            - (round(math.log(uni_c[w2]), 12) - round(math.log(nw), 12))
        )
        out[(w1, w2)] = (c, uni_c[w1], uni_c[w2], round(pmi, 6))
    return out


def test_scores_match_python_twin(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = {
        (r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.pmi)
        for r in pmi_collocations(docs, window=2, min_count=3).collect()
    }
    want = {k: v for k, v in _twin(texts, 2, 3).items()}
    assert got == want and len(got) > 10


def test_planted_collocation_ranks_first(spark):
    """'new york' co-occurs far above its unigram expectation — it must
    out-rank every independent pair."""
    filler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, f"{filler} new york {filler}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = (
        pmi_collocations(df, window=1, min_count=2)
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .first()
    )
    assert (top.w1, top.w2) == ("new", "york") and top.pmi > 0


def test_window_semantics_ordered_pairs(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    w1 = {(r.w1, r.w2) for r in word_pairs(df, window=1).collect()}
    assert w1 == {("a", "b"), ("b", "c")}
    w2 = {(r.w1, r.w2) for r in word_pairs(df, window=2).collect()}
    assert w2 == {("a", "b"), ("b", "c"), ("a", "c")}  # ordered: no (c, a)


def test_partitioning_invariance_and_null_docs(spark):
    rows = [(i, "x y " * 5 + "z") for i in range(12)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pmi_collocations(df, min_count=4).collect()))
    b = sorted(
        map(tuple, pmi_collocations(df.repartition(7), min_count=4).collect())
    )
    assert a == b and a  # layout-independent; NULL docs contribute nothing


def test_short_docs_and_validation(spark):
    # a 1-token doc yields no pairs but its token still counts unigram mass
    df = spark.createDataFrame(
        [(1, "solo"), (2, "solo pair solo pair")],
        "doc_id long, text string",
    )
    got = {
        (r.w1, r.w2): r.n_w1
        for r in pmi_collocations(df, window=1, min_count=1).collect()
    }
    assert got[("solo", "pair")] == 3  # the 1-token doc's 'solo' counted
    with pytest.raises(ValueError, match="window must be"):
        word_pairs(df, window=0)


# ---------------------------------------------------------------------------
# PPMI vectors + word similarity (r14)

from mrt_data_integration_spark.operators.collocations import (  # noqa: E402
    ppmi_vectors,
    ppmi_word_similarity,
)
from mrt_data_integration_spark.operators import dedup as _dd  # noqa: E402


def _ppmi_twin(texts, window=2, min_count=1, top_contexts=None):
    cooc = Counter()
    for t in texts:
        if t is None:
            continue
        toks = t.split()
        for j in range(1, window + 1):
            for i in range(len(toks) - j):
                cooc[(toks[i], toks[i + j])] += 1
                cooc[(toks[i + j], toks[i])] += 1
    cooc = {k: c for k, c in cooc.items() if c >= min_count}
    marg = Counter()
    for (w, _), c in cooc.items():
        marg[w] += c
    n_t = sum(cooc.values())
    vec: dict[str, dict[str, float]] = {}
    for (w, c), n in cooc.items():
        ppmi = round(
            round(math.log(n), 12) + round(math.log(n_t), 12)
            - round(math.log(marg[w]), 12) - round(math.log(marg[c]), 12),
            6,
        )
        if ppmi > 0:
            vec.setdefault(w, {})[c] = ppmi
    if top_contexts is not None:
        vec = {
            w: dict(
                sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:top_contexts]
            )
            for w, d in vec.items()
        }
    return vec


def _cosine_twin(vec, threshold):
    out = {}
    norms = {}
    for w, d in vec.items():
        s = 0.0
        for c in sorted(d):  # context order: the order-pinned fold
            s += d[c] * d[c]
        norms[w] = math.sqrt(s)
    words = sorted(vec)
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            a, b = words[i], words[j]
            shared = sorted(set(vec[a]) & set(vec[b]))
            if not shared:
                continue
            dot = 0.0
            for c in shared:
                dot += vec[a][c] * vec[b][c]
            cos = round(dot / (norms[a] * norms[b]), 6)
            if cos >= threshold:
                out[(a, b)] = (len(shared), cos)
    return out


def _texts_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_ppmi_vectors_match_python_twin(spark):
    import random

    rng = random.Random(20260829)
    vocab = [f"w{i}" for i in range(18)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25)))
        for _ in range(50)
    ] + [None]
    out = ppmi_vectors(_texts_df(spark, texts), min_count=2)
    got = {(r.w, r.c): r.ppmi for r in out.collect()}
    _dd.release_cache(out)
    want = {
        (w, c): p
        for w, d in _ppmi_twin(texts, min_count=2).items()
        for c, p in d.items()
    }
    assert got == want
    # PPMI is symmetric on the symmetrized matrix
    for (w, c), p in got.items():
        assert got.get((c, w)) == p


def test_ppmi_similarity_matches_python_twin(spark):
    import random

    rng = random.Random(20260830)
    vocab = [f"w{i}" for i in range(15)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 20)))
        for _ in range(60)
    ]
    out = ppmi_word_similarity(
        _texts_df(spark, texts), min_count=2, threshold=0.1
    )
    got = {(r.w1, r.w2): (r.n_shared, r.cosine) for r in out.collect()}
    _dd.release_cache(out)
    want = _cosine_twin(_ppmi_twin(texts, min_count=2), 0.1)
    assert got == want


def test_ppmi_similarity_groups_synonym_like_words(spark):
    """Words used in the same contexts score high even when they NEVER
    co-occur — the distributional property the co-occurrence PMI
    surface cannot see (cat/dog share contexts; cat/quux share none)."""
    texts = []
    for pet in ("cat", "dog"):
        texts += [f"the {pet} sat on the mat", f"a {pet} chased the ball"] * 6
    texts += ["quux corge grault garply waldo fred plugh"] * 6
    out = ppmi_word_similarity(
        _texts_df(spark, texts), min_count=2, threshold=-1.0
    )
    got = {(r.w1, r.w2): r.cosine for r in out.collect()}
    _dd.release_cache(out)
    assert got[("cat", "dog")] > 0.9
    assert ("cat", "quux") not in got  # disjoint contexts: no pair at all


def test_ppmi_fanout_controls(spark):
    """top_contexts sparsifies per word; max_context_df drops hub
    contexts — both against the python twin (capped-universe rule)."""
    import random

    rng = random.Random(6)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 18)))
        for _ in range(40)
    ]
    out = ppmi_vectors(_texts_df(spark, texts), min_count=2, top_contexts=3)
    got = {(r.w, r.c): r.ppmi for r in out.collect()}
    _dd.release_cache(out)
    want = {
        (w, c): p
        for w, d in _ppmi_twin(texts, min_count=2, top_contexts=3).items()
        for c, p in d.items()
    }
    assert got == want
    per_w = Counter(w for (w, _) in got)
    assert all(v <= 3 for v in per_w.values())
    # the df cap: similarities computed over the capped context universe
    vec = _ppmi_twin(texts, min_count=2)
    df = Counter(c for d in vec.values() for c in d)
    capped_vec = {
        w: {c: p for c, p in d.items() if df[c] <= 5}
        for w, d in vec.items()
    }
    capped_vec = {w: d for w, d in capped_vec.items() if d}
    out2 = ppmi_word_similarity(
        _texts_df(spark, texts), min_count=2, threshold=0.1, max_context_df=5
    )
    got2 = {(r.w1, r.w2): (r.n_shared, r.cosine) for r in out2.collect()}
    _dd.release_cache(out2)
    assert got2 == _cosine_twin(capped_vec, 0.1)


def test_ppmi_plan_lints(spark):
    texts = [f"a b c d e f{i}" for i in range(30)]
    out = ppmi_word_similarity(_texts_df(spark, texts), min_count=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    _dd.release_cache(out)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
