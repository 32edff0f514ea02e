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
