"""BM25 retrieval (operators/retrieval.py): scoring semantics, ranking
determinism, and the broadcast-prune plan contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.retrieval import bm25_topk


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "banana banana banana durian"),
            (4, "cherry durian elderberry fig grape"),
        ],
        "doc_id long, text string",
    )


def _queries(spark, qs):
    return spark.createDataFrame(qs, "query_id string, terms array<string>")


def test_bm25_matches_python_twin(spark):
    docs = [
        (1, ["apple", "banana", "apple"]),
        (2, ["apple", "cherry"]),
        (3, ["banana", "banana", "banana", "durian"]),
        (4, ["cherry", "durian", "elderberry", "fig", "grape"]),
    ]
    k1, b = 1.2, 0.75
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n

    def score(terms, doc_toks):
        dl = len(doc_toks)
        s = 0.0
        for t in set(terms):
            tf = doc_toks.count(t)
            if not tf:
                continue
            df = sum(1 for _, dt in docs if t in dt)
            idf = round(math.log(1 + (n - df + 0.5) / (df + 0.5)), 12)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        return round(s, 6)

    out = bm25_topk(
        _corpus(spark), _queries(spark, [("q", ["apple", "banana"])]), k=4
    ).collect()
    want = sorted(
        ((score(["apple", "banana"], dt), i) for i, dt in docs
         if score(["apple", "banana"], dt) > 0),
        key=lambda p: (-p[0], p[1]),
    )
    assert [(r.doc_id, r.score) for r in sorted(out, key=lambda r: r.rank)] \
        == [(i, s) for s, i in want]


def test_bm25_duplicate_query_terms_count_once(spark):
    docs = _corpus(spark)
    once = bm25_topk(docs, _queries(spark, [("q", ["apple"])]), k=4)
    twice = bm25_topk(docs, _queries(spark, [("q", ["apple", "apple"])]), k=4)
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_bm25_rarer_term_outranks_common_on_equal_tf(spark):
    """durian (df=2) must contribute more than banana (df=2)? — use a
    sharper pair: elderberry (df=1) vs apple (df=2) at tf=1 in docs of
    equal length."""
    docs = spark.createDataFrame(
        [
            (1, "apple filler filler"),
            (2, "elderberry filler filler"),
            (3, "apple other words"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(
        docs, _queries(spark, [("q", ["apple", "elderberry"])]), k=3
    ).collect()
    top = min(out, key=lambda r: r.rank)
    assert top.doc_id == 2  # rare term wins at equal tf and dl


def test_bm25_postings_pruned_by_broadcast(spark):
    """The query-vocabulary semi-join must broadcast and sit BELOW the
    (doc, term) aggregation — the whole-corpus explode never shuffles
    terms nobody asked about."""
    out = bm25_topk(
        _corpus(spark), _queries(spark, [("q", ["apple"])]), k=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("CartesianProduct") == 0
