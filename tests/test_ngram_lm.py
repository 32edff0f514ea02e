"""Hashed bigram LM + stupid-backoff perplexity (operators/ngram_lm.py):
randomized python twin, backoff semantics, partitioning invariance,
and the no-Python-UDF plan contract."""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.ngram_lm import (
    bigram_logprob_scores,
    perplexity_filter,
    train_bigram_lm,
)


def _py_bucket(g: str, n_buckets: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets


def _py_scores(train_docs, score_docs, n_buckets, alpha=0.4):
    """Pure-python replay of train + stupid-backoff scoring."""
    uni: dict[int, int] = {}
    bi: dict[int, int] = {}
    n_tokens = 0
    for _, text in train_docs:
        ts = text.split(" ")
        for t in ts:
            uni[_py_bucket(t, n_buckets)] = (
                uni.get(_py_bucket(t, n_buckets), 0) + 1
            )
            n_tokens += 1
        for a, b in zip(ts, ts[1:]):
            k = _py_bucket(f"{a} {b}", n_buckets)
            bi[k] = bi.get(k, 0) + 1
    out = {}
    for doc_id, text in score_docs:
        ts = text.split(" ")
        if len(ts) < 2:
            continue
        logs = []
        for a, b in zip(ts, ts[1:]):
            bc = bi.get(_py_bucket(f"{a} {b}", n_buckets))
            cu = uni.get(_py_bucket(a, n_buckets))
            if bc is not None and cu is not None:
                s = bc / cu
            else:
                uw = uni.get(_py_bucket(b, n_buckets), 0)
                s = alpha * (uw + 1) / (n_tokens + n_buckets)
            logs.append(math.log(s))
        out[doc_id] = (len(logs), round(sum(logs) / len(logs), 6))
    return out


def _corpus(rng, n_docs, vocab):
    return [
        (
            i,
            " ".join(
                rng.choice(vocab)
                for _ in range(rng.randint(2, 24))
            ),
        )
        for i in range(n_docs)
    ]


def test_bigram_lm_matches_python_twin(spark):
    """Random corpus, tiny bucket table (forces collisions AND unseen
    buckets): train on the even half, score everything — Spark ==
    pure-python replay exactly (the oracle's semantics)."""
    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(40)]
    docs = _corpus(rng, 60, vocab)
    train = [d for d in docs if d[0] % 2 == 0]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uni, bi, tot = train_bigram_lm(
        df.filter(F.col("doc_id") % 2 == 0), n_buckets=128
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_logprob_scores(
            df, uni, bi, tot, n_buckets=128
        ).collect()
    }
    assert got == _py_scores(train, docs, 128)


def test_backoff_leg_actually_fires(spark):
    """A held-out doc made of never-seen words must route every bigram
    through the smoothed unigram backoff (and score strictly worse
    than an in-train doc); a doc with one token scores no rows."""
    train = spark.createDataFrame(
        [(0, "the cat sat on the mat")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "zz qq xx yy"),
            (2, "solo"),
        ],
        "doc_id long, text string",
    )
    uni, bi, tot = train_bigram_lm(train, n_buckets=4096)
    rows = {
        r.doc_id: r
        for r in bigram_logprob_scores(
            score, uni, bi, tot, n_buckets=4096
        ).collect()
    }
    assert set(rows) == {0, 1}, "single-token docs have no bigram grain"
    assert rows[0].avg_logprob > rows[1].avg_logprob
    # exact backoff value: every unseen bigram scores
    # alpha * (0+1) / (n_tokens + n_buckets), n_tokens=6
    import math

    want = round(math.log(0.4 * 1 / (6 + 4096)), 6)
    assert rows[1].avg_logprob == want


def test_scores_invariant_to_partitioning(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(25)]
    docs = _corpus(rng, 40, vocab)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ref = df.filter(F.col("doc_id") % 2 == 0)

    def run(frame, reference):
        uni, bi, tot = train_bigram_lm(reference, n_buckets=256)
        return sorted(
            map(
                tuple,
                bigram_logprob_scores(
                    frame, uni, bi, tot, n_buckets=256
                ).collect(),
            )
        )

    assert run(df, ref) == run(
        df.repartition(13), ref.repartition(7)
    )


def test_perplexity_filter_flags_and_plan(spark):
    """The composed filter keeps high-logprob docs; the whole pipeline
    is JVM expressions (no BatchEvalPython) and the model joins stay
    broadcast (bounded width by construction)."""
    rng = random.Random(99)
    vocab = [f"t{i}" for i in range(30)]
    docs = _corpus(rng, 50, vocab)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = perplexity_filter(
        df, df.filter(F.col("doc_id") % 2 == 0), min_avg_logprob=-7.0
    )
    rows = out.collect()
    assert {r.kept for r in rows} <= {True, False}
    for r in rows:
        assert r.kept == (r.avg_logprob >= -7.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 3, (
        "the three bounded model joins must broadcast"
    )
