"""Positional phrase search (operators/retrieval.py): python twin,
overlap/repeat semantics, absence, and the vocab-prune plan shape."""

from __future__ import annotations

import random

from mrt_data_integration_spark.operators.retrieval import (
    phrase_search,
    positional_postings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_count(text: str, phrase: str) -> int:
    toks, p = text.split(" "), phrase.split(" ")
    return sum(
        1
        for i in range(len(toks) - len(p) + 1)
        if toks[i : i + len(p)] == p
    )


def test_phrase_search_matches_python_twin(spark):
    rng = random.Random(20260816)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]
    phrases = ["a b", "b c d", "a a", "e"]
    got = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(_docs(spark, rows), phrases).collect()
    }
    want = {
        (p, i): _py_count(t, p)
        for i, t in rows
        for p in phrases
        if _py_count(t, p) > 0
    }
    assert got == want


def test_overlaps_repeats_and_absence(spark):
    """'a a a' contains 'a a' twice (overlapping starts); a phrase with
    a repeated term must not fire on a single occurrence; absent
    phrases yield no row; the single-term phrase degenerates to term
    counting."""
    df = _docs(
        spark,
        [(0, "a a a"), (1, "a b a"), (2, "x y z")],
    )
    got = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(df, ["a a", "z x", "a"]).collect()
    }
    assert got == {
        ("a a", 0): 2,
        ("a", 0): 3,
        ("a", 1): 2,
    }


def test_postings_and_plan_shape(spark):
    """Positional postings carry 0-based occurrence positions; the
    phrase frame joins broadcast (the BM25 vocab-prune class) and no
    Python UDF appears anywhere."""
    df = _docs(spark, [(0, "u v u")])
    post = sorted(
        map(tuple, positional_postings(df).collect())
    )
    assert post == [(0, "u", 0), (0, "u", 2), (0, "v", 1)]
    out = phrase_search(df, ["u v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, "phrase frame must broadcast"


def test_partitioning_invariance(spark):
    rng = random.Random(5)
    vocab = ["p", "q", "r", "s"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 20))))
        for i in range(30)
    ]
    df = _docs(spark, rows)
    a = sorted(map(tuple, phrase_search(df, ["p q", "q q"]).collect()))
    b = sorted(
        map(
            tuple,
            phrase_search(df.repartition(7), ["p q", "q q"]).collect(),
        )
    )
    assert a == b


def test_phrase_whitespace_normalization(spark):
    """ADVICE r12: phrases split on ANY whitespace (documents tokenize
    on \\s+), so doubled/tab whitespace in a phrase must match the
    single-spaced corpus rather than silently returning nothing; an
    all-whitespace phrase is a loud error, not an empty result."""
    import pytest

    docs = _docs(spark, [(1, "a b c"), (2, "b c b c")])
    got = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_search(docs, ["b  c", "a\tb"]).collect()
    }
    assert got == {("b  c", 1): 1, ("b  c", 2): 2, ("a\tb", 1): 1}
    with pytest.raises(ValueError, match="no terms"):
        phrase_search(docs, ["   "]).collect()
