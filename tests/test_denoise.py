"""Span-corruption pair generation (operators/denoise.py): python-twin
replay, the de-corruption identity, masked-fraction arithmetic,
partitioning invariance, and entry contracts.
"""

from __future__ import annotations

import hashlib
import random

import pytest

from mrt_data_integration_spark.operators.denoise import (
    span_corruption_pairs,
)


def _twin(did, text, window=20, span=3, salt="t5"):
    toks = text.split(" ")
    n = len(toks)
    n_win = n // window
    it, tt = [], []
    for i in range(n_win):
        off = int(
            hashlib.md5(f"{salt}:{did}:{i}".encode()).hexdigest()[:4], 16
        ) % (window - span + 1)
        b = i * window
        it += toks[b:b + off] + [f"<extra_id_{i}>"] + toks[b + off + span:b + window]
        tt += [f"<extra_id_{i}>"] + toks[b + off:b + off + span]
    it += toks[n_win * window:]
    tt += [f"<extra_id_{n_win}>"]
    return " ".join(it), " ".join(tt), n, n_win * span


def test_span_corruption_randomized_python_twin(spark):
    """Seeded fuzz vs the from-first-principles twin: token split,
    hashed block offsets, sentinel assembly, unmasked tail, terminator
    — on docs spanning empty-to-several-windows, repeated spaces
    included (empty tokens round-trip like the span-dedup family)."""
    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(30)] + [""]  # "" = repeated space
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 90))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.input_text, r.target_text, r.n_tokens, r.n_masked)
        for r in span_corruption_pairs(df).collect()
    }
    want = {did: _twin(did, text) for did, text in rows if text}
    assert got == want, {
        k: (got.get(k), want.get(k))
        for k in set(got) | set(want)
        if got.get(k) != want.get(k)
    }


def test_span_corruption_decorruption_identity(spark):
    """Substituting each <extra_id_k> in the input with the k-th
    target span reproduces every document byte-exactly — the pair
    really is a lossless factorization of the corpus."""
    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randint(0, 99)}" for _ in range(65)))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in span_corruption_pairs(df).collect():
        spans: dict[str, list[str]] = {}
        cur = None
        for tok in r.target_text.split(" "):
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt: list[str] = []
        for tok in r.input_text.split(" "):
            rebuilt += spans.get(tok, [tok])
        assert " ".join(rebuilt) == dict(rows)[r.doc_id]


def test_span_corruption_masked_fraction(spark):
    """n_masked == (n_tokens // window) * span exactly — the
    deterministic 15% at the 3/20 default, short tails never masked;
    a sub-window doc passes through unmasked with the bare
    terminator."""
    rows = [(1, " ".join(f"a{j}" for j in range(45))), (2, "just three words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in span_corruption_pairs(df).collect()}
    assert got[1].n_masked == (45 // 20) * 3 == 6
    assert got[2].n_masked == 0
    assert got[2].input_text == "just three words"
    assert got[2].target_text == "<extra_id_0>"


def test_span_corruption_partitioning_invariance(spark):
    """A doc's pair depends only on (id, text) — never on row order or
    partition layout."""
    rows = [
        (i, " ".join(f"x{(i * 7 + j) % 50}" for j in range(55)))
        for i in range(20)
    ]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    df2 = spark.createDataFrame(
        sorted(rows, reverse=True), "doc_id long, text string"
    ).repartition(8)
    a = sorted(map(tuple, span_corruption_pairs(df1).collect()))
    b = sorted(map(tuple, span_corruption_pairs(df2).collect()))
    assert a == b


def test_span_corruption_contracts(spark):
    """span >= 1 and window > span fail fast; NULL/empty docs are
    excluded (no pair to learn from)."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="span"):
        span_corruption_pairs(df, span=0)
    with pytest.raises(ValueError, match="exceed"):
        span_corruption_pairs(df, window=3, span=3)
    assert [r.doc_id for r in span_corruption_pairs(df).collect()] == [1]
