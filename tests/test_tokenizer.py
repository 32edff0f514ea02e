"""Distributed BPE training (operators/tokenizer.py): the learned merge
table must equal a pure-Python reference implementing the identical
rule (weighted adjacent-pair counts over the word-frequency table,
(count DESC, left, right) tie-break, double-pass left-to-right literal
replace), under any partitioning; the encoder must reproduce the
trainer's final symbol state. Oracle parity for the full 8-round loop
is covered by tests/test_oracle_parity.py (`bpe_train_merges`)."""

from __future__ import annotations

from collections import Counter

import pytest

from mrt_data_integration_spark.operators.tokenizer import (
    WORD_MARKER,
    _initial_symbols,
    bpe_encode_words,
    train_bpe_merges,
    word_frequencies,
)


def _py_bpe(texts, n_merges, min_pair_count=1):
    """Reference twin: same representation and replace semantics as the
    operator, driver-side. Returns (merges, final_symbol_state)."""
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    words = {" ".join(w) + " " + WORD_MARKER: c for w, c in wc.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for s, c in words.items():
            syms = s.split(" ")
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), total = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if total < min_pair_count:
            break
        merges.append((rank, l, r, l + r, total))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        words = {
            # strip SPACES only — F.trim and DuckDB trim remove ' ' not
            # \s, and a word may legitimately contain e.g. NBSP symbols
            (" " + s + " ").replace(pat, rep).replace(pat, rep).strip(" "): c
            for s, c in words.items()
        }
    return merges, words


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the newest of the new low lows",
]


def test_matches_python_reference(spark):
    got = sorted(
        map(
            tuple,
            train_bpe_merges(
                _docs(spark, CORPUS), n_merges=6, min_pair_count=1
            ).collect(),
        )
    )
    want, _ = _py_bpe(CORPUS, 6)
    assert got == sorted(want)


def test_deterministic_under_partitioning(spark):
    docs = _docs(spark, CORPUS * 3)
    a = train_bpe_merges(docs, n_merges=5).collect()
    b = train_bpe_merges(docs.repartition(7), n_merges=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_same_symbol_run_semantics(spark):
    """'aaaa' exercises the double-pass replace rule on same-symbol
    runs — the python twin implements the identical rule, so training
    must agree exactly even where canonical greedy BPE could differ."""
    corpus = ["aaaa aaaa aa b", "aaaa aa aa"]
    got = sorted(
        map(
            tuple,
            train_bpe_merges(
                _docs(spark, corpus), n_merges=4, min_pair_count=1
            ).collect(),
        )
    )
    want, _ = _py_bpe(corpus, 4)
    assert got == sorted(want)
    assert got[0][1:3] == ("a", "a")  # (a,a) is the top pair


def test_min_pair_count_early_stop(spark):
    """Every word unique and single-use → after the char pairs within
    the few words are merged, counts hit 1 and training stops early."""
    corpus = ["ab cd"]
    rows = train_bpe_merges(
        _docs(spark, corpus), n_merges=10, min_pair_count=2
    ).collect()
    assert rows == []  # all pair counts are 1 < min_pair_count


def test_encoder_reproduces_trainer_state(spark):
    """Applying the learned merges (rank order, same replace rule) to
    the initial word table reproduces the python twin's final symbol
    state — encoder == trainer by construction, pinned."""
    import pyspark.sql.functions as F

    docs = _docs(spark, CORPUS)
    merges = [
        (r["left"], r["right"])
        for r in train_bpe_merges(docs, n_merges=6, min_pair_count=1)
        .orderBy("rank")
        .collect()
    ]
    words = word_frequencies(docs).select(
        _initial_symbols(F.col("word")).alias("s"), "cnt"
    )
    encoded = {r["s"]: r["cnt"] for r in bpe_encode_words(words, merges).collect()}
    _, want_state = _py_bpe(CORPUS, 6)
    assert encoded == want_state


def test_marker_is_a_single_symbol(spark):
    """The end-of-word marker participates in merges as ONE symbol —
    'low' has exactly 2 initial within-word pairs plus (w, </w>)."""
    rows = word_frequencies(_docs(spark, ["low"])).collect()
    assert len(rows) == 1
    import pyspark.sql.functions as F

    s = (
        word_frequencies(_docs(spark, ["low"]))
        .select(_initial_symbols(F.col("word")).alias("s"))
        .collect()[0]["s"]
    )
    assert s == "l o w " + WORD_MARKER
    assert len(s.split(" ")) == 4


@pytest.mark.parametrize("lowercase", [True, False])
def test_lowercase_toggle(spark, lowercase):
    corpus = ["AB ab"]
    got = train_bpe_merges(
        _docs(spark, corpus), n_merges=1, lowercase=lowercase, min_pair_count=1
    ).collect()
    # lowercased: 'ab' count 2 -> pair (a,b) total 2; raw: two distinct
    # words, each pair count 1, (A,B) wins the tie-break over (a,b)
    if lowercase:
        assert (got[0]["left"], got[0]["right"], got[0]["pair_count"]) == (
            "a", "b", 2,
        )
    else:
        assert (got[0]["left"], got[0]["right"], got[0]["pair_count"]) == (
            "A", "B", 1,
        )


def test_token_frequencies_weighted(spark):
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.operators.tokenizer import (
        token_frequencies,
    )

    enc = spark.createDataFrame(
        [("lo w </w>", 5), ("lo </w>", 2)], "s string, cnt long"
    )
    got = {
        r["token"]: r["n_occurrences"] for r in token_frequencies(enc).collect()
    }
    assert got == {"lo": 7, "w": 5, "</w>": 7}


def test_random_corpus_fuzz_vs_twin(spark):
    """Seeded random corpora over a 3-letter alphabet (heavy pair-count
    TIES, short words, repeated words) — the trainer must agree with
    the python twin exactly on every one; ties are where cross-engine
    argmax bugs hide."""
    import random

    rng = random.Random(1234)
    for trial in range(5):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(5, 30))
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(2, 6))
        ]
        got = sorted(
            map(
                tuple,
                train_bpe_merges(
                    _docs(spark, texts), n_merges=6, min_pair_count=1
                ).collect(),
            )
        )
        want, _ = _py_bpe(texts, 6)
        assert got == sorted(want), f"trial {trial}: {texts}"
