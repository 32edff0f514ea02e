"""Weighted MinHash (operators/wminhash.py): python-twin parity of the
order-sampling winners, weighted-similarity semantics (heavy shared
terms pair, light shared terms don't), partitioning invariance, band
cap, weight contracts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with peers)

from mrt_data_integration_spark.operators.wminhash import (
    weighted_minhash_pairs,
    weighted_minhash_signatures,
)


def _u(seed, term, salt="wmh"):
    h = hashlib.md5(f"{salt}{seed}:{term}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def _twin_winners(rows, n_hashes=8):
    by_doc: dict = {}
    for doc, term, w in rows:
        if w is None or w <= 0:
            continue
        by_doc.setdefault(doc, []).append((term, w))
    out = {}
    for doc, terms in by_doc.items():
        for s in range(n_hashes):
            key = lambda tw: (-round(_u(s, tw[0]) ** (1.0 / tw[1]), 12), tw[0])
            out[(doc, s)] = min(terms, key=key)[0]
    return out


def test_winners_match_python_twin(spark):
    rows = [
        (d, t, float(w))
        for d in range(6)
        for t, w in [
            (f"shared{d % 2}", 4.0),
            (f"uniq{d}", 2.5),
            ("common", 1.0),
        ]
    ]
    df = spark.createDataFrame(rows, "doc_id long, term string, w double")
    got = {
        (r.doc_id, r.seed): r.winner
        for r in weighted_minhash_signatures(df, n_hashes=8).collect()
    }
    assert got == _twin_winners(rows, 8) and len(got) == 48


def test_weight_drives_collision(spark):
    """Docs sharing their HEAVY term must agree on more slots than docs
    sharing only a light term — the whole point of weighting."""
    rows = [
        (1, "heavy", 50.0), (1, "light", 1.0), (1, "only1", 1.0),
        (2, "heavy", 50.0), (2, "light", 1.0), (2, "only2", 1.0),
        (3, "zzz", 50.0), (3, "light", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, term string, w double")
    pairs = {
        (r.id_a, r.id_b): r.n_agree
        for r in weighted_minhash_pairs(df, n_hashes=16, min_agree=1).collect()
    }
    assert pairs.get((1, 2), 0) > pairs.get((1, 3), 0)
    assert pairs.get((1, 2), 0) > pairs.get((2, 3), 0)


def test_partitioning_invariance_and_weight_contracts(spark):
    rows = [(d, f"t{i}", float(i % 5 + 1)) for d in range(5) for i in range(9)]
    rows += [(9, "nullw", None), (9, "zero", 0.0), (9, "ok", 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, term string, w double")
    a = sorted(map(tuple, weighted_minhash_signatures(df, n_hashes=4).collect()))
    b = sorted(
        map(
            tuple,
            weighted_minhash_signatures(df.repartition(7), n_hashes=4).collect(),
        )
    )
    assert a == b
    # NULL/zero weights filtered: doc 9's winner can only be 'ok'
    doc9 = {r[2] for r in a if r[0] == 9}
    assert doc9 == {"ok"}
    with pytest.raises(ValueError, match="n_hashes"):
        weighted_minhash_signatures(df, n_hashes=0)


def test_band_cap_drops_degenerate_bands(spark):
    """A corpus-dominant term wins some seed in every doc; max_band_df
    must drop those bands (bounding the join) while pairs driven by
    rarer shared terms survive."""
    rows = []
    for d in range(20):
        rows.append((d, "dominant", 100.0))
        rows.append((d, f"uniq{d}", 1.0))
    # docs 100/101 share a heavy rare term
    rows += [(100, "rarepair", 100.0), (101, "rarepair", 100.0)]
    df = spark.createDataFrame(rows, "doc_id long, term string, w double")
    capped = {
        (r.id_a, r.id_b)
        for r in weighted_minhash_pairs(
            df, n_hashes=8, min_agree=1, max_band_df=10
        ).collect()
    }
    assert (100, 101) in capped
    # every pair among docs 0-19 rode the dominant band — all dropped
    assert not [p for p in capped if p[0] < 100 and p[1] < 100]
