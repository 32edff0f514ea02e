"""Targeted tests for the E10 pipeline operators added in round 5:
substring-chunk dedup (planted-overlap guarantee, skew cap) and the
model-based corpus classifier (recovery + scoring determinism)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_chunks(text: str, chunk: int = 32, mod: int = 16) -> set[str]:
    """Driver-side twin of the operator's anchored chunking (1-based
    offsets like SQL substr)."""
    out = set()
    for o in range(len(text) - chunk + 1):
        cs = [ord(text[o + k]) for k in range(4)]
        poly = ((cs[0] * 31 + cs[1]) * 31 + cs[2]) * 31 + cs[3]
        if poly % mod == 0:
            out.add(text[o : o + chunk])
    return out


def test_planted_overlap_found_at_different_offsets(spark):
    """Content-defined anchoring must find a verbatim passage embedded
    at DIFFERENT offsets in two docs — the case a fixed-stride grid
    provably misses (different grid phases)."""
    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    shared = "".join(rng.choice(alpha) for _ in range(120))
    # precondition (content-only anchoring makes it offset-independent):
    # the passage itself contains at least one anchored window
    assert _py_chunks(shared), "seed must yield an anchored window"
    blockA = "".join(rng.choice(alpha) for _ in range(200))
    blockB = "".join(rng.choice(alpha) for _ in range(200))
    df = _docs(
        spark,
        [
            (1, blockA[:100] + shared + blockA[100:]),
            (2, blockB[:37] + shared + blockB[37:]),
        ],
    )
    pairs = dd.substring_chunk_pairs(df, max_chunk_df=None)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    dd.release_cache(pairs)
    assert (1, 2) in got


def test_disjoint_docs_produce_no_pairs(spark):
    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(150))) for i in range(6)
    ]
    pairs = dd.substring_chunk_pairs(_docs(spark, rows), max_chunk_df=None)
    assert pairs.count() == 0
    dd.release_cache(pairs)


def test_chunk_df_cap_drops_boilerplate(spark):
    """A chunk shared by every doc (boilerplate header) exceeds the DF
    cap and must not produce pairs on its own; a rarer overlap must
    survive."""
    rng = random.Random(3)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    boiler = "".join(rng.choice(alpha) for _ in range(64))
    assert _py_chunks(boiler), "boilerplate must anchor for the test to bite"
    uniq = ["".join(rng.choice(alpha) for _ in range(120)) for _ in range(8)]
    rare = "".join(rng.choice(alpha) for _ in range(80))
    assert _py_chunks(rare), "rare overlap must anchor"
    rows = [(i, boiler + uniq[i]) for i in range(6)]
    rows += [(10, boiler + rare + uniq[6]), (11, boiler + rare + uniq[7])]
    pairs = dd.substring_chunk_pairs(
        _docs(spark, rows), max_chunk_df=4, min_shared=1
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    dd.release_cache(pairs)
    # docs 0-5 share ONLY the capped boilerplate → no pairs among them;
    # (10, 11) additionally share the rare passage → must survive
    assert got == {(10, 11)}


def test_internal_repetition_does_not_inflate_counts(spark):
    """A chunk repeated INSIDE one doc must count once (distinct per
    doc), so n_shared_chunks is the size of the shared chunk-hash SET —
    pinned against the Python twin of the anchored chunking."""
    motif = "qwertyuiopasdfghjklzxcvbnmqwerty"  # 32 chars
    t1, t2 = motif * 4, motif * 3
    expected = len(_py_chunks(t1) & _py_chunks(t2))
    rows = dd.substring_chunk_pairs(
        _docs(spark, [(1, t1), (2, t2)]), max_chunk_df=None
    ).collect()
    if expected == 0:
        assert rows == []
    else:
        assert len(rows) == 1
        assert rows[0]["n_shared_chunks"] == expected


def test_lang_classifier_scores_shape_and_determinism(spark, sf_smoke):
    from mrt_data_integration_spark.queries import QUERIES

    a = {
        r["source"]: (r["avg_p_en"], r["n_pred_en"], r["n_en"], r["n_docs"])
        for r in QUERIES["lang_classifier_scores"](spark, sf_smoke).collect()
    }
    b = {
        r["source"]: (r["avg_p_en"], r["n_pred_en"], r["n_en"], r["n_docs"])
        for r in QUERIES["lang_classifier_scores"](spark, sf_smoke).collect()
    }
    assert a == b  # rounded scores and counts are run-stable
    assert a  # non-empty
    for src, (avg_p, n_pred, n_en, n_docs) in a.items():
        assert 0.0 <= avg_p <= 1.0
        assert 0 <= n_pred <= n_docs
        assert 0 <= n_en <= n_docs


def test_lang_classifier_separates_synthetic_extremes(spark):
    """Sanity: a corpus where 'en' docs are stopword-dense and others
    stopword-free must be separated with high confidence by the fitted
    classifier (not a degenerate all-0.5 fit)."""
    from mrt_data_integration_spark.estimators.glm import (
        logistic_irls,
        predict_logistic,
    )
    from mrt_data_integration_spark.operators import text as tx

    rng = random.Random(5)
    stop = ["the", "a", "of", "to", "and", "in", "is", "it"]
    other = ["rock", "blue", "fish", "lamp", "tree", "iron", "moon"]
    rows = []
    for i in range(120):
        en = i % 2 == 0
        pool = stop + other if en else other
        text = " ".join(rng.choice(pool) for _ in range(40))
        rows.append((i, text, "en" if en else "xx"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    x_cols = [F.lit(1.0), tx.stopword_ratio("text"), tx.symbol_ratio("text")]
    fit = logistic_irls(df, x_cols, (F.col("lang") == "en").cast("int"))
    p = predict_logistic(fit.beta, x_cols)
    stats = df.select(
        F.avg(F.when(F.col("lang") == "en", p)).alias("p_en"),
        F.avg(F.when(F.col("lang") != "en", p)).alias("p_xx"),
    ).first()
    assert stats["p_en"] > 0.8
    assert stats["p_xx"] < 0.2


def test_document_chunking_covers_every_token(spark, sf_smoke):
    """Every token of every document must land in ≥1 chunk (the
    tail-anchored final window closes the stride gap), windows never
    exceed 64 tokens, and consecutive stride windows overlap."""
    from mrt_data_integration_spark.queries import QUERIES

    rows = QUERIES["document_chunking"](spark, sf_smoke).collect()
    from mrt_data_integration_spark.sources import load_table
    n_tok = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_smoke, "documents")
        .selectExpr("doc_id", "size(split(text, '\\\\s+')) AS n")
        .collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["start_tok"], r["n_tok"]))
    assert set(by_doc) == set(n_tok)
    for doc, spans in by_doc.items():
        covered = set()
        for s, n in sorted(spans):
            assert 1 <= n <= 64
            assert s + n - 1 <= n_tok[doc]
            covered.update(range(s, s + n))
        assert covered == set(range(1, n_tok[doc] + 1)), doc


def test_char_trigram_lm_filter_short_docs_match_oracle(spark, tmp_path):
    """Docs shorter than 3 chars must contribute ZERO trigrams (Spark's
    sequence(1, 0) yields the descending [1, 0] unless guarded; DuckDB's
    generate_series(1, len-2) is empty — the engines diverged on any
    short/empty document before the length>=3 gate)."""
    import duckdb
    import pandas as pd

    from mrt_data_integration_spark.queries import ORACLES, QUERIES

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "lang": ["en", "en", "de", "en", "de"],
            "text": ["the cat sat on the mat", "ab", "", "x", "der hund"],
        }
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = (
        QUERIES["char_trigram_lm_filter"](spark, sf_dir)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = (
        con.execute(ORACLES["char_trigram_lm_filter"])
        .fetchdf()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    # Only docs 1 and 5 have trigrams; docs 2-4 contribute nothing.
    assert got["n_docs"].tolist() == [1, 1]
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
