"""Scale-hazard guards for the dedup operators (VERDICT r1 items 2-6):
the shingle-frequency cap bounds hot-shingle join fan-out, the corpus
repartition is conditional, persisted frames are releasable, and the
chi2 singular fallback actually returns.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mrt_data_integration_spark.linalg import chi2_stat
from mrt_data_integration_spark.operators import dedup as dd
from mrt_data_integration_spark.sources import load_table


def _hot_corpus(spark, n_docs: int = 40):
    """Every doc shares one boilerplate shingle; each also has a unique
    tail. Without a cap the shared shingle alone yields C(40,2)=780
    candidate pairs."""
    rows = [
        (i, f"all rights reserved legal notice unique{i} tail{i} word{i}")
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_shingle_cap_drops_hot_shingle_pairs(spark):
    docs = _hot_corpus(spark)
    uncapped = dd.ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=None)
    capped = dd.ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=10)
    n_unc, n_cap = uncapped.count(), capped.count()
    # the boilerplate shingles pair every doc with every other
    assert n_unc == 40 * 39 // 2
    # with the cap the shared shingles are dropped and only genuinely
    # co-shingled docs (none here) remain
    assert n_cap == 0
    dd.release_cache(uncapped)
    dd.release_cache(capped)


def test_shingle_cap_noop_below_threshold(spark, sf_smoke):
    """Cap above the corpus's max document frequency ⇒ identical output
    (the oracle-checked configuration)."""
    docs = load_table(spark, sf_smoke, "documents").limit(60)
    base = dd.ngram_jaccard_pairs(docs, threshold=0.2, max_shingle_df=None)
    capped = dd.ngram_jaccard_pairs(docs, threshold=0.2, max_shingle_df=10_000)
    rows_a = sorted(map(tuple, base.collect()))
    rows_b = sorted(map(tuple, capped.collect()))
    assert rows_a == rows_b
    dd.release_cache(base)
    dd.release_cache(capped)


def test_shingle_cap_boundary_and_counter(spark):
    """The cap is a strict > boundary: a shingle at df == cap is KEPT
    (its C(cap,2) join rows are the promised cap² bound), one at
    df == cap+1 is DROPPED entirely, and the Observation counter
    reports exactly how many distinct shingles were removed."""
    from pyspark.sql import Observation

    cap = 6
    # group A: cap docs sharing shingle-set "kept kept kept" (df == cap)
    # group B: cap+1 docs sharing "gone gone gone ..." (df == cap+1)
    rows = [(i, f"kept kept kept pad{i} pad{i} pad{i}") for i in range(cap)]
    rows += [
        (100 + i, f"gone gone gone pad{100+i} pad{100+i} pad{100+i}")
        for i in range(cap + 1)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    obs = Observation("hot")
    frame = dd.ngram_jaccard_pairs(
        docs, threshold=0.0, max_shingle_df=cap, hot_shingle_obs=obs
    )
    got = {(r.id_a, r.id_b) for r in frame.collect()}
    # group A pairs all survive (shingle at the cap is kept) ...
    assert {(a, b) for a in range(cap) for b in range(cap) if a < b} <= got
    # ... and no group-B pair exists (its only shared shingle was hot)
    assert not any(a >= 100 and b >= 100 for a, b in got)
    # the counter saw exactly the one dropped shingle
    assert obs.get["n_hot_shingles_dropped"] == 1
    dd.release_cache(frame)


def test_prefix_variant_matches_plain_jaccard(spark, sf_smoke):
    """PPJoin prefix filtering is EXACT: identical pairs/Jaccards as the
    plain shingle self-join at the same threshold, on real docs."""
    docs = load_table(spark, sf_smoke, "documents").limit(80)
    plain = dd.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=None)
    pref = dd.ngram_jaccard_pairs_prefix(docs, threshold=0.5)
    rows_a = sorted(map(tuple, plain.collect()))
    rows_b = sorted(map(tuple, pref.collect()))
    assert rows_a == rows_b and rows_a  # non-trivial: corpus has dups
    dd.release_cache(plain)
    dd.release_cache(pref)


def test_prefix_order_sidelines_hot_shingles(spark):
    """Rarest-first ordering pushes boilerplate shingles out of every
    prefix: the hot corpus yields NO candidate pair from the shared
    boilerplate (each doc's unique tail shingles fill its prefix), while
    the plain join would meet C(40,2) times on it."""
    docs = _hot_corpus(spark)
    pref = dd.ngram_jaccard_pairs_prefix(docs, threshold=0.5)
    assert pref.count() == 0  # no pair reaches J >= 0.5
    dd.release_cache(pref)
    # identical docs still pair up through the prefix path
    dup_rows = [(1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon zeta"),
                (3, "totally different words here now friend")]
    dups = spark.createDataFrame(dup_rows, "doc_id int, text string")
    out = dd.ngram_jaccard_pairs_prefix(dups, threshold=0.5).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 1.0)]
    dd.release_cache(dups)


def test_spread_is_noop_when_partitioned(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par + 4)
    assert dd._spread(df) is df
    small = spark.range(10).coalesce(1)
    assert dd._spread(small).rdd.getNumPartitions() >= par


def test_release_cache_unpersists(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(40)
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.2)
    pairs.count()
    cached = getattr(pairs, "__graft_cached__", [])
    assert cached and any(d.storageLevel.useMemory for d in cached)
    dd.release_cache(pairs)
    assert all(not d.storageLevel.useMemory for d in cached)


def test_lsh_needs_no_cache(spark, sf_smoke):
    """The single-scan band explode leaves nothing persisted: banding is
    map-side, so there is no cached frame to leak (release_cache is a
    no-op on the result)."""
    docs = load_table(spark, sf_smoke, "documents").limit(40)
    pairs = dd.lsh_candidate_pairs(docs, n_hashes=4, band_size=2)
    assert pairs.count() >= 0
    assert not getattr(pairs, "__graft_cached__", ())
    dd.release_cache(pairs)  # still safe to call


def test_chi2_singular_fallback():
    var = np.array([[1.0, 1.0], [1.0, 1.0]])  # singular
    err = np.array([1.0, 2.0])
    out = chi2_stat(err, var)  # must not raise (r1 ADVICE: stray @ error)
    assert np.isfinite(out)


def test_limit_probe_config_restored(spark):
    from mrt_data_integration_spark.estimators import wcls
    from mrt_data_integration_spark.sources.generator import generate_panel

    key = "spark.sql.limit.initialNumPartitions"
    before = spark.conf.get(key, None)
    panel = generate_panel(spark, seed=7, n_internal=20, n_external=20, t_max=5)
    wcls(
        panel,
        x_h=[("intercept", F.lit(1.0)), ("x1", F.col("x1"))],
        moderators=[("one", F.lit(1.0)), ("x1", F.col("x1"))],
    )
    assert spark.conf.get(key, None) == before


def test_cross_corpus_candidates_find_copies(spark, sf_smoke):
    """lsh_cross_candidates (r5): documents copied from the reference
    corpus into the new batch must be flagged with sig_agreement 1.0;
    unrelated synthetic docs must not pair with anything."""
    docs = load_table(spark, sf_smoke, "documents").limit(60)
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    copies = docs.filter(F.col("doc_id") % 2 == 0).limit(10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    unrelated = spark.createDataFrame(
        [(200000 + i, f"zzq{i} unseen wormwood token stream {i*7} flux") for i in range(5)],
        "doc_id long, text string",
    )
    new = copies.unionByName(unrelated)
    cands = dd.lsh_cross_candidates(new, ref)
    rows = cands.collect()
    dd.release_cache(cands)
    flagged_new = {r["new_id"] for r in rows}
    # every copy pairs with its source at full signature agreement
    exact = {(r["new_id"], r["ref_id"]) for r in rows if r["sig_agreement"] == 1.0}
    copy_ids = {r["doc_id"] for r in copies.collect()}
    assert copy_ids <= flagged_new
    assert {(i, i - 100000) for i in copy_ids} <= exact
    # unrelated docs never collide
    assert not ({200000 + i for i in range(5)} & flagged_new)


def test_dedup_against_reference_removes_flagged_only(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(60)
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    copies = ref.limit(8).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    unrelated = spark.createDataFrame(
        [(300000 + i, f"qqz{i} nonesuch vellum quartz {i*13} ember") for i in range(4)],
        "doc_id long, text string",
    )
    new = copies.unionByName(unrelated)
    kept = dd.dedup_against_reference(new, ref, threshold=0.9)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    dd.release_cache(kept)
    assert kept_ids == {300000 + i for i in range(4)}


def test_cross_corpus_join_is_band_keyed(spark, sf_smoke):
    """The candidate join must be keyed by (band_id, band_key) — no
    cartesian, no Python eval — and bodies must not reach the join."""
    docs = load_table(spark, sf_smoke, "documents").limit(40)
    new = docs.limit(10).select((F.col("doc_id") + 50000).alias("doc_id"), "text")
    df = dd.lsh_cross_candidates(new, docs)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(jmode)
    dd.release_cache(df)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_lsh_store_matches_cross_candidates(spark, sf_smoke, tmp_path):
    """The persisted signature store must produce the SAME candidate
    pairs + agreement estimates as the recompute-both-sides
    lsh_cross_candidates, and appending batches must equal a bulk
    build (signatures are pure functions of text + params)."""
    from mrt_data_integration_spark.operators import dedup as dd

    docs = load_table(spark, sf_smoke, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    # new batch: odd ids, with planted copies of reference docs
    copies = ref.limit(5).select(
        (F.col("doc_id") + 1_000_001).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(copies)

    path = str(tmp_path / "store")
    dd.build_lsh_signature_store(ref, path, n_hashes=4, band_size=2)
    got = sorted(map(tuple, dd.lsh_store_candidates(
        spark, path, new
    ).collect()))
    want = sorted(map(tuple, dd.lsh_cross_candidates(
        new, ref, n_hashes=4, band_size=2
    ).collect()))
    assert got == want and len(got) >= 5  # planted copies all surface

    # incremental: half-build + append == bulk build
    path2 = str(tmp_path / "store2")
    dd.build_lsh_signature_store(
        ref.filter(F.col("doc_id") % 4 == 0), path2, n_hashes=4, band_size=2
    )
    n = dd.append_to_lsh_signature_store(
        ref.filter(F.col("doc_id") % 4 == 2), path2
    )
    assert n == ref.filter(F.col("doc_id") % 4 == 2).count()
    got2 = sorted(map(tuple, dd.lsh_store_candidates(
        spark, path2, new
    ).collect()))
    assert got2 == want


def test_split_chunks_reassemble_identity(spark):
    """Space-joining a doc's chunks in ord order must reproduce the
    text byte-identically — token boundaries partition, never
    overlap/drop (empty tokens from repeated spaces included)."""
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.operators.dedup import (
        split_content_chunks,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "short"),
        (3, "x"),
        (4, ""),        # excluded (no content)
        (5, None),      # excluded
        (6, "double  space and  trailing "),  # empty tokens round-trip
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.t
        for r in split_content_chunks(df)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("t")
        )
        .collect()
    }
    assert got == {
        1: rows[0][1], 2: "short", 3: "x", 6: rows[5][1]
    }


def test_remove_duplicate_spans_semantics(spark):
    """Planted verbatim passage shared by two docs: the earlier doc
    keeps it, the later doc loses exactly that span; an identical
    later doc empties entirely; unique docs pass through unchanged."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    passage = "copied boilerplate text that is long enough to anchor " * 3
    rows = [
        (1, "totally unique document alpha with its own words " * 2),
        (2, passage + " unique tail of document two"),
        (3, "unique head of document three " + passage),
        (4, rows_4 := "totally unique document alpha with its own words " * 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_duplicate_spans(df).collect()}
    # doc 1 first: keeps everything
    assert got[1].clean_text == rows[0][1]
    assert got[1].n_kept == got[1].n_chunks
    # doc 3 shares the passage with doc 2 (earlier) — its copy drops
    assert passage not in got[3].clean_text
    assert "unique head of document three" in got[3].clean_text
    assert got[3].n_kept < got[3].n_chunks
    # doc 2 (earlier id) keeps the passage
    assert passage in got[2].clean_text
    # doc 4 is byte-identical to doc 1 → every span already seen
    assert got[4].clean_text == ""
    assert got[4].n_kept == 0


def test_remove_duplicate_spans_unique_corpus_is_identity(spark):
    """With no cross- or within-doc repetition, the rewrite is the
    identity — randomized corpus, every doc reproduced byte-exactly."""
    import random

    from mrt_data_integration_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rng = random.Random(20260815)
    # distinct random alphanumeric docs — chunk-level collisions across
    # 30 docs of entropy this high have probability ~0
    rows = [
        (
            i,
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
                for _ in range(rng.randint(1, 300))
            ),
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_duplicate_spans(df).collect()}
    for i, t in rows:
        assert got[i].clean_text == t, i
        assert got[i].n_kept == got[i].n_chunks


def test_remove_duplicate_spans_randomized_python_twin(spark):
    """Seeded fuzz vs a from-first-principles twin of the WHOLE
    pipeline (token split, md5-bucket anchors, min-gap rule, global
    first-occurrence keep with the short-tail exemption, space-joined
    reassembly) on corpora with planted cross-doc passages, repeated
    spaces, and tiny docs."""
    import hashlib
    import random

    from mrt_data_integration_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(40)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 15)))
        for _ in range(4)
    ]
    rows = []
    for i in range(25):
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.4:
                parts.append(rng.choice(passages))  # planted duplicate
            else:
                parts.append(
                    " ".join(
                        rng.choice(vocab)
                        for _ in range(rng.randint(0, 10))
                    )
                )
        rows.append((i, " ".join(parts)))

    def twin(anchor_mod=8, min_tokens=4):
        per_doc = {}
        for did, text in rows:
            if not text:
                continue
            toks = text.split(" ")
            anchors = [
                i
                for i in range(2, len(toks) + 1)
                if int(hashlib.md5(toks[i - 1].encode()).hexdigest()[:4], 16)
                % anchor_mod
                == 0
            ]
            ka, prev = [], 1
            for j, a in enumerate(anchors):
                p = 1 if j == 0 else anchors[j - 1]
                if a - p >= min_tokens:
                    ka.append(a)
            bounds = [1] + ka + [len(toks) + 1]
            per_doc[did] = [
                (
                    " ".join(toks[bounds[i] - 1: bounds[i + 1] - 1]),
                    bounds[i + 1] - bounds[i],
                )
                for i in range(len(bounds) - 1)
            ]
        seen = set()
        out = {}
        for did in sorted(per_doc):
            kept = []
            for c, nt in per_doc[did]:
                h = hashlib.md5(c.encode()).hexdigest()
                first = h not in seen
                seen.add(h)
                if first or nt < min_tokens:
                    kept.append(c)
            out[did] = (
                " ".join(kept),
                len(per_doc[did]),
                len(kept),
            )
        return out

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_chunks, r.n_kept)
        for r in remove_duplicate_spans(df).collect()
    }
    want = twin()
    assert got == want, {
        k: (got.get(k), want.get(k))
        for k in set(got) | set(want)
        if got.get(k) != want.get(k)
    }


def test_substring_chunk_pairs_rejects_tiny_windows(spark):
    """chunk < 4 can't carry the 4-char anchor lookahead — fail at
    entry instead of an ANSI array-bounds crash mid-job."""
    import pytest

    from mrt_data_integration_spark.operators.dedup import (
        substring_chunk_pairs,
    )

    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 4"):
        substring_chunk_pairs(df, chunk=3)


def test_remove_boilerplate_spans_semantics(spark):
    """Planted passage shared by THREE docs: it drops from EVERY host
    (the complement of remove_duplicate_spans' keep-first rule — no
    'original' survives); unique docs pass through unchanged; a doc
    that is nothing but the shared passage empties entirely."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    # "that" is a CDC anchor token (md5 % 8 == 0), so boundaries cut
    # inside every repetition and the shared chunks align across hosts
    # regardless of offset — the same passage the dedup-half test uses
    passage = "copied boilerplate text that is long enough to anchor " * 3
    rows = [
        (1, "totally unique document alpha with its own words " * 2),
        (2, passage + " unique tail of document two"),
        (3, "unique head of document three " + passage),
        (4, passage.strip()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_boilerplate_spans(df).collect()}
    assert got[1].clean_text == rows[0][1]
    assert got[1].n_kept == got[1].n_chunks
    # the passage drops from BOTH docs 2 and 3 — dedup would have kept
    # doc 2's copy (earliest id); boilerplate removal keeps neither
    assert passage not in got[2].clean_text
    assert "unique tail of document two" in got[2].clean_text
    assert passage not in got[3].clean_text
    assert "unique head of document three" in got[3].clean_text
    # doc 4 is all chrome → rewrites to '' (trailing-space chunking of
    # the stripped passage may retain a sub-min_tokens tail; allow only
    # the always-kept short-tail exemption)
    assert got[4].n_kept <= 1


def test_remove_boilerplate_intra_doc_repetition_kept(spark):
    """The criterion is DISTINCT-DOC frequency: a passage repeated
    three times inside ONE document is repetition (doc_repetition_
    filter's jurisdiction), not boilerplate — it must survive."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    passage = "verbatim block repeated within a single host document "
    rows = [
        (1, (passage * 3).strip()),
        (2, "some other unrelated document body entirely " * 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_boilerplate_spans(df).collect()}
    assert got[1].clean_text == rows[0][1]
    assert got[1].n_kept == got[1].n_chunks


def test_remove_boilerplate_min_docs_threshold(spark):
    """min_docs=3 must NOT remove a two-host passage that min_docs=2
    removes — the threshold is the operator's only knob and the two
    settings must be strictly ordered."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    # "reserved" anchors (md5 % 8 == 0) — see the semantics test
    passage = "all rights reserved shared footer text for every host " * 3
    rows = [
        (1, passage + " body of the first hosting document"),
        (2, "body of the second hosting document " + passage),
        (3, "an unrelated third document with its own content " * 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    loose = {
        r.doc_id: r for r in remove_boilerplate_spans(df, min_docs=2).collect()
    }
    strict = {
        r.doc_id: r for r in remove_boilerplate_spans(df, min_docs=3).collect()
    }
    assert passage not in loose[1].clean_text
    assert passage not in loose[2].clean_text
    for did, text in rows:
        assert strict[did].clean_text == text, did
        assert strict[did].n_kept == strict[did].n_chunks


def test_remove_boilerplate_broadcast_flag_identical(spark):
    """broadcast_frequent=False (the template-farm escape hatch) must
    change the plan, never the rows."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    passage = "chrome navigation menu footer links about contact " * 2
    rows = [
        (i, f"doc {i} specific words here " + (passage if i % 2 else ""))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r.doc_id, r.clean_text, r.n_chunks, r.n_kept)
        for r in remove_boilerplate_spans(df).collect()
    )
    b = sorted(
        (r.doc_id, r.clean_text, r.n_chunks, r.n_kept)
        for r in remove_boilerplate_spans(
            df, broadcast_frequent=False
        ).collect()
    )
    assert a == b


def test_remove_boilerplate_randomized_python_twin(spark):
    """Seeded fuzz vs a from-first-principles twin of the WHOLE
    pipeline (token split, md5-bucket anchors, min-gap rule,
    distinct-doc frequency threshold with the short-tail exemption,
    space-joined reassembly) on corpora with planted cross-doc
    passages and tiny docs."""
    import hashlib
    import random

    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(40)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 15)))
        for _ in range(4)
    ]
    rows = []
    for i in range(25):
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.4:
                parts.append(rng.choice(passages))
            else:
                parts.append(
                    " ".join(
                        rng.choice(vocab)
                        for _ in range(rng.randint(0, 10))
                    )
                )
        rows.append((i, " ".join(parts)))

    def twin(anchor_mod=8, min_tokens=4, min_docs=2):
        per_doc = {}
        for did, text in rows:
            if not text:
                continue
            toks = text.split(" ")
            anchors = [
                i
                for i in range(2, len(toks) + 1)
                if int(hashlib.md5(toks[i - 1].encode()).hexdigest()[:4], 16)
                % anchor_mod
                == 0
            ]
            ka = []
            for j, a in enumerate(anchors):
                p = 1 if j == 0 else anchors[j - 1]
                if a - p >= min_tokens:
                    ka.append(a)
            bounds = [1] + ka + [len(toks) + 1]
            per_doc[did] = [
                (
                    " ".join(toks[bounds[i] - 1: bounds[i + 1] - 1]),
                    bounds[i + 1] - bounds[i],
                )
                for i in range(len(bounds) - 1)
            ]
        hosts: dict[str, set] = {}
        for did, chs in per_doc.items():
            for c, nt in chs:
                if nt >= min_tokens:
                    hosts.setdefault(
                        hashlib.md5(c.encode()).hexdigest(), set()
                    ).add(did)
        frequent = {h for h, ds in hosts.items() if len(ds) >= min_docs}
        out = {}
        for did, chs in per_doc.items():
            kept = [
                c
                for c, nt in chs
                if nt < min_tokens
                or hashlib.md5(c.encode()).hexdigest() not in frequent
            ]
            out[did] = (" ".join(kept), len(chs), len(kept))
        return out

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_chunks, r.n_kept)
        for r in remove_boilerplate_spans(df).collect()
    }
    want = twin()
    assert got == want, {
        k: (got.get(k), want.get(k))
        for k in set(got) | set(want)
        if got.get(k) != want.get(k)
    }


def test_remove_boilerplate_min_docs_guard(spark):
    """min_docs=1 would rewrite the whole corpus to its short tails —
    fail at entry."""
    import pytest

    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 2"):
        remove_boilerplate_spans(df, min_docs=1)
