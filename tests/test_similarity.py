"""ANN operator tests: IVF recall vs the exact baseline, and the LSH
pair path agreeing with the exact path on high-cosine pairs it surfaces.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators import similarity as sim
from mrt_data_integration_spark.sources import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["corpus_id"])
    return out


def test_ivf_recall_vs_brute_force(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(sim.brute_force_topk(emb, queries, k=5))
    approx = _topk_sets(
        sim.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3, seed=0)
    )
    assert set(exact) == set(approx)  # every query answered
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"


def test_ivf_full_probe_is_exact(spark, sf_smoke):
    """n_probe == n_centroids searches every cell ⇒ identical to the
    brute-force baseline (same tie-breaking)."""
    emb = load_table(spark, sf_smoke, "embeddings").filter(F.col("vec_id") < 200)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = sorted(map(tuple, sim.brute_force_topk(emb, queries, k=4).collect()))
    full = sorted(
        map(
            tuple,
            sim.ivf_topk(
                emb, queries, k=4, n_centroids=4, n_probe=4, seed=0
            ).collect(),
        )
    )
    assert exact == full


def test_lsh_pairs_subset_of_exact(spark, sf_smoke):
    """Every LSH-bucketed near-dup pair is an exact near-dup pair
    (bucketing only prunes candidates, never invents similarity)."""
    emb = load_table(spark, sf_smoke, "embeddings").filter(F.col("vec_id") < 150)
    hps = [
        [(((p * 64 + j) * 37) % 101 - 50) / 50.0 for j in range(64)]
        for p in range(4)
    ]
    exact = set(
        (r["id_a"], r["id_b"])
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.3).collect()
    )
    lsh = set(
        (r["id_a"], r["id_b"])
        for r in sim.cosine_near_dup_pairs(
            emb, threshold=0.3, hyperplanes=hps
        ).collect()
    )
    assert lsh <= exact


def test_multiprobe_recall_monotone(spark, sf_smoke):
    """Multi-probe LSH (Lv et al. VLDB'07): probing Hamming-1 buckets
    recovers near-misses, so recall vs brute force is monotone in
    n_probe_bits, reaches the single-probe result at 0, and emits no
    duplicate (query, corpus) rows."""
    emb = load_table(spark, sf_smoke, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 20)
    queries = emb.filter(F.col("vec_id") < 20)
    hps = [
        [(((p * 64 + j) * 53) % 103 - 51) / 51.0 for j in range(64)]
        for p in range(6)
    ]
    truth = {
        (r["query_id"], r["corpus_id"])
        for r in sim.brute_force_topk(corpus, queries, k=5).collect()
    }

    def recall(bits):
        rows = sim.lsh_topk(corpus, queries, hps, k=5, n_probe_bits=bits).collect()
        pairs = [(r["query_id"], r["corpus_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))  # no duplicate candidates
        return len(set(pairs) & truth) / len(truth)

    r0, r3, r6 = recall(0), recall(3), recall(6)
    assert r0 <= r3 <= r6
    assert r6 > r0  # probing must actually recover near-misses here


def test_ivf_topk_exact_pinned(spark):
    """Hash-pin (round-2 item #7): fixed seed + fixed constructed corpus
    makes the KMeans cells deterministic, so the EXACT top-k output is
    pinned — probe-scoring regressions can't hide behind the driver's
    rows-only `no_oracle` check for ivf_topk."""
    rows = []
    for cid in range(4):
        for j in range(10):
            vid = cid * 10 + j
            vec = [0.0] * 8
            vec[cid * 2] = 1.0
            vec[(cid * 2 + 1) % 8] = 0.3
            vec[(vid * 3) % 8] += ((vid * 7) % 13 - 6) / 40.0
            rows.append((vid, [float(round(x, 6)) for x in vec]))
    corpus = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    ).coalesce(1)
    queries = corpus.filter("vec_id in (0, 15, 27, 38)")
    res = sim.ivf_topk(corpus, queries, k=3, n_centroids=4, n_probe=2, seed=0)
    got = sorted(map(tuple, res.collect()))
    expected = [
        (0, 1, 0.9986, 3),
        (0, 3, 1.0, 1),
        (0, 8, 0.9994, 2),
        (15, 10, 0.9926, 3),
        (15, 12, 0.9929, 1),
        (15, 14, 0.9929, 2),
        (27, 20, 0.9994, 3),
        (27, 23, 0.9994, 2),
        (27, 25, 0.9997, 1),
        (38, 31, 0.9974, 3),
        (38, 34, 0.9999, 1),
        (38, 36, 0.9997, 2),
    ]
    assert got == expected


def test_pq_topk_recall_and_determinism(spark, sf_smoke):
    """PQ+re-rank must reach high recall vs brute force on the smoke
    embeddings, and be bit-deterministic for a fixed seed (numpy
    k-means codebooks, no MLlib randomness)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(sim.brute_force_topk(emb, queries, k=5))
    run1 = sorted(map(tuple, sim.pq_topk(emb, queries, k=5, seed=0).collect()))
    run2 = sorted(map(tuple, sim.pq_topk(emb, queries, k=5, seed=0).collect()))
    assert run1 == run2, "PQ output must be deterministic for a fixed seed"
    approx = {}
    for qid, cid, _, _ in run1:
        approx.setdefault(qid, set()).add(cid)
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.8, f"PQ recall {hits}/{total}"


def test_ivfpq_recall_and_determinism(spark, sf_smoke):
    """IVFADC (r5): probing half the cells with residual-PQ codes must
    reach ≥0.7 recall vs brute force on the smoke embeddings, rise with
    n_probe, and be bit-deterministic for a fixed seed (MLlib KMeans
    seed + numpy codebooks)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(sim.brute_force_topk(emb, queries, k=5))

    def recall(n_probe):
        approx = _topk_sets(
            sim.ivfpq_topk(emb, queries, k=5, n_cells=8, n_probe=n_probe, seed=0)
        )
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return hits / sum(len(exact[q]) for q in exact)

    r4 = recall(4)
    assert r4 >= 0.7, f"IVFPQ recall {r4}"
    assert recall(8) >= r4  # full probe can only widen the candidate set
    run1 = sorted(
        map(tuple, sim.ivfpq_topk(emb, queries, k=5, n_cells=8, n_probe=4, seed=0).collect())
    )
    run2 = sorted(
        map(tuple, sim.ivfpq_topk(emb, queries, k=5, n_cells=8, n_probe=4, seed=0).collect())
    )
    assert run1 == run2, "IVFPQ output must be deterministic for a fixed seed"


def test_ivfpq_full_probe_large_rerank_is_exact(spark, sf_smoke):
    """n_probe == n_cells scans every cell; with a rerank window big
    enough to absorb ADC quantization error the exact re-rank recovers
    the brute-force answer — pins the q·c + LUT·codes ADC identity
    (a wrong residual/LUT composition would corrupt candidate order and
    miss true neighbors even at full probe)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = sorted(map(tuple, sim.brute_force_topk(emb, queries, k=3).collect()))
    got = sorted(
        map(
            tuple,
            sim.ivfpq_topk(
                emb, queries, k=3, n_cells=8, n_probe=8, rerank_factor=30, seed=0
            ).collect(),
        )
    )
    assert got == exact


def test_ivfpq_persisted_index_matches_online(spark, sf_smoke, tmp_path):
    """build_ivfpq_index + ivfpq_index_topk must reproduce ivfpq_topk
    exactly (same deterministic training → same cells/codes/LUTs), the
    codes table must be cell-partitioned on disk, and the probe join
    must trigger dynamic partition pruning so only probed cells' files
    are read."""
    import os

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    online = sorted(
        map(tuple, sim.ivfpq_topk(emb, queries, k=5, n_cells=8, n_probe=4, seed=0).collect())
    )
    path = str(tmp_path / "idx")
    sim.build_ivfpq_index(emb, path, n_cells=8, seed=0)
    assert sorted(os.listdir(path)) == ["codes", "meta.json"]
    cells = [d for d in os.listdir(os.path.join(path, "codes")) if d.startswith("cell=")]
    assert len(cells) == 8, "codes table must be partitioned by cell"
    df = sim.ivfpq_index_topk(spark, path, queries, emb, k=5, n_probe=4)
    assert sorted(map(tuple, df.collect())) == online
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "dynamicpruning" in plan.lower(), (
        "probe join must prune codes partitions dynamically"
    )


def test_pq_topk_degenerate_inputs(spark):
    """ADVICE r4: an empty corpus must yield an empty result (not a
    TypeError on the dimension probe), and a corpus smaller than
    n_centroids must clamp the codebook size instead of crashing
    np.random.choice(replace=False)."""
    schema = "vec_id int, embedding array<float>"
    empty = spark.createDataFrame([], schema)
    queries = spark.createDataFrame([(0, [1.0] * 8)], schema)
    assert sim.pq_topk(empty, queries, k=3).count() == 0

    tiny_rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]) for i in range(5)]
    tiny = spark.createDataFrame(tiny_rows, schema)
    got = sim.pq_topk(
        tiny, tiny.filter("vec_id = 0"), k=2,
        n_subspaces=4, n_centroids=16, train_sample=5, seed=0,
    )
    exact = sim.brute_force_topk(tiny, tiny.filter("vec_id = 0"), k=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))


def test_bounded_topk_matches_single_window_any_partitioning(spark):
    """The two-stage ranking must return exactly the single-window
    top-k regardless of how the scored frame is partitioned (the local
    stage can only discard rows that cannot be in the global top-k)."""
    from pyspark.sql import Window

    rows = [
        (q, c, float(((q * 31 + c * 17) % 97) - 48) / 7.0)
        for q in range(4)
        for c in range(200)
    ]
    base = spark.createDataFrame(rows, "query_id int, corpus_id int, s double")
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("corpus_id"))
    expected = sorted(
        map(
            tuple,
            base.withColumn("rk", F.row_number().over(w))
            .filter("rk <= 7")
            .collect(),
        )
    )
    for parts in (1, 3, 32):
        got = sorted(
            map(tuple, sim.bounded_topk(base.repartition(parts), 7, "s").collect())
        )
        assert got == expected, f"bounded_topk diverged at {parts} partitions"
    # tree_fan (intermediate reduction for extreme partition counts) must
    # not change the answer either, for any fan relative to P
    for fan in (1, 4, 64):
        got = sorted(
            map(
                tuple,
                sim.bounded_topk(base.repartition(32), 7, "s", tree_fan=fan).collect(),
            )
        )
        assert got == expected, f"bounded_topk(tree_fan={fan}) diverged"


def test_pq_topk_exact_on_clustered_corpus(spark):
    """On a corpus with strong cluster structure the PQ codes preserve
    ranking and the re-rank recovers the exact brute-force top-k."""
    rows = []
    for cid in range(4):
        for j in range(12):
            vid = cid * 12 + j
            vec = [0.0] * 16
            vec[cid * 4] = 1.0
            vec[(vid * 5) % 16] += ((vid * 11) % 7 - 3) / 25.0
            rows.append((vid, [float(round(x, 6)) for x in vec]))
    corpus = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    ).coalesce(1)
    queries = corpus.filter("vec_id in (0, 13, 26, 39)")
    exact = sorted(map(tuple, sim.brute_force_topk(corpus, queries, k=3).collect()))
    pq = sorted(
        map(
            tuple,
            sim.pq_topk(
                corpus, queries, k=3, n_subspaces=4, n_centroids=8,
                rerank_factor=6, seed=0, train_sample=48,
            ).collect(),
        )
    )
    assert pq == exact


def _toy_embeddings(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_dedup_drops_planted_copies(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    copies = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        "label",
    )
    n_copies = copies.count()
    out = sim.semantic_dedup(emb.unionByName(copies), eps=0.999)
    dropped = {r["vec_id"] for r in out.filter(~F.col("keep")).collect()}
    # exactly the scaled copies are dropped (cosine(x, 2x) = 1 > eps;
    # nothing else in the synthetic corpus comes near eps), and the
    # original of each copy survives (min-id keep rule)
    assert dropped == {
        r["vec_id"] + 10_000
        for r in emb.filter(F.col("vec_id") % 20 == 0).select("vec_id").collect()
    }
    assert len(dropped) == n_copies


def test_semantic_dedup_exact_components_keeps_one_per_chain(spark):
    # chain inside one cell: v0~v1~v2 pairwise ≥ eps via small angular
    # steps; greedy drops 1 and 2; exact components also keeps only v0
    base = [1.0, 0.0]
    import math

    def rot(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [(0, base), (1, rot(0.02)), (2, rot(0.04)), (10, [-1.0, 0.05])]
    emb = _toy_embeddings(spark, rows)
    for exact in (False, True):
        out = {
            r["vec_id"]: r["keep"]
            for r in sim.semantic_dedup(
                emb, eps=0.999, n_centroids=2, exact_components=exact
            ).collect()
        }
        assert out[0] and not out[1] and not out[2], exact
        assert out[10], exact  # the far vector is untouched


def test_semantic_dedup_deterministic(spark, sf_smoke):
    """Bit-identical output — including CELL IDS — under ANY input
    partitioning: the sample is an id-ordered prefix, the fit is seeded
    numpy, assignment is a pure function. (The earlier MLlib fit was
    only same-partitioning-stable.)"""
    emb = load_table(spark, sf_smoke, "embeddings")
    a = sorted(map(tuple, sim.semantic_dedup(emb, eps=0.9).collect()))
    b = sorted(map(tuple, sim.semantic_dedup(emb, eps=0.9).collect()))
    c = sorted(map(tuple, sim.semantic_dedup(
        emb.repartition(13), eps=0.9
    ).collect()))
    d = sorted(map(tuple, sim.semantic_dedup(
        emb.coalesce(1), eps=0.9
    ).collect()))
    assert a == b == c == d


def test_semantic_dedup_never_drops_unique_vectors(spark, sf_smoke):
    # the synthetic corpus has max pairwise cosine ≈ 0.51 — at eps=0.9
    # everything must survive in both modes
    emb = load_table(spark, sf_smoke, "embeddings")
    assert sim.semantic_dedup(emb, eps=0.9).filter(~F.col("keep")).count() == 0
    assert (
        sim.semantic_dedup(emb, eps=0.9, exact_components=True)
        .filter(~F.col("keep"))
        .count()
        == 0
    )


def test_bounded_topk_ascending_matches_single_window(spark):
    from pyspark.sql import Window

    rows = [(k, i, float(((i * 37 + k * 11) % 100))) for k in range(4) for i in range(200)]
    df = spark.createDataFrame(rows, ["query_id", "corpus_id", "score"]).repartition(16)
    got = sorted(
        map(
            tuple,
            sim.bounded_topk(df, 7, "score", ascending=True)
            .select("query_id", "corpus_id", "rk")
            .collect(),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").asc(), F.col("corpus_id"))
    ref = sorted(
        map(
            tuple,
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 7)
            .select("query_id", "corpus_id", "rk")
            .collect(),
        )
    )
    assert got == ref


def test_semantic_dedup_blas_matches_expr_pairs(spark, sf_smoke):
    """Differential: the per-cell BLAS matmul pair path and the pure-JVM
    expression join must produce identical keep decisions (eps far from
    any float boundary in this corpus: max natural cosine ≈ 0.51,
    planted copies at exactly 1.0)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
        "label",
    )
    seeded = emb.unionByName(copies)
    for exact in (False, True):
        blas = sorted(
            map(tuple, sim.semantic_dedup(
                seeded, eps=0.99, exact_components=exact,
                pair_strategy="blas",
            ).collect())
        )
        expr = sorted(
            map(tuple, sim.semantic_dedup(
                seeded, eps=0.99, exact_components=exact,
                pair_strategy="expr",
            ).collect())
        )
        assert blas == expr, exact


def test_semantic_dedup_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sim.semantic_dedup(empty).collect() == []
    one = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    rows = sim.semantic_dedup(one, n_centroids=4).collect()
    assert len(rows) == 1 and rows[0]["keep"]


def test_ivfpq_encode_blas_matches_expr(spark, sf_smoke):
    """Differential: the BLAS encode and the expression encode must emit
    identical (cell, codes, norm-to-6dp) for every vector — same
    centroid tables, same argmax tie rule (lowest id)."""
    from mrt_data_integration_spark.operators.similarity import (
        _ivfpq_encode,
        _ivfpq_train,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    idx = _ivfpq_train(emb, 8, 16, 16, 0, 2048, "vec_id", "embedding")

    def snap(strategy):
        return {
            r["corpus_id"]: (
                r["__cell__"], tuple(r["__codes__"]), round(r["__cn__"], 6)
            )
            for r in _ivfpq_encode(
                emb, idx, "vec_id", "embedding", strategy=strategy
            ).collect()
        }

    assert snap("blas") == snap("expr")


def test_pq_encode_blas_matches_expr(spark, sf_smoke):
    """Differential: pq_topk's two encode strategies must produce
    identical final rankings on the smoke corpus (codes equal ⇒ ADC
    scores equal ⇒ same candidates ⇒ same exact re-rank)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    blas = sorted(map(tuple, sim.pq_topk(
        emb, queries, k=5, seed=0, encode_strategy="blas"
    ).collect()))
    expr = sorted(map(tuple, sim.pq_topk(
        emb, queries, k=5, seed=0, encode_strategy="expr"
    ).collect()))
    assert blas == expr


def test_pq_topk_preserves_string_ids_both_strategies(spark, sf_smoke):
    """The blas encode path derives corpus_id's type from the input
    schema — a string-id corpus must survive both strategies with the
    SAME result and a string-typed id column (it was silently hard-coded
    to long before r6)."""
    emb = (
        load_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id") < 60)
        .select(F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
                "embedding")
    )
    queries = emb.filter(F.col("vec_id").isin("doc-1", "doc-2"))
    outs = {}
    for strategy in ("blas", "expr"):
        df = sim.pq_topk(
            emb, queries, k=3, seed=0, encode_strategy=strategy
        )
        assert df.schema["corpus_id"].dataType.simpleString() == "string"
        assert df.schema["query_id"].dataType.simpleString() == "string"
        outs[strategy] = sorted(map(tuple, df.collect()))
    assert outs["blas"] == outs["expr"]
    assert len(outs["blas"]) == 6


def test_semantic_dedup_blocked_pairs_on_one_dense_cell(spark, sf_smoke, monkeypatch):
    """Cell-size bound: with n_centroids=1 EVERY vector lands in one
    cell, and a tiny _PAIR_BLOCK_BYTES forces the blas scorer through
    many row blocks — the result must still equal the unblocked
    expression self-join (same pairs ⇒ same keep flags), proving one
    pathological dense cell degrades to bounded-memory blocks instead
    of an n² matrix."""
    emb = load_table(spark, sf_smoke, "embeddings").filter(F.col("vec_id") < 300)
    # ~240 bytes of scores per block → block of 1-2 rows at n=300.
    monkeypatch.setattr(sim, "_PAIR_BLOCK_BYTES", 4096)
    blocked = sorted(map(tuple, sim.semantic_dedup(
        emb, eps=0.9, n_centroids=1, pair_strategy="blas"
    ).collect()))
    expr = sorted(map(tuple, sim.semantic_dedup(
        emb, eps=0.9, n_centroids=1, pair_strategy="expr"
    ).collect()))
    assert blocked == expr
    assert len(blocked) == 300


def test_ivfpq_index_append_equals_bulk_encode(spark, sf_smoke, tmp_path):
    """Incremental append: codes written by append_to_ivfpq_index must
    be row-identical to what a bulk encode of the same rows under the
    same (frozen) meta produces, and a query must find vectors from the
    appended batch — the existing corpus is never rescanned."""
    emb = load_table(spark, sf_smoke, "embeddings")
    first = emb.filter(F.col("vec_id") < 150)
    rest = emb.filter(F.col("vec_id") >= 150)
    path = str(tmp_path / "idx")
    sim.build_ivfpq_index(first, path, n_cells=4, train_sample=512)
    n = sim.append_to_ivfpq_index(spark, path, rest)
    assert n == rest.count()
    table = spark.read.parquet(path + "/codes")
    assert table.count() == emb.count()
    # Appended rows' codes == online encode of the same rows with the
    # same meta (codes are a pure function of vector + meta).
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        idx = json.load(fh)
    online = sim._ivfpq_encode(rest, idx, "vec_id", "embedding",
                               strategy="blas", keep_vec=False)
    got = sorted(map(tuple, table.filter(F.col("corpus_id") >= 150)
                 .select("corpus_id", "cell", "codes").collect()))
    want = sorted(map(tuple, online
                  .select("corpus_id", F.col("__cell__").cast("long"),
                          "__codes__").collect()))
    assert got == want
    # End-to-end: a query vector from the appended batch must surface
    # appended neighbors (the planted scaled copy has cosine 1.0).
    q = rest.filter(F.col("vec_id") == 200)
    planted = q.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                       F.transform("embedding", lambda x: x * F.lit(2.0))
                       .cast("array<float>").alias("embedding"),
                       "label")
    sim.append_to_ivfpq_index(spark, path, planted)
    full = emb.unionByName(planted)
    res = sim.ivfpq_index_topk(spark, path, q, full, k=3, n_probe=4)
    top = res.filter("rk = 1").collect()[0]
    assert top["corpus_id"] == 1_000_200 and top["cosine_sim"] >= 0.9999


def test_weighted_sample_prefers_heavy_weights(spark):
    """A-ES sanity: with one overwhelming weight per group, the heavy
    row must take rank 1 (key u^(1/w) → 1 as w → ∞ for any u > 0)."""
    from mrt_data_integration_spark.queries import QUERIES

    rows = [("en", i, 1_000_000 if i == 7 else 2) for i in range(40)]
    rows += [("de", 100 + i, 1_000_000 if i == 3 else 2) for i in range(40)]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["lang", "doc_id", "n_chars"])
    import tempfile, os
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["weighted_doc_sample"](spark, d).filter("rk = 1").collect()
    got = {r["lang"]: r["doc_id"] for r in out}
    assert got == {"en": 7, "de": 103}


def test_hard_negative_topk_semantics(spark):
    """Hard negatives: most-similar DIFFERENT-label vectors, same-label
    rows and self excluded by construction, numpy twin agreement."""
    import numpy as np

    from mrt_data_integration_spark.operators.similarity import (
        hard_negative_topk,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    labels = [f"l{i % 4}" for i in range(40)]
    emb = spark.createDataFrame(
        [(i, labels[i], [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, label string, embedding array<float>",
    )
    anchors = emb.filter("vec_id < 3")
    out = hard_negative_topk(emb, anchors, k=4)
    rows = out.collect()
    # no same-label negative, no self
    lbl = dict(enumerate(labels))
    for r in rows:
        assert r.negative_label != lbl[r.anchor_id]
        assert r.negative_id != r.anchor_id

    # numpy twin for anchor 0
    v = vecs.astype("float64")
    n = np.linalg.norm(v, axis=1)
    cs = (v @ v[0]) / (n * n[0])
    cands = sorted(
        ((round(float(cs[j]), 4), j) for j in range(40) if lbl[j] != lbl[0]),
        key=lambda p: (-p[0], p[1]),
    )[:4]
    got = sorted(
        ((r.cosine_sim, r.negative_id) for r in rows if r.anchor_id == 0),
        key=lambda p: (-p[0], p[1]),
    )
    assert [(round(s, 4), j) for s, j in cands] == [
        (round(s, 4), j) for s, j in got
    ]


def test_hard_negative_min_sim_floor(spark):
    from mrt_data_integration_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, "a", [1.0, 0.0]),
            (1, "b", [0.99, 0.14]),  # hard negative (cos ≈ 0.990)
            (2, "b", [0.0, 1.0]),  # easy negative (cos = 0)
            (3, "a", [1.0, 0.01]),  # same label — never a negative
        ],
        "vec_id long, label string, embedding array<float>",
    )
    anchors = emb.filter("vec_id = 0")
    out = hard_negative_topk(emb, anchors, k=5, min_sim=0.5).collect()
    assert [(r.negative_id, r.rank) for r in out] == [(1, 1)]


def test_hard_negative_null_labels_null_safe(spark):
    """NULL labels: unlabeled corpus rows ARE candidates for labeled
    anchors (and vice versa); two unlabeled rows are conservatively
    same-class. A plain != would drop NULL-labeled rows entirely."""
    from mrt_data_integration_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, "a", [1.0, 0.0]),
            (1, None, [0.99, 0.14]),   # unlabeled — valid negative for 0
            (2, "b", [0.9, 0.44]),
            (3, None, [0.98, 0.2]),    # unlabeled anchor below
        ],
        "vec_id long, label string, embedding array<float>",
    )
    out = hard_negative_topk(emb, emb.filter("vec_id = 0"), k=5).collect()
    assert sorted(r.negative_id for r in out) == [1, 2, 3]

    # unlabeled anchor: labeled rows are negatives, the OTHER unlabeled
    # row is excluded (NULL eqNullSafe NULL — possible false negative)
    out3 = hard_negative_topk(emb, emb.filter("vec_id = 3"), k=5).collect()
    assert sorted(r.negative_id for r in out3) == [0, 2]


def test_hard_negative_ivf_full_probe_equals_brute(spark):
    """The IVF-composed hard-negative path with n_probe == n_centroids
    must reproduce the brute operator exactly (both rank on
    (cosine DESC, id); full probe sees every cell), and at partial
    probe it stays a subset-quality approximation (recall floor)."""
    import numpy as np

    from mrt_data_integration_spark.operators.similarity import (
        hard_negative_ivf_topk,
        hard_negative_topk,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype("float32")
    emb = spark.createDataFrame(
        [
            (i, f"l{i % 3}" if i % 7 else None, [float(x) for x in vecs[i]])
            for i in range(60)
        ],
        "vec_id long, label string, embedding array<float>",
    )
    anchors = emb.filter("vec_id < 4")
    want = {
        (r.anchor_id, r.rank, r.negative_id, r.negative_label, r.cosine_sim)
        for r in hard_negative_topk(emb, anchors, k=5).collect()
    }
    got = {
        (r.anchor_id, r.rank, r.negative_id, r.negative_label, r.cosine_sim)
        for r in hard_negative_ivf_topk(
            emb, anchors, k=5, n_centroids=4, n_probe=4
        ).collect()
    }
    assert got == want

    # partial probe: a valid ranked subset — every returned negative is
    # a genuine different-label vector, ranks contiguous from 1
    part = hard_negative_ivf_topk(
        emb, anchors, k=5, n_centroids=4, n_probe=2
    ).collect()
    lbl = {r.vec_id: r.label for r in emb.collect()}
    by_anchor = {}
    for r in part:
        assert lbl[r.negative_id] != lbl[r.anchor_id] or (
            (lbl[r.negative_id] is None) != (lbl[r.anchor_id] is None)
        )
        by_anchor.setdefault(r.anchor_id, []).append(r.rank)
    for a, ranks in by_anchor.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), a


def test_ivf_probe_topk_full_probe_equals_brute(spark):
    """ivf_probe_topk with a kmeans_lloyd index and n_probe == k cells
    must reproduce the brute hard-negative operator exactly (full
    probe sees every cell; both rank on (cosine DESC, id)) — the
    train/probe decoupling changes the index source, never the
    semantics."""
    import numpy as np

    from mrt_data_integration_spark.operators.cluster import kmeans_lloyd
    from mrt_data_integration_spark.operators.dedup import release_cache
    from mrt_data_integration_spark.operators.similarity import (
        hard_negative_topk,
        ivf_probe_topk,
    )

    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(60, 8)).astype("float32")
    emb = spark.createDataFrame(
        [
            (i, f"l{i % 3}" if i % 7 else None, [float(x) for x in vecs[i]])
            for i in range(60)
        ],
        "vec_id long, label string, embedding array<float>",
    )
    anchors = emb.filter("vec_id < 4")
    assignments, centers = kmeans_lloyd(emb, k=4, n_iter=2)
    corpus = assignments.join(emb.select("vec_id", "label"), "vec_id")
    want = {
        (r.anchor_id, r.rank, r.negative_id, r.negative_label, r.cosine_sim)
        for r in hard_negative_topk(emb, anchors, k=5).collect()
    }
    got = {
        (r.query_id, r.rk, r.corpus_id, r.corpus_label, r.cosine_sim)
        for r in ivf_probe_topk(
            corpus, anchors, centers, k=5, n_probe=4, label_col="label"
        ).collect()
    }
    release_cache(assignments)
    assert got == want


def test_ivf_probe_topk_contracts(spark):
    """Empty centers fail fast; without label_col the probe excludes
    self-matches (the plain-IVF pair rule) and needs no label column
    in the corpus frame."""
    import pytest

    from mrt_data_integration_spark.operators.similarity import (
        ivf_probe_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 2) for i in range(8)],
        "vec_id long, embedding array<double>, cell int",
    )
    with pytest.raises(ValueError, match="non-empty"):
        ivf_probe_topk(emb, emb, [], k=2)
    centers = [[0.0, 1.0], [8.0, 1.0]]
    out = ivf_probe_topk(
        emb, emb.filter("vec_id = 0"), centers, k=3, n_probe=2
    ).collect()
    assert all(r.corpus_id != 0 for r in out)
    assert [r.rk for r in out] == [1, 2, 3]


def test_ivf_probe_topk_ragged_centers_rejected(spark):
    """A ragged centers list would zip_with-pad and rank cells on NULL
    distances silently — entry-time ValueError instead."""
    import pytest

    from mrt_data_integration_spark.operators.similarity import (
        ivf_probe_topk,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)], "vec_id long, embedding array<double>, cell int"
    )
    with pytest.raises(ValueError, match="one dimension"):
        ivf_probe_topk(emb, emb, [[0.0, 1.0], [1.0]], k=1)


def test_margin_knn_pairs_numpy_twin(spark):
    """Full-pipeline twin on random corpora: cosines, bidirectional
    top-k neighborhoods, rounded averages, margin, mutuality — exact
    row set equality."""
    import numpy as np

    from mrt_data_integration_spark.operators.dedup import release_cache
    from mrt_data_integration_spark.operators.similarity import (
        margin_knn_pairs,
    )

    rng = np.random.default_rng(21)
    S = rng.normal(size=(17, 6)); T = rng.normal(size=(23, 6))
    src = spark.createDataFrame(
        [(i, [float(x) for x in S[i]]) for i in range(17)],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(100 + j, [float(x) for x in T[j]]) for j in range(23)],
        "vec_id long, embedding array<double>",
    )
    out = margin_knn_pairs(src, tgt, k=4)
    got = {
        r.src_id: (r.tgt_id, r.cosine_sim, r.margin, r.mutual)
        for r in out.collect()
    }
    release_cache(out)

    def cos(a, b):
        return float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))

    cs = {(i, 100 + j): cos(S[i], T[j]) for i in range(17) for j in range(23)}
    want = {}
    bbest = {}
    bavg = {}
    for j in range(23):
        ranked = sorted(range(17), key=lambda i: (-cs[(i, 100 + j)], i))
        bbest[100 + j] = ranked[0]
        bavg[100 + j] = round(
            sum(cs[(i, 100 + j)] for i in ranked[:4]) / 4, 12
        )
    for i in range(17):
        ranked = sorted(range(23), key=lambda j: (-cs[(i, 100 + j)], j))
        best = 100 + ranked[0]
        favg = round(sum(cs[(i, 100 + j)] for j in ranked[:4]) / 4, 12)
        fcos = cs[(i, best)]
        denom = (favg + bavg[best]) / 2
        want[i] = (
            best,
            round(fcos, 4),
            round(fcos / denom, 4) if denom != 0 else None,
            bbest[best] == i,
        )
    assert got == want


def test_margin_knn_hub_correction(spark):
    """The criterion's point: a HUB target (near-equally close to every
    source) scores a LOWER margin than a genuinely aligned pair of the
    same raw cosine — its own neighborhood average is inflated, which
    is exactly the denominator."""
    from mrt_data_integration_spark.operators.similarity import (
        margin_knn_pairs,
    )

    # sources: near-orthogonal directions; tgt 100 = hub (diagonal —
    # cosine ~0.57 to all three), tgt 101 = aligned with src 1 only
    src = spark.createDataFrame(
        [
            (0, [1.0, 0.05, 0.0]),
            (1, [0.05, 1.0, 0.0]),
            (2, [0.0, 0.05, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(100, [1.0, 1.0, 1.0]), (101, [0.06, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.src_id: r for r in margin_knn_pairs(src, tgt, k=2).collect()}
    # src 1's best is the aligned 101, mutually; srcs 0/2 fall to the hub
    assert out[1].tgt_id == 101 and out[1].mutual
    assert out[0].tgt_id == 100 and out[2].tgt_id == 100
    # aligned pair out-margins the hub pairs
    assert out[1].margin > out[0].margin
    assert out[1].margin > out[2].margin


def test_margin_knn_null_and_grain(spark):
    """NULL embeddings are excluded on both sides; output is one row
    per surviving source."""
    from mrt_data_integration_spark.operators.similarity import (
        margin_knn_pairs,
    )

    src = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(10, [1.0, 1.0]), (11, None)],
        "vec_id long, embedding array<double>",
    )
    rows = margin_knn_pairs(src, tgt, k=2).collect()
    assert sorted(r.src_id for r in rows) == [0, 2]
    assert all(r.tgt_id == 10 and r.mutual in (True, False) for r in rows)


def test_margin_knn_ivf_full_probe_equals_brute(spark):
    """margin_knn_pairs_ivf with n_probe == n_centroids on BOTH
    deterministic Lloyd's indexes reproduces the brute margins exactly
    — the composition changes the candidate source, never the
    criterion."""
    import numpy as np

    from mrt_data_integration_spark.operators.cluster import kmeans_lloyd
    from mrt_data_integration_spark.operators.dedup import release_cache
    from mrt_data_integration_spark.operators.similarity import (
        margin_knn_pairs,
        margin_knn_pairs_ivf,
    )

    rng = np.random.default_rng(33)
    S = rng.normal(size=(20, 6)); T = rng.normal(size=(26, 6))
    src = spark.createDataFrame(
        [(i, [float(x) for x in S[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        # OVERLAPPING id space with src — the exclude_self=False case
        [(j, [float(x) for x in T[j]]) for j in range(26)],
        "vec_id long, embedding array<double>",
    )
    sa, sc = kmeans_lloyd(src, k=3, n_iter=2)
    ta, tc = kmeans_lloyd(tgt, k=3, n_iter=2)
    src_c = src.join(sa.select("vec_id", "cell"), "vec_id")
    tgt_c = tgt.join(ta.select("vec_id", "cell"), "vec_id")
    brute = margin_knn_pairs(src, tgt, k=4)
    want = sorted(map(tuple, brute.collect()))
    got = sorted(
        map(
            tuple,
            margin_knn_pairs_ivf(
                src_c, tgt_c, sc, tc, k=4, n_probe=3
            ).collect(),
        )
    )
    release_cache(brute)
    release_cache(sa)
    release_cache(ta)
    assert got == want

    # partial probe: still one row per surviving source, margins are
    # well-formed, mutual is boolean
    part = margin_knn_pairs_ivf(src_c, tgt_c, sc, tc, k=4, n_probe=1).collect()
    assert len({r.src_id for r in part}) == len(part) <= 20
    assert all(r.mutual in (True, False) for r in part)


def test_margin_knn_ivf_backward_hole_keeps_source(spark):
    """A source whose best target has NO backward probe candidates (the
    target's probed cells in the source index are empty) must be KEPT
    with a NULL margin and mutual=false — the r11 ADVICE asymmetry: the
    old inner backward join dropped it silently. Hand-built indexes
    force the hole: every source row sits in source-index cell 0, but
    the source-centers list steers every target's single probe to cell
    1, so the backward probe finds nothing."""
    from mrt_data_integration_spark.operators.similarity import (
        margin_knn_pairs_ivf,
    )

    src = spark.createDataFrame(
        [(1, [1.0, 0.1], 0), (2, [1.0, -0.1], 0)],
        "vec_id long, embedding array<double>, cell int",
    )
    tgt = spark.createDataFrame(
        [(10, [1.0, 0.0], 0), (11, [0.9, 0.3], 0)],
        "vec_id long, embedding array<double>, cell int",
    )
    # tgt index: one center → forward probe sees every target.
    # src index centers: targets (≈[1,0]) are nearest center 1, but all
    # src rows carry cell 0 → backward probe candidates: none.
    rows = margin_knn_pairs_ivf(
        src,
        tgt,
        src_centers=[[0.0, 5.0], [1.0, 0.0]],
        tgt_centers=[[1.0, 0.0]],
        k=2,
        n_probe=1,
    ).collect()
    assert {r.src_id for r in rows} == {1, 2}, "no source may vanish"
    for r in rows:
        assert r.tgt_id is not None and r.cosine_sim is not None
        assert r.margin is None, "no backward neighborhood → NULL margin"
        assert r.mutual is False


def test_margin_ivf_backward_probe_carries_no_broadcast_hint(spark):
    """The backward probe's query side is the FULL target corpus
    (vectors in tow): a hard broadcast hint on it is the ungated-
    broadcast OOM class at corpus scale. The analyzed plan must carry
    exactly ONE broadcast hint — the forward probe's small source
    batch — with the backward cell join left to AQE."""
    from mrt_data_integration_spark.operators.similarity import (
        margin_knn_pairs_ivf,
    )

    src = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)],
        "vec_id long, embedding array<double>, cell int",
    )
    tgt = spark.createDataFrame(
        [(10, [1.0, 0.1], 0), (11, [0.8, 0.2], 0)],
        "vec_id long, embedding array<double>, cell int",
    )
    df = margin_knn_pairs_ivf(
        src, tgt, src_centers=[[1.0, 0.0]], tgt_centers=[[1.0, 0.0]],
        k=2, n_probe=1,
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert plan.count("ResolvedHint") == 1, (
        "expected one broadcast hint (the forward probe's query batch);"
        " the backward corpus-side probe must not be hinted"
    )


def test_broadcast_cosine_kernel_bit_identical_to_fold(spark):
    """The Arrow cosine kernel (opt r14) must reproduce the
    zip_with/aggregate JVM fold BIT-FOR-BIT: same float32→float64
    widening, same column-sequential accumulation order, same
    dot/(norm·norm) op order — on signed, non-uniform float32 data."""
    import random

    from mrt_data_integration_spark.operators.similarity import (
        broadcast_cosine_scores,
        dot,
        norm,
    )

    random.seed(1412)
    d = 7  # deliberately odd/non-power-of-two
    rows = [
        (i, [random.uniform(-3, 3) * 10 ** random.randint(-3, 3) for _ in range(d)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    s = emb.filter(F.col("vec_id") % 2 == 0)
    t = emb.filter(F.col("vec_id") % 2 == 1)

    kern = broadcast_cosine_scores(
        t, s, stream_out="tgt_id", bcast_out="src_id"
    ).collect()
    sj = s.select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("__sv__"),
        norm("embedding").alias("__sn__"),
    )
    tj = t.select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").alias("__tv__"),
        norm("embedding").alias("__tn__"),
    )
    fold = (
        tj.crossJoin(F.broadcast(sj))
        .select(
            "src_id",
            "tgt_id",
            (dot("__sv__", "__tv__") / (F.col("__sn__") * F.col("__tn__"))).alias(
                "cosine_sim"
            ),
        )
        .collect()
    )
    kmap = {(r.src_id, r.tgt_id): r.cosine_sim for r in kern}
    fmap = {(r.src_id, r.tgt_id): r.cosine_sim for r in fold}
    assert set(kmap) == set(fmap) and len(kmap) == 400
    for key, fv in fmap.items():
        assert kmap[key] == fv, (key, kmap[key], fv)  # BIT equality


def test_broadcast_cosine_kernel_rejects_ragged_and_null_elements(spark):
    import pytest

    from mrt_data_integration_spark.operators.similarity import (
        broadcast_cosine_scores,
    )

    s = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="ragged"):
        broadcast_cosine_scores(
            ragged, s, stream_out="tgt_id", bcast_out="src_id"
        ).collect()
    nullelem = spark.createDataFrame(
        [(1, [1.0, None])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="NULL embedding element"):
        broadcast_cosine_scores(
            nullelem, s, stream_out="tgt_id", bcast_out="src_id"
        ).collect()


def test_broadcast_cosine_kernel_empty_broadcast_side(spark):
    from mrt_data_integration_spark.operators.similarity import (
        broadcast_cosine_scores,
    )

    s = spark.createDataFrame([], "vec_id long, embedding array<float>")
    t = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    assert (
        broadcast_cosine_scores(
            t, s, stream_out="tgt_id", bcast_out="src_id"
        ).count()
        == 0
    )


def test_broadcast_kernel_collect_guard_raises_loudly(spark):
    """r15 size guard (the r14 verdict's item): the kernels' collected
    broadcast side is ROW- and BYTE-bounded with a loud error — the
    enforced form of the envelope the F.broadcast hint only documented
    (the hint failed soft via AQE demotion; the kernel must not fail
    only at driver OOM). Budgets are module-level so this test can
    shrink them without collecting anything big."""
    import pytest

    from mrt_data_integration_spark.operators import similarity as sim_mod

    t = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    big = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    orig_rows = sim_mod._BCAST_COLLECT_MAX_ROWS
    orig_bytes = sim_mod._BCAST_COLLECT_MAX_BYTES
    try:
        sim_mod._BCAST_COLLECT_MAX_ROWS = 4
        with pytest.raises(ValueError, match="exceeds 4 rows"):
            sim_mod.broadcast_cosine_scores(
                t, big, stream_out="tgt_id", bcast_out="src_id"
            )
        with pytest.raises(ValueError, match="exceeds 4 rows"):
            sim_mod.broadcast_max_cosine(t, big)
        with pytest.raises(ValueError, match="exceeds 4 rows"):
            sim_mod.broadcast_cell_max_cosine(
                t.withColumn("cell", F.lit(0)),
                big,
                centers=[[0.0, 0.0]],
                n_probe=1,
            )
        sim_mod._BCAST_COLLECT_MAX_ROWS = orig_rows
        sim_mod._BCAST_COLLECT_MAX_BYTES = 64
        with pytest.raises(ValueError, match="MiB of"):
            sim_mod.broadcast_max_cosine(t, big)
    finally:
        sim_mod._BCAST_COLLECT_MAX_ROWS = orig_rows
        sim_mod._BCAST_COLLECT_MAX_BYTES = orig_bytes


def test_cell_probe_max_cosine_matches_join_form(spark):
    """The r15 IVF collapse's identity pin: broadcast_cell_max_cosine
    == the cell equi-join + per-id max aggregate + left join-back it
    replaced, bit-for-bit (same nearest_cells selection, same fold
    cosines, NULL — not NaN — for rows in unprobed cells), with the
    map-side plan shape (MapInArrow, zero Exchange, zero Join)."""
    import numpy as np

    from mrt_data_integration_spark.operators.similarity import (
        broadcast_cell_max_cosine,
        dot,
        nearest_cells,
        norm,
    )

    rng = np.random.default_rng(23)
    centers = [[float(x) for x in rng.normal(size=5)] for _ in range(4)]
    corpus = spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(size=5)], int(i % 4))
            for i in range(40)
        ],
        "vec_id long, embedding array<double>, cell long",
    )
    bench = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=5)]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    kernel = {
        r.vec_id: r.max_sim
        for r in broadcast_cell_max_cosine(
            corpus, bench, centers, n_probe=2
        ).collect()
    }
    probes = bench.select(
        F.col("embedding").alias("__bvec__"),
        norm("embedding").alias("__bn__"),
        F.explode(nearest_cells("embedding", centers, 2)).alias("cell"),
    )
    cos = dot("embedding", "__bvec__") / (F.col("__cn__") * F.col("__bn__"))
    hits = (
        corpus.withColumn("__cn__", norm("embedding"))
        .join(F.broadcast(probes), "cell")
        .groupBy("vec_id")
        .agg(F.max(cos).alias("max_sim"))
    )
    join_form = {
        r.vec_id: r.max_sim
        for r in corpus.select("vec_id")
        .join(hits, "vec_id", "left")
        .collect()
    }
    assert set(kernel) == set(join_form) == set(range(40))
    for k in kernel:
        a, b = kernel[k], join_form[k]
        assert (a is None) == (b is None), f"NULL boundary differs at {k}"
        if a is not None:
            assert a == b, f"cosine not bit-identical at {k}: {a} vs {b}"
    plan = (
        broadcast_cell_max_cosine(corpus, bench, centers, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bounded_topk_bounded_key_groups_identical_and_single_stage(
    spark, sf_smoke
):
    """Opt r14 pin: ``bounded_key_groups=True`` (sound only when each
    key's group is bounded by construction — margin's bwd ranking over
    the broadcast side) must return EXACTLY the two-stage ranking's
    rows while dropping the partition-local pre-rank stage from the
    plan (no __pid__ / spark_partition_id, one Window instead of two).
    """
    emb = load_table(spark, sf_smoke, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    src = emb.filter(F.col("label") % 2 == 0)
    tgt = emb.filter(F.col("label") % 2 == 1)
    scored = sim.broadcast_cosine_scores(
        tgt, src, stream_out="tgt_id", bcast_out="src_id"
    ).select("src_id", "tgt_id", "cosine_sim")
    two = sim.bounded_topk(
        scored, 4, "cosine_sim", key_col="tgt_id", tie_col="src_id"
    )
    one = sim.bounded_topk(
        scored,
        4,
        "cosine_sim",
        key_col="tgt_id",
        tie_col="src_id",
        bounded_key_groups=True,
    )
    cols = ["tgt_id", "src_id", "cosine_sim", "rk"]
    assert sorted(map(tuple, two.select(cols).collect())) == sorted(
        map(tuple, one.select(cols).collect())
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "__pid__" not in plan and "spark_partition_id" not in plan
    two_plan = two._jdf.queryExecution().executedPlan().toString()
    assert two_plan.count("Window") > plan.count("Window")
