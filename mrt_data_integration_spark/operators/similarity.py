"""Embedding similarity search (SURVEY.md §2.9 E4).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against a scan of the corpus; per-row array math via JVM-side
``aggregate``/``zip_with`` (no Python UDF), top-k via ranking window.

Scale path: LSH bucketing by random-hyperplane sign bits (SimHash for
vectors): corpus and queries hash to {0,1}^b bucket keys; candidate
generation is an equi-join on bucket key (optionally with multi-probe),
so the shuffle is keyed by bucket, cost Σ bucket² — the same plan shape
as MinHash-LSH dedup. An IVF variant would k-means the corpus
(pyspark.ml KMeans) and equi-join on nearest-centroid id; the bucketed
join below is the engine's generic candidate-pruning primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mrt_data_integration_spark.cache_registry import (
    attach_cache,
    eager_cache,
    track_cache,
)

# Per-task cap on the semantic-dedup pair-score matrix (bytes of float64
# scores held at once). The blocked matmul in _cell_eps_pairs sizes its
# row blocks so one pathological k-means cell (a near-dup-saturated
# crawl concentrating the corpus in one direction) cannot OOM a task;
# module-level so tests can shrink it to force multi-block execution.
_PAIR_BLOCK_BYTES = 64 * 1024 * 1024


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i over two array<float|double> columns (JVM-side fold)."""
    pairs = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def bounded_topk(
    scored: DataFrame,
    k: int,
    score_col: str,
    rank_col: str = "rk",
    key_col: str = "query_id",
    tie_col: str = "corpus_id",
    tree_fan: int | None = None,
    ascending: bool = False,
    bounded_key_groups: bool = False,
) -> DataFrame:
    """Scale-safe per-key top-k over a scored frame.

    A single ``row_number() OVER (PARTITION BY query_id)`` shuffles ALL
    corpus rows for a query to ONE reducer — the straggler/OOM at
    corpus scale (r4 verdict). Instead rank twice:

    1. locally, within (key, input-partition-id): the shuffle is keyed
       by (key, pid) — per-reducer group is bounded by one input
       partition's rows, and every partition contributes at most k
       survivors per key (the global top-k is a subset of the union of
       per-partition top-ks, so no candidate is lost);
    2. globally, over the ≤ n_partitions·k survivors per key — a
       trivially small sort.

    ``tree_fan`` adds an intermediate reduction for extreme partition
    counts: with P input partitions the global stage sees ≤ P·k rows
    per key, which at P ≈ 10⁵ and k·rerank ≈ 500 is millions of rows on
    one reducer again. ``tree_fan=f`` first ranks within (key, pid % f),
    bounding the middle groups at (P/f)·k and the global stage at f·k —
    one extra cheap exchange, only worth it when P·k is large, so it is
    opt-in (the bundled queries run at bench scale where P ≤ 32).

    Total order via (score desc — or asc with ``ascending=True``, for
    smallest-k selections like hash-ordered sampling — tie asc) makes
    the result independent of the physical partitioning. All JVM window
    exprs — no UDFs.

    ``bounded_key_groups=True`` skips the partition-local pre-rank
    stage and runs the global window directly (opt r14, guide §2.4):
    sound ONLY when the caller can prove each key's group is bounded
    by CONSTRUCTION, independent of corpus size — e.g. ranking the
    stream side of a stream × broadcast scored frame, where a key's
    candidates are exactly the broadcast rows, which must already fit
    in every executor's memory. There the local stage prunes nothing
    structural (the global sort still sees one bounded group per key)
    and only adds a second exchange + sort + window pass over the
    survivors. Identical output either way: the global row_number over
    (score, tie) is the same total order with or without the local
    pre-selection.
    """
    if bounded_key_groups and tree_fan is not None:
        # contradictory flags (ADVICE r14): tree_fan exists precisely
        # because per-key groups are NOT bounded; a caller passing both
        # has mis-stated one of the two proofs — fail loudly rather
        # than silently ignoring tree_fan.
        raise ValueError(
            "bounded_key_groups=True asserts each key's group is "
            "bounded by construction, which contradicts tree_fan "
            "(the unbounded-group mitigation) — pass one or the other"
        )

    def _ord(c):
        return c.asc() if ascending else c.desc()
    w_global = Window.partitionBy(key_col).orderBy(
        _ord(F.col(score_col)), F.col(tie_col)
    )
    if bounded_key_groups:
        return (
            scored.withColumn(rank_col, F.row_number().over(w_global))
            .filter(F.col(rank_col) <= k)
        )
    w_local = Window.partitionBy(key_col, "__pid__").orderBy(
        _ord(F.col(score_col)), F.col(tie_col)
    )
    out = (
        scored.withColumn("__pid__", F.spark_partition_id())
        .withColumn("__lr__", F.row_number().over(w_local))
        .filter(F.col("__lr__") <= k)
        .drop("__lr__")
    )
    if tree_fan is not None and tree_fan > 0:
        w_mid = Window.partitionBy(key_col, "__fan__").orderBy(
            _ord(F.col(score_col)), F.col(tie_col)
        )
        out = (
            out.withColumn("__fan__", F.col("__pid__") % tree_fan)
            .withColumn("__mr__", F.row_number().over(w_mid))
            .filter(F.col("__mr__") <= k)
            .drop("__fan__", "__mr__")
        )
    return (
        out.drop("__pid__")
        .withColumn(rank_col, F.row_number().over(w_global))
        .filter(F.col(rank_col) <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    The query set is broadcast (it is small by definition); the corpus
    streams through one stage computing cosine (score triples only —
    vectors never leave the scan stage), then the two-stage bounded
    ranking takes k. Ties broken by corpus id → total order.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        norm(vec_col).alias("__qn__"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            (dot("__qvec__", "__cvec__") / (F.col("__qn__") * F.col("__cn__"))).alias(
                "cosine_sim"
            ),
        )
    )
    return bounded_topk(scored, k, "cosine_sim").select(
        "query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk"
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hyperplanes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the last dedup modality of
    SURVEY.md §2.9 E3): id_a < id_b with cosine ≥ threshold.

    With ``hyperplanes`` given, candidates come from an equi-join on
    LSH bucket (near-dups at high thresholds collide with high
    probability; cost Σ bucket²). Without, the exact quadratic join —
    correctness baseline / oracle twin for small corpora.

    Norms are hoisted to one fold PER ROW before the join; the per-pair
    work (the Σ bucket² hot loop) is a single dot-product fold. Folding
    norm(a)·norm(b) inside the pair loop would triple the dominant cost.
    """
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va__"),
        norm(vec_col).alias("__na__"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb__"),
        norm(vec_col).alias("__nb__"),
    )
    if hyperplanes is not None:
        a = a.withColumn("__bkt__", hyperplane_bucket("__va__", hyperplanes))
        b = b.withColumn("__bkt__", hyperplane_bucket("__vb__", hyperplanes))
        pairs = a.join(b, ["__bkt__"]).filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            (dot("__va__", "__vb__") / (F.col("__na__") * F.col("__nb__"))).alias("cs"),
        )
        .filter(F.col("cs") >= threshold)
        .select("id_a", "id_b", F.round("cs", 4).alias("cosine_sim"))
    )


def hyperplane_bucket(
    vec: Column | str, hyperplanes: list[list[float]]
) -> Column:
    """LSH bucket id: sign-bit pattern of dot products with fixed random
    hyperplanes (passed as literals — deterministic, broadcast-free).

    Built as ONE SQL-string expression: the Column-op form costs a
    Python-JVM round trip per literal (n_planes × dim of them — ~1000
    for 8 planes over 64-dim vectors, per join side), which dominated
    the query's wall-clock. String literals cast to double are
    constant-folded by Catalyst, so the physical plan is identical.
    ``vec`` must be a column NAME when given as a str; Column inputs
    take the (slower) builder path."""
    if isinstance(vec, str):
        terms = []
        for i, hp in enumerate(hyperplanes):
            arr = "array(" + ",".join(f"cast('{float(x)!r}' as double)" for x in hp) + ")"
            dot_sql = (
                f"aggregate(zip_with(`{vec}`, {arr}, "
                "(x, y) -> cast(x as double) * y), "
                "cast(0.0 as double), (acc, v) -> acc + v)"
            )
            terms.append(f"if({dot_sql} >= 0.0, {2**i}, 0)")
        return F.expr(" + ".join(terms))
    bucket = F.lit(0)
    for i, hp in enumerate(hyperplanes):
        arr = F.array(*[F.lit(float(x)) for x in hp])
        d = F.aggregate(
            F.zip_with(_c(vec), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    max_iter: int = 20,
    index_cache_key: str | None = None,
    label_col: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the KMeans alternative to
    hyperplane LSH named in the module docstring.

    Index: pyspark.ml KMeans partitions the corpus into ``n_centroids``
    cells; each corpus row gets its cell id (one ML fit + one map-side
    transform — the cluster centers live on the driver, d×k floats).
    Search: each query scores the k centroids WITH EXPRESSIONS (literal
    centroid arrays — no shuffle, no UDF), keeps its ``n_probe`` nearest
    cells, and equi-joins the corpus on cell id. Cost is keyed-join over
    ~n_probe/n_centroids of the corpus instead of a full scan per query;
    recall rises with ``n_probe`` (``n_probe == n_centroids`` is exact
    modulo ties). Same candidate-prune-then-verify shape as the LSH
    path, but data-adaptive cells instead of data-oblivious ones.

    ``label_col``: when set, candidates must carry a DIFFERENT label
    than the query (null-safe mismatch, hard_negative_topk's exact
    predicate) — the hard-negative-mining composition the brute
    operator's docstring names, applied map-side INSIDE the probed
    cells before ranking; the output gains a ``corpus_label`` column.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    label_cols_c = (
        [F.col(label_col).alias("__clabel__")] if label_col else []
    )
    feats = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat__"),
        *label_cols_c,
    )
    def _fit():
        return KMeans(
            featuresCol="__feat__",
            predictionCol="__cell__",
            k=n_centroids,
            seed=seed,
            maxIter=max_iter,
        ).fit(feats)

    # The fitted model is a JVM-session object, so the reuse key is
    # scoped to the live SparkContext (a new session refits).
    cache_key = None if index_cache_key is None else (
        "ivf", index_cache_key, corpus.sparkSession.sparkContext.applicationId,
        n_centroids, seed, max_iter, id_col, vec_col,
    )
    model = _cached_training(cache_key, _fit)
    assigned = model.transform(feats).select(
        "corpus_id",
        "__cvec__",
        "__cn__",
        "__cell__",
        *(["__clabel__"] if label_col else []),
    )

    centers = [list(map(float, c)) for c in model.clusterCenters()]
    return _ivf_probe(
        assigned, queries, centers, k, n_probe, id_col, vec_col, label_col
    )


def nearest_cells(
    vec: Column | str, centers: list[list[float]], n_probe: int
) -> Column:
    """Array of the ``n_probe`` nearest cell ids for ``vec`` under the
    literal ``centers`` (squared-L2 per centroid; array_sort on
    (dist, cell) structs so ties break to the lowest cell id) — the
    probe-cell selection shared by every IVF consumer (`_ivf_probe`,
    decontaminate.semantic_decontamination_ivf)."""
    entries = []
    for cid, c in enumerate(centers):
        arr = F.array(*[F.lit(x) for x in c])
        d2 = F.aggregate(
            F.zip_with(
                _c(vec), arr, lambda x, y: (x.cast("double") - y) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        entries.append(F.struct(d2.alias("dist"), F.lit(cid).alias("cell")))
    ranked = F.slice(F.array_sort(F.array(*entries)), 1, n_probe)
    return F.transform(ranked, lambda s: s["cell"])


def _ivf_probe(
    assigned: DataFrame,
    queries: DataFrame,
    centers: list[list[float]],
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    label_col: str | None,
    exclude_self: bool = True,
    round_scores: bool = True,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Probe half shared by :func:`ivf_topk` (ml.KMeans index) and
    :func:`ivf_probe_topk` (any precomputed index). ``assigned``
    carries the internal columns (corpus_id, __cvec__, __cn__,
    __cell__[, __clabel__]). ``exclude_self=False`` keeps
    query_id == corpus_id candidate pairs — required when queries and
    corpus are DISTINCT frames whose id spaces merely overlap
    (cross-corpus mining); the self-exclusion only means something
    when both sides are the same corpus.

    ``broadcast_queries`` (r12): the default hints the probe frame —
    right for the anchor-batch callers (a query batch is small, and
    the estimate of an exploded probe frame is poor enough that the
    hint is load-bearing). Pass False when the QUERY side is a full
    corpus (margin mining's backward probe: every target, vectors in
    tow, probes the source index) — a hard broadcast of that frame is
    the ungated-vocabulary-broadcast OOM class; the join then shuffles
    both sides on the cell key (AQE still converts to broadcast when
    the measured size allows)."""

    def probe_cells(vec: Column | str) -> Column:
        return nearest_cells(vec, centers, n_probe)

    # __qn__ is computed in its OWN projection BELOW the Generate (opt
    # r15, the bm25 dl lesson): as a sibling of the explode it plans
    # ABOVE the Generate and re-runs the norm fold once per PROBE row
    # (n_probe× instead of 1× — immaterial for anchor batches, real
    # for the corpus-side probe callers at scale).
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        norm(vec_col).alias("__qn__"),
        *([F.col(label_col).alias("__qlabel__")] if label_col else []),
    ).select(
        "query_id",
        "__qvec__",
        "__qn__",
        *(["__qlabel__"] if label_col else []),
        F.explode(probe_cells("__qvec__")).alias("__cell__"),
    )
    pair_ok = (
        F.col("query_id") != F.col("corpus_id")
        if exclude_self
        else F.lit(True)
    )
    if label_col:
        # hard-negative predicate: candidates must mismatch the query's
        # label, null-safely (hard_negative_topk semantics) — evaluated
        # map-side inside the probed cells, BEFORE the ranking shuffle
        pair_ok = ~F.col("__clabel__").eqNullSafe(F.col("__qlabel__"))
    probe_side = F.broadcast(probes) if broadcast_queries else probes
    scored = (
        assigned.join(probe_side, "__cell__")
        .filter(pair_ok)
        .select(
            "query_id",
            "corpus_id",
            *([F.col("__clabel__").alias("corpus_label")] if label_col else []),
            (dot("__qvec__", "__cvec__") / (F.col("__qn__") * F.col("__cn__"))).alias(
                "cosine_sim"
            ),
        )
    )
    # Candidates are cell-bounded, but a hot cell can still be large —
    # the two-stage ranking keeps every reducer group partition-sized.
    score_out = (
        F.round("cosine_sim", 4) if round_scores else F.col("cosine_sim")
    )
    return bounded_topk(scored, k, "cosine_sim").select(
        "query_id",
        "corpus_id",
        *(["corpus_label"] if label_col else []),
        score_out.alias("cosine_sim"),
        "rk",
    )


def ivf_probe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centers: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    label_col: str | None = None,
) -> DataFrame:
    """:func:`ivf_topk`'s probe against a PRECOMPUTED index — the
    train-once / probe-many decoupling the persisted-IVFADC path has,
    for the plain in-session IVF: ``corpus`` already carries its cell
    id in ``cell_col`` and ``centers`` is the trained k×d list. Any
    trainer that yields (assignments, centers) plugs in — pyspark.ml
    KMeans (what :func:`ivf_topk` fits), a loaded persisted index, or
    :func:`~mrt_data_integration_spark.operators.cluster.kmeans_lloyd`,
    whose fixed-iteration deterministic loop is SQL-replayable: with
    Lloyd's centers the WHOLE approximate probe (cell ranking →
    cell-bounded candidates → label predicate → cosine top-k) is
    hash-verifiable against an unrolled-CTE oracle, which no
    RNG-seeded ml.KMeans index can be.

    Same plan shape as :func:`ivf_topk`'s probe half: queries score
    the k centroids with literal-array expressions (no shuffle, no
    UDF), keep their ``n_probe`` nearest cells, broadcast onto the
    corpus's cell-keyed rows, and rank through the two-stage bounded
    top-k. ``label_col`` applies the null-safe hard-negative mismatch
    predicate map-side inside the probed cells (the output gains
    ``corpus_label``)."""
    if not centers:
        raise ValueError("centers must be a non-empty k x d list")
    dims = {len(c) for c in centers}
    if len(dims) != 1:
        # a ragged centers list would zip_with-pad against the vectors
        # and rank cells on NULL distances SILENTLY (the PCA
        # ragged-dimension advisory class) — fail at entry instead
        raise ValueError(
            f"centers must share one dimension, got lengths {sorted(dims)}"
        )
    assigned = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
        F.col(cell_col).alias("__cell__"),
        *([F.col(label_col).alias("__clabel__")] if label_col else []),
    )
    return _ivf_probe(
        assigned, queries, centers, k, n_probe, id_col, vec_col, label_col
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: equi-join on hyperplane bucket, exact cosine
    within bucket, ranking window for k; plan cost is keyed-join +
    window instead of N×Q.

    ``n_probe_bits`` > 0 enables multi-probe (Lv et al., VLDB'07): each
    QUERY also probes the buckets at Hamming distance 1 for its first
    ``n_probe_bits`` hyperplane bits — vectors near a hyperplane land
    on either side, so flipping low-order sign bits recovers the
    near-misses. Recall rises toward brute force at the cost of
    (1 + n_probe_bits)× the (broadcast-side only) query rows; the
    corpus is still hashed exactly once and never re-scanned.
    """
    probes = F.array(
        F.col("__bkt__"),
        *[
            F.col("__bkt__").bitwiseXOR(F.lit(2**i))
            for i in range(min(n_probe_bits, len(hyperplanes)))
        ],
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec__"),
            norm(vec_col).alias("__qn__"),
            hyperplane_bucket(vec_col, hyperplanes).alias("__bkt__"),
        )
        .select(
            "query_id",
            "__qvec__",
            "__qn__",
            F.explode(F.array_distinct(probes)).alias("bucket"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
        hyperplane_bucket(vec_col, hyperplanes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            (dot("__qvec__", "__cvec__") / (F.col("__qn__") * F.col("__cn__"))).alias(
                "cosine_sim"
            ),
        )
    )
    # Multi-probe can make one query's candidate set span several hot
    # buckets — rank two-stage so no reducer sees more than a partition.
    return bounded_topk(scored, k, "cosine_sim").select(
        "query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk"
    )


def _pq_train_codebooks(
    sample: "list[list[float]]",
    n_subspaces: int,
    n_centroids: int,
    seed: int,
    n_iter: int = 25,
) -> "list[list[list[float]]]":
    """Deterministic per-subspace k-means (k-means++ seeding + Lloyd's)
    on a driver-side sample (pure numpy — no MLlib, so the codebooks are
    bit-reproducible given the seed). Returns codebooks[s][c] = centroid
    vector of subspace s. Empty clusters reseed to the farthest point
    (deterministic argmax)."""
    import numpy as np

    def _kpp_init(Xs: "np.ndarray", k: int, rs) -> "np.ndarray":
        # k-means++ (Arthur & Vassilvitskii 2007): each next seed drawn
        # ∝ squared distance to the nearest existing seed — markedly
        # better cells than uniform seeding on clustered data, still
        # deterministic under the fixed RandomState. The nearest-seed
        # distance is a RUNNING min updated against only the newest
        # seed: O(k·n·d) total where the full per-step recompute was
        # O(k²·n·d) — at the cells-grow-with-corpus contract (k ∝ n)
        # that recompute made quantizer training the super-linear term
        # of the whole operator (r6 scaling study). Values are
        # bit-identical (min over all seeds == running min; per-seed
        # distances use the same elementwise form).
        n = Xs.shape[0]
        C = np.empty((k, Xs.shape[1]), dtype=float)
        C[0] = Xs[rs.randint(n)]
        d2 = ((Xs - C[0]) ** 2).sum(axis=1)
        for i in range(1, k):
            tot = d2.sum()
            if tot <= 0:  # all points coincide with seeds
                C[i] = Xs[rs.randint(n)]
            else:
                j = min(
                    int(np.searchsorted(np.cumsum(d2 / tot), rs.rand())), n - 1
                )
                C[i] = Xs[j]
            d2 = np.minimum(d2, ((Xs - C[i]) ** 2).sum(axis=1))
        return C

    X = np.asarray(sample, dtype=float)
    n, d = X.shape
    d_sub = d // n_subspaces
    rs = np.random.RandomState(seed)
    books = []
    for s in range(n_subspaces):
        Xs = X[:, s * d_sub : (s + 1) * d_sub]
        C = _kpp_init(Xs, n_centroids, rs)
        # ‖x‖² + ‖c‖² − 2x·c gemm form: the (n, k, d) broadcast temp the
        # elementwise form materializes is n·k·d·8 bytes PER ITERATION
        # (335 MB at sample 4096, k 160) — allocation bandwidth, not
        # flops, dominated the fit. The n×k result is what argmin needs.
        x2 = (Xs * Xs).sum(axis=1)
        for _ in range(n_iter):
            d2 = x2[:, None] + (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
            assign = d2.argmin(axis=1)
            newC = C.copy()
            for c in range(n_centroids):
                mask = assign == c
                if mask.any():
                    newC[c] = Xs[mask].mean(axis=0)
                else:
                    newC[c] = Xs[d2.min(axis=1).argmax()]
            if np.allclose(newC, C):
                C = newC
                break
            C = newC
        books.append([[float(v) for v in row] for row in C])
    return books


def _train_sample_vectors(
    corpus: DataFrame, id_col: str, vec_col: str, train_sample: int
) -> list[list[float]]:
    """Bounded quantizer-training sample: the first ``train_sample``
    rows in ``md5(id)`` order — a fixed pseudo-random permutation, so
    the draw is deterministic, partitioning-independent AND
    representative of the whole corpus regardless of id layout. The
    previous id-PREFIX sample (orderBy(id).limit(n)) trained the
    quantizer on the lowest-id shard only; when ids encode ingestion
    order (appended batches, per-source id ranges) the later shards'
    vectors then crowd into whichever trained cells happen to be
    nearest, and the within-cell O(cell²) stages go super-linear — the
    r6 scaling study measured slope 15.9× at 10× input for
    semantic_dedup under exactly that layout (see
    results/SCALING_CURVE.md). Same TakeOrderedAndProject plan shape
    and cost as the prefix sample; md5 ties broken by id for exact
    determinism."""
    return [
        [float(v) for v in r["v"]]
        for r in corpus.select(_c(vec_col).alias("v"), _c(id_col).alias("i"))
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(train_sample)
        .collect()
    ]


_TRAIN_CACHE: dict = {}


def _cached_training(key, builder):
    """Optional index reuse: ANN indexes are built once and queried many
    times, so callers that can name their corpus (``index_cache_key``)
    skip retraining identical codebooks on every invocation. Training is
    seeded-deterministic and the cached value is plain Python data (no
    Spark handles), so reuse is value-identical across sessions; ``None``
    key → always retrain (the safe default for unnamed corpora)."""
    if key is None:
        return builder()
    if key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = builder()
    return _TRAIN_CACHE[key]


_CODED_CACHE: dict = {}


def _cached_coded(spark, key, builder):
    """Pinned encoded-corpus frame for named corpora — the DataFrame
    analogue of ``_cached_training``: codes are a deterministic function
    of (corpus, index params), and an ANN index is encode-once /
    query-many, so re-running the heavy literal-centroid encoding scan
    per invocation is pure waste. Same keyed-singleton discipline as the
    estimator panel cache (queries/estimators._PANEL_CACHE): at most ONE
    pinned frame, evicted on key change (codes are ~n_subspaces bytes +
    id + norm per vector — the whole point of PQ is that this fits),
    keyed by applicationId so a new session rebuilds, and deliberately
    NOT registered for the per-query sweep. ``None`` key → encode fresh
    (unnamed corpora may mutate between calls)."""
    if key is None:
        return builder()
    full_key = (spark.sparkContext.applicationId, key)
    hit = _CODED_CACHE.get(full_key)
    if hit is not None:
        return hit
    coded = builder().persist()
    for old_key in list(_CODED_CACHE):
        try:
            _CODED_CACHE.pop(old_key).unpersist()
        except Exception:
            pass  # prior session already stopped
    _CODED_CACHE[full_key] = coded
    return coded


def _fmt(x: float) -> str:
    """Literal formatter for generated SQL: 10 significant digits keeps
    the strings ~40% shorter than full repr (they are parsed JVM-side on
    every plan build) while staying far below the ADC/quantization noise
    floor — the exact re-rank uses true vectors, never these literals."""
    return f"{float(x):.10g}"


def _books_sql(books: list) -> str:
    """The codebooks as ONE literal 3-D array — books[s+1][c+1][i+1] in
    1-based element_at indexing."""
    return "array(" + ",".join(
        "array(" + ",".join(
            "array(" + ",".join(_fmt(x) for x in cent) + ")"
            for cent in book
        ) + ")"
        for book in books
    ) + ")"


def _sub_dot_hof(vec_name: str, books_sql: str, d_sub: int) -> str:
    """SQL fragment (inside lambdas binding ``s`` and ``c``): subvector
    ``s`` of `vec_name` · codebook centroid ``(s, c)``.

    Nested higher-order functions over a single literal 3-D array keep
    the expression tree CONSTANT-SIZE in (n_subspaces × n_centroids):
    the r4 unrolled-string form (one term per centroid coordinate) made
    Catalyst analysis + codegen the dominant cost — ~6 s per pq_topk run
    at sf0.1 on a 2k-row corpus (profiled r5). One F.expr also keeps the
    py4j round-trip count at 1, same as the string form it replaces."""
    return (
        f"aggregate(sequence(1, {d_sub}), cast(0.0 as double), (acc, i) -> "
        f"acc + cast(element_at(`{vec_name}`, s * {d_sub} + i) as double) "
        f"* element_at(element_at(element_at({books_sql}, s + 1), c + 1), i))"
    )


def _pq_code(vec_name: str, books: list, d_sub: int) -> Column:
    """Array of per-subspace nearest-centroid ids (the PQ code). Uses
    the ‖x−c‖² expansion: argmin_c ‖x−c‖² = argmax_c (x·c − ‖c‖²/2);
    per subspace the argmax is an array_sort over (−score, cid) structs
    (min cid tie-break)."""
    B = _books_sql(books)
    H = "array(" + ",".join(
        "array(" + ",".join(
            _fmt(0.5 * sum(float(x) * float(x) for x in cent)) for cent in book
        ) + ")"
        for book in books
    ) + ")"
    n_sub, n_cent = len(books), len(books[0])
    return F.expr(
        f"transform(sequence(0, {n_sub - 1}), s -> "
        f"element_at(array_sort(transform(sequence(0, {n_cent - 1}), c -> "
        f"named_struct('neg', -({_sub_dot_hof(vec_name, B, d_sub)} "
        f"- element_at(element_at({H}, s + 1), c + 1)), 'cid', c))), 1).cid)"
    )


def _pq_lut(vec_name: str, books: list, d_sub: int) -> Column:
    """Flattened ADC lookup table: lut[s·n_centroids + c + 1] =
    query-subvector s · centroid (s, c) — same compact HOF form as
    ``_pq_code``."""
    B = _books_sql(books)
    n_sub, n_cent = len(books), len(books[0])
    return F.expr(
        f"flatten(transform(sequence(0, {n_sub - 1}), s -> "
        f"transform(sequence(0, {n_cent - 1}), c -> "
        f"{_sub_dot_hof(vec_name, B, d_sub)})))"
    )


def _ivfpq_train(
    corpus: DataFrame,
    n_cells: int,
    n_subspaces: int,
    n_centroids: int,
    seed: int,
    train_sample: int,
    id_col: str,
    vec_col: str,
    index_cache_key: str | None = None,
) -> dict | None:
    """Coarse centers + residual codebooks from one bounded driver-side
    sample (deterministic numpy k-means). Returns ``None`` for an empty
    corpus, else a plain-data index spec — JSON-serializable, so it can
    be persisted next to the coded corpus (``build_ivfpq_index``)."""
    import numpy as np

    probe_row = corpus.select(F.size(_c(vec_col)).alias("d")).first()
    if probe_row is None:
        return None
    d = probe_row["d"]

    def _build():
        sample = _train_sample_vectors(corpus, id_col, vec_col, train_sample)
        nm = min(n_cells, len(sample))
        nc = min(n_centroids, len(sample))
        ctr = _pq_train_codebooks(sample, 1, nm, seed)[0]
        Xs = np.asarray(sample, dtype=float)
        Cs = np.asarray(ctr, dtype=float)
        asg = ((Xs[:, None, :] - Cs[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        bks = _pq_train_codebooks(
            [[float(v) for v in row] for row in Xs - Cs[asg]],
            n_subspaces, nc, seed,
        )
        return {
            "d": d,
            "d_sub": d // n_subspaces,
            "n_cells": nm,
            "n_subspaces": n_subspaces,
            "n_centroids": nc,
            "centers": ctr,
            "books": bks,
        }

    cache_key = None if index_cache_key is None else (
        "ivfpq", index_cache_key, n_cells, n_subspaces, n_centroids, seed,
        train_sample, id_col, vec_col,
    )
    return _cached_training(cache_key, _build)


def _ivfpq_encode(
    corpus: DataFrame,
    idx: dict,
    id_col: str,
    vec_col: str,
    strategy: str = "blas",
    keep_vec: bool = False,
) -> DataFrame:
    """Encode the corpus against a trained index spec: one scan → rows
    (corpus_id, __cn__, __cell__, __codes__ [, __vec__]). Map-only, no
    shuffle.

    ``strategy="blas"`` (default): one Arrow-batched ``mapInPandas``
    pass — cell assignment is a single ``X @ C.T`` argmax and each
    subspace's codes one ``X_s @ B_s.T − G[cell]`` argmax. Measured 25×
    the expression path on a 612 k-vector build (298 s → 12 s): the
    expression encode evaluates interpreted higher-order lambdas per
    (row, subspace, centroid), ~m·d + S·c·d_sub interpreted ops per
    vector, which never enter codegen. Tie-breaking matches the
    expression path (first/lowest centroid id wins in both).

    ``strategy="expr"``: the pure-JVM literal-centroid expressions —
    kept as the differential twin (tests pin blas == expr codes) and
    for Python-worker-free clusters. ``keep_vec`` passes the raw vector
    through (the store-vectors index layout).

    Cell assignment: argmin_m ‖x−C_m‖² = argmax_m (x·C_m − ‖C_m‖²/2)
    over the literal centers — no ML fit, no second corpus pass.

    Residual codes WITHOUT materializing residuals: for a row in cell m,
    argmax_c (r_s·b − ‖b‖²/2) = argmax_c (x_s·b − G[m,s,c]) with
    G[m,s,c] = m_s·b_{s,c} + ‖b_{s,c}‖²/2 folded to a literal table
    driver-side. Referencing a computed residual column instead would
    let CollapseProject inline the 64-dim zip_with into every element_at
    inside the HOF lambdas — measured ~15× slower (r5). The cell id is
    bound ONCE per row via a single-element transform lambda (``m``) so
    the argmax above isn't re-evaluated per (s, c).
    """
    import numpy as np

    centers, books = idx["centers"], idx["books"]
    d, d_sub = idx["d"], idx["d_sub"]
    n_cells, n_subspaces, n_centroids = (
        idx["n_cells"], idx["n_subspaces"], idx["n_centroids"]
    )
    C = np.asarray(centers, dtype=float)
    if strategy == "blas":
        hc = 0.5 * (C * C).sum(axis=1)
        Bs = [np.asarray(book, dtype=float) for book in books]
        # G[m, s, c] = C[m]_s · B[s][c] + ½‖B[s][c]‖² (same table the
        # expression path folds to literals)
        Gt = np.stack(
            [
                np.stack(
                    [
                        C[:, s * d_sub:(s + 1) * d_sub] @ Bs[s][c]
                        + 0.5 * Bs[s][c] @ Bs[s][c]
                        for c in range(n_centroids)
                    ],
                    axis=1,
                )
                for s in range(n_subspaces)
            ],
            axis=1,
        )  # shape (n_cells, n_subspaces, n_centroids)

        def encode(batches):
            import pandas as pd

            for pdf in batches:
                X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                cn = np.linalg.norm(X, axis=1)
                cell = (X @ C.T - hc).argmax(axis=1)
                codes = np.empty((len(X), n_subspaces), dtype=np.int32)
                for s in range(n_subspaces):
                    Xs = X[:, s * d_sub:(s + 1) * d_sub]
                    codes[:, s] = (Xs @ Bs[s].T - Gt[cell, s, :]).argmax(
                        axis=1
                    )
                out = {
                    "corpus_id": pdf[id_col],
                    "__cn__": cn,
                    "__cell__": cell.astype("int32"),
                    "__codes__": list(codes),
                }
                if keep_vec:
                    out["__vec__"] = pdf[vec_col]
                yield pd.DataFrame(out)

        vec_type = corpus.schema[vec_col].dataType.simpleString()
        # Derive the id type from the corpus schema (same as the vec
        # type): hard-coding `long` silently miscast string/uuid ids
        # under the default blas strategy while the expr path preserved
        # them — an undocumented behavior fork between strategies.
        id_type = corpus.schema[id_col].dataType.simpleString()
        schema = (
            f"corpus_id {id_type}, __cn__ double, __cell__ int, "
            "__codes__ array<int>"
        )
        if keep_vec:
            schema += f", __vec__ {vec_type}"
        from mrt_data_integration_spark.operators.dedup import _spread

        return _spread(corpus.select(id_col, vec_col)).mapInPandas(
            encode, schema
        )
    if strategy != "expr":
        raise ValueError(f"unknown encode strategy: {strategy!r}")
    CC = _books_sql([centers])
    HC = "array(" + ",".join(
        _fmt(0.5 * float(np.dot(c, c))) for c in centers
    ) + ")"
    cell_sql = (
        f"element_at(array_sort(transform(sequence(0, {n_cells - 1}), c -> "
        f"named_struct('neg', -(aggregate(sequence(1, {d}), cast(0.0 as double), "
        f"(acc, i) -> acc + cast(element_at(`__cvec__`, i) as double) "
        f"* element_at(element_at(element_at({CC}, 1), c + 1), i)) "
        f"- element_at({HC}, c + 1)), 'cid', c))), 1).cid"
    )
    Bnp = [np.asarray(book, dtype=float) for book in books]  # [s][c, d_sub]
    G = "array(" + ",".join(
        "array(" + ",".join(
            "array(" + ",".join(
                _fmt(
                    C[m, s * d_sub:(s + 1) * d_sub] @ Bnp[s][c]
                    + 0.5 * Bnp[s][c] @ Bnp[s][c]
                ) for c in range(n_centroids)
            ) + ")" for s in range(n_subspaces)
        ) + ")" for m in range(n_cells)
    ) + ")"
    B = _books_sql(books)
    codes_sql = (
        f"transform(sequence(0, {n_subspaces - 1}), s -> "
        f"element_at(array_sort(transform(sequence(0, {n_centroids - 1}), c -> "
        f"named_struct('neg', -({_sub_dot_hof('__cvec__', B, d_sub)} "
        f"- element_at(element_at(element_at({G}, m + 1), s + 1), c + 1)), "
        f"'cid', c))), 1).cid)"
    )
    packed_expr = F.expr(
        f"element_at(transform(array({cell_sql}), m -> "
        f"named_struct('cell', m, 'codes', {codes_sql})), 1)"
    )
    from mrt_data_integration_spark.operators.dedup import _spread

    # _spread: encoding is the CPU-heavy pass (interpreted HOF lambdas);
    # a 1-2 split local scan would run it single-threaded. No-op when
    # the scan already provides parallelism (the corpus-scale case).
    out = (
        _spread(corpus)
        .select(
            F.col(id_col).alias("corpus_id"),
            F.col(vec_col).alias("__cvec__"),
            norm(vec_col).alias("__cn__"),
        )
        .select(
            "corpus_id", "__cn__", "__cvec__", packed_expr.alias("__p__")
        )
        .select(
            "corpus_id",
            "__cn__",
            F.col("__p__.cell").alias("__cell__"),
            F.col("__p__.codes").alias("__codes__"),
            F.col("__cvec__").alias("__vec__"),
        )
    )
    return out if keep_vec else out.drop("__vec__")


def _ivfpq_probes(
    queries: DataFrame, idx: dict, n_probe: int, id_col: str, vec_col: str
) -> DataFrame:
    """Query side: one global residual LUT + exploded (cell, q·c) probes,
    all from the same literal centers (q·c via the ‖q−c‖² identity —
    residual ADC needs no per-cell lookup tables for the dot metric:
    q·x̂ = q·c + q·r̂)."""
    import numpy as np

    centers, books = idx["centers"], idx["books"]
    d, d_sub, n_cells = idx["d"], idx["d_sub"], idx["n_cells"]
    CC = _books_sql([centers])
    CN2 = "array(" + ",".join(
        _fmt(float(np.dot(c, c))) for c in centers
    ) + ")"
    d2_sql = (
        f"aggregate(sequence(1, {d}), cast(0.0 as double), (acc, i) -> "
        f"acc + pow(cast(element_at(`__qvec0__`, i) as double) "
        f"- element_at(element_at(element_at({CC}, 1), c + 1), i), 2))"
    )
    probes_sql = (
        f"slice(array_sort(transform(sequence(0, {n_cells - 1}), c -> "
        f"named_struct('dist', {d2_sql}, 'cell', c, "
        f"'qc', (`__qn__` * `__qn__` + element_at({CN2}, c + 1) - {d2_sql}) / 2.0))), "
        f"1, {min(n_probe, n_cells)})"
    )
    return (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec0__"),
            norm(vec_col).alias("__qn__"),
            _pq_lut(vec_col, books, d_sub).alias("__lut__"),
        )
        .select(
            "query_id",
            "__lut__",
            F.explode(F.expr(probes_sql)).alias("__p__"),
        )
        .select(
            "query_id",
            "__lut__",
            F.col("__p__.cell").alias("__cell__"),
            F.col("__p__.qc").alias("__qc__"),
        )
    )


def _ivfpq_rank(
    coded: DataFrame,
    probes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    rerank_factor: int,
    idx: dict,
    id_col: str,
    vec_col: str,
    rerank_source: DataFrame | None = None,
) -> DataFrame:
    """ADC candidate scoring over coded rows (cell equi-join with the
    broadcast probes), two-stage bounded candidate selection, then the
    exact cosine re-rank via broadcast-joins — vectors never enter a
    shuffle. The approximate score divides by the stored corpus norm
    (cosine ranking, not large-norm-biased raw dot).

    ``rerank_source``: optional (corpus_id, __cell__, __cvec__, __cn__)
    frame holding the true vectors CELL-PARTITIONED (the store-vectors
    index layout) — the re-rank then joins on (cell, id) so dynamic
    partition pruning reads only the candidates' cells. Without it the
    re-rank joins the raw ``corpus``, which is a FULL scan of the vector
    table per query batch — fine when that table is hot, but the one
    linear-in-N term left in the query path (measured: it kept the
    persisted index from ever beating brute force on a cold 2 M-vector
    corpus, results/SCALING_CURVE.md)."""
    n_subspaces, nc = idx["n_subspaces"], idx["n_centroids"]
    adc = F.aggregate(
        F.zip_with(
            F.col("__codes__"),
            F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
            lambda code, s: F.element_at(F.col("__lut__"), s * nc + code + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        coded.join(F.broadcast(probes), "__cell__")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            "__cell__",
            ((F.col("__qc__") + adc) / F.col("__cn__")).alias("__adc__"),
        )
    )
    cand = bounded_topk(scored, k * rerank_factor, "__adc__", rank_col="__r__").select(
        "query_id", "corpus_id", "__cell__"
    )

    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        norm(vec_col).alias("__qn__"),
    )
    if rerank_source is not None:
        exact = (
            rerank_source.join(
                F.broadcast(cand), ["__cell__", "corpus_id"]
            )
            .join(F.broadcast(q_vec), "query_id")
            .select(
                "query_id",
                "corpus_id",
                (
                    dot("__qvec__", "__cvec__")
                    / (F.col("__qn__") * F.col("__cn__"))
                ).alias("cosine_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col("corpus_id")
        )
        return (
            exact.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(
                "query_id",
                "corpus_id",
                F.round("cosine_sim", 4).alias("cosine_sim"),
                "rk",
            )
        )
    cand = cand.drop("__cell__")
    c_vec = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
    )
    exact = (
        c_vec.join(F.broadcast(cand), "corpus_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "corpus_id",
            (dot("__qvec__", "__cvec__") / (F.col("__qn__") * F.col("__cn__"))).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk"
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 16,
    n_centroids: int = 16,
    rerank_factor: int = 10,
    seed: int = 0,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    encode_strategy: str = "blas",
) -> DataFrame:
    """IVF×PQ (the IVFADC layout of Jégou et al. 2011 §V): the coarse
    quantizer routes each query to ``n_probe`` cells, and within a cell
    the scan reads PQ codes of the RESIDUAL (x − cell center), so per
    query only ~n_probe/n_cells of the corpus is touched and each
    touched row costs ``n_subspaces`` LUT lookups — the r4 verdict fix
    for pq_topk's full-scan shape.

    Coarse centers and residual codebooks both train driver-side on one
    bounded sample with the deterministic numpy k-means (an MLlib
    KMeans fit would re-scan the corpus maxIter times per index build;
    a sample-trained quantizer is the standard layout at corpus scale,
    and cell assignment becomes a map-side literal-centroid argmax —
    the corpus is read exactly once to encode). Everything after the
    driver-side training is JVM expressions — no UDFs. See the _ivfpq_*
    stage helpers for the plan-shape details, and ``build_ivfpq_index``
    / ``ivfpq_index_topk`` for the persisted build-once variant.
    """
    idx = _ivfpq_train(
        corpus, n_cells, n_subspaces, n_centroids, seed, train_sample,
        id_col, vec_col, index_cache_key,
    )
    if idx is None:  # empty corpus → no neighbors for any query
        # Each id column types from ITS OWN side's schema — typing
        # query_id from the corpus would make the same call site's
        # schema data-dependent (non-empty corpus → queries' type).
        cid_type = corpus.schema[id_col].dataType.simpleString()
        qid_type = queries.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {qid_type}, corpus_id {cid_type}, "
            "cosine_sim double, rk int",
        )
    coded_key = None if index_cache_key is None else (
        "ivfpq-coded", index_cache_key, n_cells, n_subspaces, n_centroids,
        seed, train_sample, id_col, vec_col, encode_strategy,
    )
    coded = _cached_coded(
        corpus.sparkSession,
        coded_key,
        lambda: _ivfpq_encode(
            corpus, idx, id_col, vec_col, strategy=encode_strategy
        ),
    )
    probes = _ivfpq_probes(queries, idx, n_probe, id_col, vec_col)
    return _ivfpq_rank(
        coded, probes, corpus, queries, k, rerank_factor, idx, id_col, vec_col
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    n_subspaces: int = 16,
    n_centroids: int = 16,
    seed: int = 0,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store_vectors: bool = True,
    encode_strategy: str = "blas",
) -> dict:
    """Persist an IVFADC index: the build-once/query-many layout.

    Writes ``{path}/codes`` — one parquet row per corpus vector
    (corpus_id, cn, codes[, vec]), PARTITIONED BY cell — and
    ``{path}/meta.json`` with the trained centers/codebooks.
    Partitioning by cell turns query-time probing into dynamic
    partition pruning: a probe of n_probe/n_cells touches that fraction
    of the FILES, not just of the rows — the on-disk realization of the
    inverted file.

    ``store_vectors`` (default True) co-locates the raw vector with its
    codes — the FAISS inverted-list layout — so the exact re-rank also
    reads ONLY the probed cells' files instead of full-scanning the
    source vector table (the one linear-in-N term the codes-only layout
    left in the query path; see _ivfpq_rank). Cost: the index grows
    from ~(16 B + n_subspaces B) to +4 B·d per vector — it stops being
    the memory-compressed representation and becomes the
    I/O-partitioned one; pass False to keep the compact layout and
    re-rank against the source table.

    ``meta.json`` is written via Hadoop-free local I/O for simplicity —
    point ``path`` at a shared filesystem on a real cluster (the codes
    table itself goes through the Spark writer, so any supported
    filesystem works for it).
    """
    import json
    import os

    idx = _ivfpq_train(
        corpus, n_cells, n_subspaces, n_centroids, seed, train_sample,
        id_col, vec_col,
    )
    if idx is None:
        raise ValueError("cannot build an IVFPQ index over an empty corpus")
    coded = _ivfpq_encode(
        corpus, idx, id_col, vec_col,
        strategy=encode_strategy, keep_vec=store_vectors,
    )
    cols = [
        F.col("corpus_id"),
        F.col("__cn__").alias("cn"),
        F.col("__codes__").alias("codes"),
        F.col("__cell__").alias("cell"),
    ]
    if store_vectors:
        cols.insert(3, F.col("__vec__").alias("vec"))
    (
        # Rebalance by cell BEFORE the partitioned write: a direct
        # partitionBy from T input tasks emits up to T × n_cells files
        # (the small-files explosion grows with the cell count — the r6
        # scaling study measured append cost 6× at 10× cells from file
        # creation alone). The REBALANCE hint (not repartition: AQE's
        # skew splitting only applies to REBALANCE-origin shuffles)
        # bounds output at ~one file per cell while still subdividing a
        # hot cell across tasks instead of one straggler writer.
        coded.select(*cols)
        .hint("rebalance", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, "codes"))
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(idx, fh)
    return idx


def append_to_ivfpq_index(
    spark,
    path: str,
    new_corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encode_strategy: str = "blas",
) -> int:
    """Incrementally append a batch to a persisted IVFADC index —
    the build-once/APPEND-many half of the index contract.

    The trained quantizers (coarse centers + residual codebooks in
    ``meta.json``) are immutable: the new batch is encoded with them
    and appended to the cell-partitioned codes table, so ingestion cost
    is one encode pass over the NEW rows only — the existing corpus is
    never rescanned, retrained, or rewritten (the same
    history-never-rescanned shape as the E11 incremental rollup).
    Because codes are a pure function of (vector, meta), an appended
    index is row-identical to one whose build had included the batch
    under the same meta — pinned by the append==bulk-encode and
    query-finds-appended tests. Cell-partition layout is preserved, so
    query-time DPP pruning is unaffected; appended files land inside
    the existing cell directories.

    Frozen-quantizer caveat (FAISS's own add-after-train contract): if
    the new batch's direction distribution drifts far from the trained
    sample, its vectors still land in the nearest EXISTING cells —
    recall degrades gracefully rather than erroring; rebuild when drift
    matters. Caller owns id uniqueness across batches (appending an
    existing id duplicates it, as with any append-only table).

    Returns the number of rows appended.
    """
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        idx = json.load(fh)
    store_vectors = "vec" in spark.read.parquet(
        os.path.join(path, "codes")
    ).columns
    coded = _ivfpq_encode(
        new_corpus, idx, id_col, vec_col,
        strategy=encode_strategy, keep_vec=store_vectors,
    )
    cols = [
        F.col("corpus_id"),
        F.col("__cn__").alias("cn"),
        F.col("__codes__").alias("codes"),
        F.col("__cell__").alias("cell"),
    ]
    if store_vectors:
        cols.insert(3, F.col("__vec__").alias("vec"))
    (
        # Same rebalance-by-cell discipline as the build (bounds the
        # append's new files at ~one per touched cell instead of
        # tasks × cells; REBALANCE so a hot cell still splits).
        coded.select(*cols)
        .hint("rebalance", "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(path, "codes"))
    )
    # Row count from the cheap source scan (count-only, no Python
    # workers), not from the coded frame — that would re-run the encode.
    return new_corpus.count()


def ivfpq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVFADC index (``build_ivfpq_index``).

    The codes table is cell-partitioned, so the broadcast probe join
    triggers dynamic partition pruning — only the probed cells' files
    are read (asserted by the plan tests). ``corpus`` supplies the true
    vectors for the exact re-rank of the bounded candidate set; results
    are identical to ``ivfpq_topk`` with the same training parameters
    (same deterministic codebooks → same cells, codes and LUTs).
    """
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        idx = json.load(fh)
    table = spark.read.parquet(os.path.join(path, "codes"))
    coded = table.select(
        "corpus_id",
        F.col("cn").alias("__cn__"),
        F.col("cell").cast("int").alias("__cell__"),
        F.col("codes").alias("__codes__"),
    )
    # store-vectors layout → re-rank reads only the candidates' cells
    # (DPP on the cell join); codes-only layout → re-rank against the
    # caller's corpus table (full scan of raw vectors)
    rerank_source = None
    if "vec" in table.columns:
        rerank_source = table.select(
            "corpus_id",
            F.col("cell").cast("int").alias("__cell__"),
            F.col("vec").alias("__cvec__"),
            F.col("cn").alias("__cn__"),
        )
    probes = _ivfpq_probes(queries, idx, n_probe, id_col, vec_col)
    return _ivfpq_rank(
        coded, probes, corpus, queries, k, rerank_factor, idx, id_col,
        vec_col, rerank_source=rerank_source,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 16,
    n_centroids: int = 16,
    rerank_factor: int = 10,
    seed: int = 0,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    encode_strategy: str = "blas",
) -> DataFrame:
    """Product-quantization approximate top-k with exact re-rank — the
    memory-bounded ANN path: at corpus scale each vector is represented
    by ``n_subspaces`` byte-sized codes (default 16 codes ≈ 16 bytes +
    one 8-byte norm vs 256 bytes of float32×64), so the candidate scan
    touches codes, not vectors (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search", TPAMI).

    Shape: codebooks train on a bounded driver-side sample
    (deterministic numpy k-means); corpus encoding is map-only literal-
    centroid expressions; each query carries a flattened ADC lookup
    table (query-subvector · centroid dot products), broadcast against
    the coded corpus; the approximate score is ``n_subspaces`` array
    lookups per pair (vs a d-dim dot product), divided by the stored
    corpus norm so candidates rank by approximate COSINE — a raw-dot
    ranking would bias toward large-norm vectors on unnormalized
    corpora. Candidate selection is the two-stage ``bounded_topk`` over
    (query_id, corpus_id, score) triples only, then the top
    ``k·rerank_factor`` candidates broadcast-join back to the corpus
    for the exact cosine re-rank — full vectors never enter a shuffle.

    ``encode_strategy``: "blas" (default) encodes via one Arrow-batched
    per-subspace matmul argmax — same measured ~2 k vectors/s ceiling
    and fix as the IVFPQ encode (see ``_ivfpq_encode``); "expr" keeps
    the pure-JVM literal-centroid expressions (differential-tested
    equal, Python-worker-free).
    """
    probe = corpus.select(F.size(_c(vec_col)).alias("d")).first()
    if probe is None:  # empty corpus → no neighbors for any query
        # Each id column types from ITS OWN side's schema — typing
        # query_id from the corpus would make the same call site's
        # schema data-dependent (non-empty corpus → queries' type).
        cid_type = corpus.schema[id_col].dataType.simpleString()
        qid_type = queries.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {qid_type}, corpus_id {cid_type}, "
            "cosine_sim double, rk int",
        )
    d_sub = probe["d"] // n_subspaces

    def _build():
        sample = _train_sample_vectors(corpus, id_col, vec_col, train_sample)
        # A sample smaller than n_centroids cannot seed distinct
        # centroids; clamp (recall is unaffected — every corpus row is
        # then near some centroid of the shrunken book).
        nc = min(n_centroids, len(sample))
        return nc, _pq_train_codebooks(sample, n_subspaces, nc, seed)

    cache_key = None if index_cache_key is None else (
        "pq", index_cache_key, n_subspaces, n_centroids, seed,
        train_sample, id_col, vec_col,
    )
    n_centroids, books = _cached_training(cache_key, _build)

    from mrt_data_integration_spark.operators.dedup import _spread

    def _encode_expr():
        return _spread(corpus).select(
            F.col(id_col).alias("corpus_id"),
            norm(vec_col).alias("__cn__"),
            _pq_code(vec_col, books, d_sub).alias("__codes__"),
        )

    def _encode_blas():
        import numpy as np

        Bs = [np.asarray(b, dtype=float) for b in books]
        half_b2 = [0.5 * (B * B).sum(axis=1) for B in Bs]
        n_sub = len(Bs)

        def enc(batches):
            import pandas as pd

            for pdf in batches:
                X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                cn = np.linalg.norm(X, axis=1)
                codes = np.empty((len(X), n_sub), dtype=np.int32)
                for s in range(n_sub):
                    Xs = X[:, s * d_sub:(s + 1) * d_sub]
                    codes[:, s] = (Xs @ Bs[s].T - half_b2[s]).argmax(axis=1)
                yield pd.DataFrame(
                    {
                        "corpus_id": pdf[id_col],
                        "__cn__": cn,
                        "__codes__": list(codes),
                    }
                )

        # Id type from the corpus schema — see the ivfpq encode path:
        # hard-coding `long` forked blas vs expr behavior on string ids.
        id_type = corpus.schema[id_col].dataType.simpleString()
        return _spread(corpus.select(id_col, vec_col)).mapInPandas(
            enc, f"corpus_id {id_type}, __cn__ double, __codes__ array<int>"
        )

    if encode_strategy not in ("blas", "expr"):
        raise ValueError(f"unknown encode strategy: {encode_strategy!r}")
    # Named corpora pin the coded frame (encode-once/query-many, same
    # keyed singleton as the codebook cache above). _spread: see
    # ivfpq_topk — parallelize the CPU-heavy encoding pass when the
    # input scan has too few splits (no-op at corpus scale).
    coded = _cached_coded(
        corpus.sparkSession,
        None
        if cache_key is None
        else ("pq-coded", encode_strategy) + cache_key[1:],
        _encode_blas if encode_strategy == "blas" else _encode_expr,
    )

    # Flattened ADC LUT per query: lut[s*n_centroids + c] = q_sub · cent.
    q_lut = queries.select(
        F.col(id_col).alias("query_id"),
        _pq_lut(vec_col, books, d_sub).alias("__lut__"),
    )

    nc = n_centroids
    scored = coded.crossJoin(F.broadcast(q_lut)).filter(
        F.col("query_id") != F.col("corpus_id")
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("__codes__"),
            F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
            lambda code, s: F.element_at(F.col("__lut__"), s * nc + code + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = scored.select(
        "query_id", "corpus_id", (adc / F.col("__cn__")).alias("__adc__")
    )
    cand = bounded_topk(scored, k * rerank_factor, "__adc__", rank_col="__r__").select(
        "query_id", "corpus_id"
    )

    # Exact re-rank: the bounded candidate set broadcasts against the
    # corpus (equi-join on corpus_id — the corpus is filtered, never
    # shuffled), then picks up its query vector the same way.
    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        norm(vec_col).alias("__qn__"),
    )
    c_vec = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
    )
    exact = (
        c_vec.join(F.broadcast(cand), "corpus_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "corpus_id",
            (dot("__qvec__", "__cvec__") / (F.col("__qn__") * F.col("__cn__"))).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk"
        )
    )


def _cell_eps_pairs(
    assigned: DataFrame, id_col: str, eps: float, strategy: str
) -> DataFrame:
    """Within-cell cosine-≥-eps pairs (id_a < id_b) from an assigned
    frame carrying (id, __v__ vector, __n__ norm, __cell__).

    ``strategy="blas"`` (default): one ``applyInPandas`` per cell — the
    cell's vectors normalize into a numpy matrix and a single BLAS
    ``X @ X.T`` scores every pair (the SemDeDup paper's own per-cluster
    matmul). The Arrow transfer is the CELL'S VECTORS (n_cell × d
    floats), never the n_cell² pair rows; per-task memory is
    O(cell² ) scores, bounded by the same cell-size contract the join
    strategy has. Measured ~5× the expression path at bench scale: the
    column-expression dot is an interpreted higher-order function
    (zip_with/aggregate never enter whole-stage codegen), so the join
    form pays ~n_pairs × d interpreted lambda calls.

    ``strategy="expr"``: the pure-JVM self-join + fold — no Python
    workers at all; kept as the differential twin (tests pin blas ==
    expr away from the eps float boundary) and for clusters where
    Python worker startup is the scarcer resource.
    """
    if strategy == "expr":
        a = assigned.select(
            F.col(id_col).alias("id_a"),
            F.col("__v__").alias("__va__"),
            F.col("__n__").alias("__na__"),
            "__cell__",
        )
        b = assigned.select(
            F.col(id_col).alias("id_b"),
            F.col("__v__").alias("__vb__"),
            F.col("__n__").alias("__nb__"),
            "__cell__",
        )
        return (
            a.join(b, ["__cell__"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                (
                    dot("__va__", "__vb__")
                    / (F.col("__na__") * F.col("__nb__"))
                ).alias("__cs__"),
            )
            .filter(F.col("__cs__") >= eps)
        )
    if strategy != "blas":
        raise ValueError(f"unknown pair_strategy: {strategy!r}")

    # Capture by value: the closure ships to Python workers, where a
    # module-global lookup would see the import-time default rather than
    # any driver-side override (tests shrink this to force blocking).
    pair_block_bytes = _PAIR_BLOCK_BYTES

    def cell_pairs(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        X = np.asarray(pdf["__v__"].tolist(), dtype=np.float64)
        nrm = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        X = X / nrm
        # Block the matmul by ROWS so score-matrix memory is capped at
        # _PAIR_BLOCK_BYTES per task no matter how dense one cell gets
        # (a near-duplicate-saturated crawl can put a large fraction of
        # the corpus in one cell; the unblocked n² float64 matrix — and
        # triu_indices' n²/2 index arrays — OOMed the task there). Cost
        # is unchanged (same flops, same pairs); only peak memory drops.
        block = max(1, pair_block_bytes // (8 * n))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for r0 in range(0, n - 1, block):
            r1 = min(n, r0 + block)
            S = X[r0:r1] @ X.T  # (r1-r0) × n
            rows, cols = np.nonzero(S >= eps)
            keep = cols > rows + r0  # strict upper triangle, global index
            a, b = ids[rows[keep] + r0], ids[cols[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], "int64"),
                "id_b": np.concatenate(out_b) if out_b else np.array([], "int64"),
            }
        )

    return assigned.select(id_col, "__v__", "__cell__").groupBy(
        "__cell__"
    ).applyInPandas(cell_pairs, "id_a long, id_b long")


def semantic_dedup(
    corpus: DataFrame,
    eps: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    train_sample: int = 20_000,
    exact_components: bool = False,
    index_cache_key: str | None = None,
    pair_strategy: str = "blas",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cells over the embedding space, then
    within-cell cosine pruning — documents whose meaning near-coincides
    (paraphrases, templated rewrites) that every lexical modality
    (MinHash/SimHash/shingle Jaccard in operators/dedup.py) misses.

    Returns one row per corpus vector: (``id_col``, cell, keep). Keep
    policy, deterministic in both modes:

    - default (greedy): a vector is dropped iff some SMALLER-id vector
      in the SAME cell has cosine ≥ ``eps`` with it — one within-cell
      join, one distinct. On a chain a~b~c (a<b<c, a̸~c) this drops c
      even though its witness b is itself dropped — the standard greedy
      over-drop, bounded by: every dropped vector has ≥1 eps-neighbor
      in the corpus (never drops anything unique);
    - ``exact_components=True``: within-cell eps-pairs feed
      operators.components.connected_components and exactly one vector
      (the min id) survives per semantic component — dearer (iterative),
      exact keep-one-per-group semantics.

    Scale shape: cells come from a seeded numpy k-means over ONE
    driver-sized sample (first ``train_sample`` rows by id —
    TakeOrdered, scale-safe; sample-fit is the standard index-training
    shape, same as the PQ/IVFPQ paths), and assignment is one
    Arrow-batched map over the corpus (argmin to the broadcast k×d
    centroid matrix — no ML fit jobs, no second pass). Pair scoring is
    cell-local, cost Σ cell² like every bucketed dedup here —
    ``n_centroids`` should grow ∝ corpus size to hold the target cell
    size (the paper uses 50k cells for LAION-scale; the centroid matrix
    stays a few MB even then). Cross-cell near-dups are missed by
    construction — the recall/cost dial SemDeDup chose, same trade as
    LSH banding. ``pair_strategy`` picks the scoring engine: "blas"
    (default) runs one Arrow-batched per-cell matmul, "expr" the
    pure-JVM self-join — see ``_cell_eps_pairs`` for the measured
    trade.

    Determinism: bit-reproducible under ANY input partitioning — the
    sample is an id-ordered prefix (partitioning-free), the fit is
    seeded numpy, and assignment/keep rules are pure functions. (The
    earlier MLlib-KMeans fit was only same-partitioning-reproducible —
    k-means|| init samples per-partition — and cost ~40 scheduler
    rounds to fit 2k vectors; the sample-fit removed both problems,
    r5 profile: 15 s cold → sub-second.)
    """
    import numpy as np

    # Cluster DIRECTIONS, not raw vectors (the paper's setup): k-means
    # on the L2-normalized embedding makes the cells cosine-geometry
    # cells, so two vectors with cosine 1.0 (e.g. scaled copies) land in
    # the same cell by construction — on raw vectors a long vector and
    # its short twin could straddle a centroid boundary and the dup
    # would be invisible to the within-cell join.
    if corpus.select(F.col(id_col)).first() is None:  # empty corpus
        return corpus.select(
            F.col(id_col),
            F.lit(0).alias("cell"),
            F.lit(True).alias("keep"),
        )

    def _fit():
        rows = _train_sample_vectors(corpus, id_col, vec_col, train_sample)
        X = np.asarray(rows, dtype=float)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        k = min(n_centroids, len(rows))
        return _pq_train_codebooks(
            [[float(x) for x in row] for row in X], 1, k, seed
        )[0]

    cache_key = None if index_cache_key is None else (
        "semdedup", index_cache_key,
        n_centroids, seed, train_sample, id_col, vec_col,
    )
    centers = _cached_training(cache_key, _fit)
    C = np.asarray(centers, dtype=float)
    half_c2 = 0.5 * (C * C).sum(axis=1)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            n = np.linalg.norm(X, axis=1)
            Xn = X / np.maximum(n, 1e-300)[:, None]
            cell = (Xn @ C.T - half_c2).argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "__v__": pdf[vec_col],
                    "__n__": n,
                    "__cell__": cell.astype("int32"),
                }
            )

    vec_type = corpus.schema[vec_col].dataType.simpleString()
    assigned = track_cache(
        corpus.select(id_col, vec_col)
        .mapInPandas(
            assign,
            f"{id_col} long, __v__ {vec_type}, __n__ double, __cell__ int",
        )
        .persist()
    )
    pairs = _cell_eps_pairs(assigned, id_col, eps, pair_strategy)
    if exact_components:
        from mrt_data_integration_spark.operators.components import (
            connected_components,
        )

        cc = connected_components(pairs, "id_a", "id_b")
        dropped = cc.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
    else:
        dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    # No broadcast hint: the dropped set can approach corpus size on a
    # duplicate-heavy crawl, so the keep-flag attach must stay a plain
    # keyed join (AQE will broadcast it when it is in fact small).
    out = assigned.join(dropped.withColumn("__drop__", F.lit(True)),
                        id_col, "left").select(
        F.col(id_col),
        F.col("__cell__").alias("cell"),
        F.coalesce(~F.col("__drop__"), F.lit(True)).alias("keep"),
    )
    return attach_cache(out, [assigned])  # released by the registry sweep


def hard_negative_topk(
    emb: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    min_sim: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each
    anchor, the ``k`` corpus vectors MOST similar to it that carry a
    DIFFERENT label — the negatives a contrastive loss learns the most
    from (easy negatives are already far away; false negatives are
    same-label rows, excluded by construction).

    The physical shape is exactly :func:`brute_force_topk` — broadcast
    anchors, one corpus scan computing score triples, two-stage bounded
    ranking — plus a map-side label-mismatch predicate BEFORE the rank
    (cheaper than ranking then discarding) and an optional ``min_sim``
    floor that drops trivially-easy negatives from the shuffle
    entirely. At corpus scale :func:`hard_negative_ivf_topk` replaces
    the brute scan with the IVF cell probe — the label filter composes
    unchanged (full probe reproduces this operator exactly; pinned by
    test).

    NULL labels: the mismatch test is null-safe (``~eqNullSafe``), so
    an unlabeled corpus row IS a candidate negative for every labeled
    anchor and vice versa, while two unlabeled rows are conservatively
    treated as same-class (possible false negative) and excluded. A
    plain ``!=`` would silently drop every NULL-labeled row from both
    sides.

    Returns (anchor_id, rank, negative_id, negative_label, cosine_sim),
    rank 1 = hardest negative, ties by negative id.
    """
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("__alabel__"),
        F.col(vec_col).alias("__avec__"),
        norm(vec_col).alias("__an__"),
    )
    c = emb.select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(~F.col("negative_label").eqNullSafe(F.col("__alabel__")))
        .select(
            F.col("anchor_id").alias("query_id"),
            F.col("negative_id").alias("corpus_id"),
            "negative_label",
            (
                dot("__avec__", "__cvec__")
                / (F.col("__an__") * F.col("__cn__"))
            ).alias("cosine_sim"),
        )
    )
    if min_sim is not None:
        scored = scored.filter(F.col("cosine_sim") >= min_sim)
    return bounded_topk(scored, k, "cosine_sim").select(
        F.col("query_id").alias("anchor_id"),
        F.col("rk").alias("rank"),
        F.col("corpus_id").alias("negative_id"),
        "negative_label",
        F.round("cosine_sim", 4).alias("cosine_sim"),
    )


def hard_negative_ivf_topk(
    emb: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: int = 0,
    index_cache_key: str | None = None,
) -> DataFrame:
    """:func:`hard_negative_topk` through the IVF cell-probe path — the
    corpus-scale composition the brute operator's docstring names, now
    code: the null-safe label-mismatch predicate runs map-side inside
    the probed cells (``ivf_topk(label_col=...)``), so the scan is
    bounded to ~n_probe/n_centroids of the corpus per anchor batch and
    the ranking shuffle only carries different-label candidates.

    Approximate like every IVF probe: a hardest negative in an
    unprobed cell is missed; recall rises with ``n_probe`` and
    ``n_probe == n_centroids`` reproduces :func:`hard_negative_topk`
    exactly (modulo ties — both rank on (cosine DESC, id), pinned by
    the full-probe identity test). Same output contract:
    (anchor_id, rank, negative_id, negative_label, cosine_sim)."""
    out = ivf_topk(
        emb,
        anchors,
        k=k,
        n_centroids=n_centroids,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        index_cache_key=index_cache_key,
        label_col=label_col,
    )
    return out.select(
        F.col("query_id").alias("anchor_id"),
        F.col("rk").alias("rank"),
        F.col("corpus_id").alias("negative_id"),
        F.col("corpus_label").alias("negative_label"),
        "cosine_sim",
    )


def _seq_norms(mat):
    """Sequential-fold row norms of a float64 matrix — bit-identical to
    ``norm()``'s JVM fold (sqrt of ((0+x0²)+x1²)+…; IEEE doubles are
    deterministic given the op order, which the column loop pins)."""
    import numpy as np

    acc = np.zeros(mat.shape[0])
    for j in range(mat.shape[1]):
        acc = acc + mat[:, j] * mat[:, j]
    return np.sqrt(acc)


# Loud bound on the driver-collected broadcast side of the Arrow cosine
# kernels (opt r15 — the r14 verdict's "size-guard" item): the
# `F.broadcast` hint these kernels replaced failed SOFT (AQE could
# demote an over-sized broadcast to a shuffle); the kernels collect to
# the driver and would fail only at driver OOM. The guard makes the
# scale contract ("the broadcast side must be the small one") ENFORCED:
# collection is row-bounded up front (a LIMIT probe — the driver never
# materializes more than the budget + 1 rows), and the materialized
# matrix is byte-bounded after. Budgets mirror the broadcast-hint
# budget lint's role (tests/test_oracle_parity.py::_HINT_BUDGET) and
# sit far above every engine call site (benchmarks / query batches /
# mined-pair blocks) while staying well inside the JVM's own 8 GB /
# 512M-row broadcast-relation cap. Module-level so tests (and an
# operator with a bigger certified envelope) can tune them.
_BCAST_COLLECT_MAX_ROWS = 2_000_000
_BCAST_COLLECT_MAX_BYTES = 1 << 30


def _collect_bcast_bounded(df, label: str):
    """Collect a kernel's broadcast side with the loud size guard."""
    pdf = df.limit(_BCAST_COLLECT_MAX_ROWS + 1).toPandas()
    if len(pdf) > _BCAST_COLLECT_MAX_ROWS:
        raise ValueError(
            f"{label}: broadcast side exceeds "
            f"{_BCAST_COLLECT_MAX_ROWS} rows — it must be the SMALL "
            "side (an eval benchmark / query batch); at this size use "
            "the cell-bounded IVF path or a shuffle join instead"
        )
    return pdf


def _check_bcast_bytes(mat, label: str) -> None:
    if mat.nbytes > _BCAST_COLLECT_MAX_BYTES:
        raise ValueError(
            f"{label}: broadcast side is {mat.nbytes >> 20} MiB of "
            f"vectors (> {_BCAST_COLLECT_MAX_BYTES >> 20} MiB) — it "
            "must be the SMALL side; at this size use the cell-bounded "
            "IVF path or a shuffle join instead"
        )


def broadcast_cosine_scores(
    stream: DataFrame,
    bcast: DataFrame,
    stream_out: str,
    bcast_out: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "cosine_sim",
) -> DataFrame:
    """All-pairs cosine of ``stream`` × ``bcast`` as an Arrow kernel —
    the exact frame ``stream.crossJoin(broadcast(bcast))`` + the
    ``dot``/``norm`` JVM folds produce, at vectorized-numpy speed
    (guide §4.2: hand whole batches to native code; measured 14.4 → ~2
    executor-CPU-s on margin's 1M-pair frame).

    BIT-IDENTITY CONTRACT: the kernel accumulates dot products and
    squared norms COLUMN-SEQUENTIALLY over float64 (never np.dot/BLAS,
    whose block orders differ), so every cosine is bit-identical to
    the ``aggregate(zip_with(...))`` left fold — and therefore to the
    DuckDB oracle's ``list_dot_product``. Float32 inputs are widened
    exactly, multiplication/division orders mirror the expression
    ``dot(a, b) / (norm_a * norm_b)``.

    The ``bcast`` side is collected to the driver and shipped as a
    Spark broadcast variable — the SAME driver-memory envelope as the
    ``F.broadcast(bcast)`` hint this replaces (a broadcast hash
    relation is also built driver-side), so the scale contract is
    unchanged: the broadcast side must be the small one.

    Rows with NULL embeddings must be filtered by the caller (as the
    crossJoin form required); element-level NULLs or ragged dimensions
    raise loudly (the fold silently NULLed those cosines — no engine
    path feeds such vectors, and silent NaN would be worse). An
    over-sized broadcast side raises loudly at collect time
    (``_BCAST_COLLECT_MAX_ROWS`` / ``_BCAST_COLLECT_MAX_BYTES`` — the
    enforced form of the envelope the ``F.broadcast`` hint only
    documented).
    """
    import numpy as np

    spark = stream.sparkSession
    b_pdf = _collect_bcast_bounded(
        bcast.select(F.col(id_col), F.col(vec_col)),
        "broadcast_cosine_scores",
    )
    ids = b_pdf[id_col].to_numpy()
    if len(ids):
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in b_pdf[vec_col]]
        )
        _check_bcast_bytes(mat, "broadcast_cosine_scores")
        norms = _seq_norms(mat)
    else:
        mat = np.zeros((0, 0))
        norms = np.zeros(0)
    bc = spark.sparkContext.broadcast((ids, mat, norms))
    id_type = stream.schema[id_col].dataType.simpleString()
    bcast_id_type = bcast.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{bcast_out} {bcast_id_type}, {stream_out} {id_type}, "
        f"{score_col} double"
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        s_ids, S, s_norms = bc.value
        ns, d = len(s_ids), (S.shape[1] if S.size else 0)
        out_fields = [bcast_out, stream_out, score_col]
        for batch in batches:
            if ns == 0:
                continue
            tid = batch.column(0).to_numpy(zero_copy_only=False)
            lv = batch.column(1)
            if lv.null_count:
                raise ValueError(
                    "broadcast_cosine_scores: NULL embedding reached "
                    "the kernel — filter isNotNull upstream"
                )
            lens = pa.compute.list_value_length(lv).to_numpy()
            if len(lens) and not (lens == d).all():
                raise ValueError(
                    f"broadcast_cosine_scores: ragged embedding "
                    f"dimensions (expected {d}, saw "
                    f"{sorted(set(lens.tolist()))[:5]})"
                )
            flat = lv.flatten()
            if flat.null_count:
                raise ValueError(
                    "broadcast_cosine_scores: NULL embedding element "
                    "— the cosine fold is undefined here"
                )
            T = flat.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            ).reshape(len(tid), d)
            chunk = max(1, (1 << 20) // ns)
            for i in range(0, len(tid), chunk):
                Tc = T[i : i + chunk]
                tn = _seq_norms(Tc)
                acc = np.zeros((Tc.shape[0], ns))
                for j in range(d):
                    acc = acc + Tc[:, j : j + 1] * S[None, :, j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = acc / (s_norms[None, :] * tn[:, None])
                yield pa.record_batch(
                    [
                        pa.array(np.tile(s_ids, Tc.shape[0])),
                        pa.array(np.repeat(tid[i : i + chunk], ns)),
                        pa.array(cos.reshape(-1)),
                    ],
                    names=out_fields,
                )

    return stream.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        kernel, out_schema
    )


def broadcast_max_cosine(
    stream: DataFrame,
    bcast: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "max_sim",
) -> DataFrame:
    """Per-``stream``-row MAX cosine against the collected ``bcast``
    set — :func:`broadcast_cosine_scores` with the max folded INSIDE
    the kernel, so the output is one row per stream row and no pair
    frame ever exists (the semantic-decontamination shape: guide §4.2
    + §2.4 — the partial-max exchange disappears with the pairs).

    Bit-identity: cosines via the same column-sequential kernel; max
    is order-independent over doubles, and numpy's max PROPAGATES NaN
    exactly like Spark's (NaN sorts greatest, so any NaN cosine makes
    the max NaN in both). Empty ``bcast`` ⇒ empty output (the
    operator's empty-benchmark contract). An over-sized ``bcast``
    raises loudly at collect time (the shared kernel guard)."""
    import numpy as np

    spark = stream.sparkSession
    b_pdf = _collect_bcast_bounded(
        bcast.select(F.col(vec_col)), "broadcast_max_cosine"
    )
    if len(b_pdf):
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in b_pdf[vec_col]]
        )
        _check_bcast_bytes(mat, "broadcast_max_cosine")
        norms = _seq_norms(mat)
    else:
        mat = np.zeros((0, 0))
        norms = np.zeros(0)
    bc = spark.sparkContext.broadcast((mat, norms))
    id_type = stream.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {score_col} double"

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        S, s_norms = bc.value
        ns, d = S.shape[0], (S.shape[1] if S.size else 0)
        for batch in batches:
            if ns == 0:
                continue
            tid = batch.column(0).to_numpy(zero_copy_only=False)
            lv = batch.column(1)
            if lv.null_count:
                raise ValueError(
                    "broadcast_max_cosine: NULL embedding reached the "
                    "kernel — filter isNotNull upstream"
                )
            lens = pa.compute.list_value_length(lv).to_numpy()
            if len(lens) and not (lens == d).all():
                raise ValueError(
                    f"broadcast_max_cosine: ragged embedding "
                    f"dimensions (expected {d})"
                )
            flat = lv.flatten()
            if flat.null_count:
                raise ValueError(
                    "broadcast_max_cosine: NULL embedding element"
                )
            T = flat.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            ).reshape(len(tid), d)
            chunk = max(1, (1 << 20) // ns)
            for i in range(0, len(tid), chunk):
                Tc = T[i : i + chunk]
                tn = _seq_norms(Tc)
                acc = np.zeros((Tc.shape[0], ns))
                for j in range(d):
                    acc = acc + Tc[:, j : j + 1] * S[None, :, j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = acc / (s_norms[None, :] * tn[:, None])
                yield pa.record_batch(
                    [
                        pa.array(tid[i : i + chunk]),
                        pa.array(cos.max(axis=1)),
                    ],
                    names=[id_col, score_col],
                )

    return stream.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        kernel, out_schema
    )


def broadcast_cell_max_cosine(
    stream: DataFrame,
    bcast: DataFrame,
    centers: list[list[float]],
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    score_col: str = "max_sim",
) -> DataFrame:
    """:func:`broadcast_max_cosine` restricted to an IVF cell probe —
    the semantic_decontamination_ivf collapse (opt r15, guide §4.2 +
    §2.4): each ``stream`` row's max cosine is taken over ONLY the
    ``bcast`` rows whose ``n_probe`` nearest cells (under the literal
    ``centers``) include the row's ``cell_col``; a row in a cell no
    bcast row probes gets a NULL score (distinct from NaN — the
    operator's honest unprobed boundary). Output: one row per stream
    row, (id_col, score_col nullable double).

    This replaces the cell equi-join + per-id max aggregate + left
    join-back with ONE map-side pass: the join's exchange, the
    aggregate's exchange and the join-back (plus their AQE job
    barriers) no longer exist. Probe-cell selection runs the EXACT
    :func:`nearest_cells` expression on the bcast frame during the
    driver-side collect — the selection arithmetic is the engine's
    JVM fold, merely evaluated once at build time instead of inside a
    broadcast-exchange build — and the cosines accumulate
    column-sequentially over the probed SUBSET, so every per-pair dot
    is bit-identical to the ``dot``/``norm`` fold form (each pair's
    fold touches exactly its own elements; max over a subset is
    order-independent; NaN propagates identically). Empty ``bcast`` ⇒
    every stream row NULL (the operator's empty-benchmark contract at
    this grain). NULL/ragged stream vectors raise loudly; the
    collected side is size-guarded like every kernel here."""
    import numpy as np

    spark = stream.sparkSession
    b_pdf = _collect_bcast_bounded(
        bcast.select(
            F.col(vec_col).alias("__v__"),
            nearest_cells(vec_col, centers, n_probe).alias("__cells__"),
        ),
        "broadcast_cell_max_cosine",
    )
    cell_map: dict[int, "np.ndarray"] = {}
    if len(b_pdf):
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in b_pdf["__v__"]]
        )
        _check_bcast_bytes(mat, "broadcast_cell_max_cosine")
        norms = _seq_norms(mat)
        by_cell: dict[int, list[int]] = {}
        for i, cells in enumerate(b_pdf["__cells__"]):
            for c in cells:
                by_cell.setdefault(int(c), []).append(i)
        cell_map = {
            c: np.asarray(idx, dtype=np.int64)
            for c, idx in by_cell.items()
        }
    else:
        mat = np.zeros((0, 0))
        norms = np.zeros(0)
    bc = spark.sparkContext.broadcast((mat, norms, cell_map))
    id_type = stream.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {score_col} double"

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        S, s_norms, probes_by_cell = bc.value
        d = S.shape[1] if S.size else 0
        for batch in batches:
            tid = batch.column(0)
            lv = batch.column(1)
            cells = batch.column(2).to_numpy(zero_copy_only=False)
            n = len(cells)
            res = np.full(n, np.nan)
            nulls = np.ones(n, dtype=bool)
            if probes_by_cell:
                if lv.null_count:
                    raise ValueError(
                        "broadcast_cell_max_cosine: NULL embedding "
                        "reached the kernel — filter isNotNull upstream"
                    )
                lens = pa.compute.list_value_length(lv).to_numpy()
                if len(lens) and not (lens == d).all():
                    raise ValueError(
                        f"broadcast_cell_max_cosine: ragged embedding "
                        f"dimensions (expected {d})"
                    )
                flat = lv.flatten()
                if flat.null_count:
                    raise ValueError(
                        "broadcast_cell_max_cosine: NULL embedding "
                        "element"
                    )
                T = flat.to_numpy(zero_copy_only=False).astype(
                    np.float64, copy=False
                ).reshape(n, d)
                for c in np.unique(cells):
                    idx = probes_by_cell.get(int(c))
                    if idx is None:
                        continue
                    rows = np.nonzero(cells == c)[0]
                    S_c, sn_c = S[idx], s_norms[idx]
                    # chunk the stream rows so the (rows × probes)
                    # score block stays bounded (the sibling kernels'
                    # memory envelope)
                    chunk = max(1, (1 << 20) // max(len(idx), 1))
                    for i in range(0, len(rows), chunk):
                        r = rows[i : i + chunk]
                        Tc = T[r]
                        tn = _seq_norms(Tc)
                        acc = np.zeros((len(r), len(idx)))
                        for j in range(d):
                            acc = acc + Tc[:, j : j + 1] * S_c[None, :, j]
                        with np.errstate(
                            divide="ignore", invalid="ignore"
                        ):
                            cos = acc / (sn_c[None, :] * tn[:, None])
                        res[r] = cos.max(axis=1)
                        nulls[r] = False
            yield pa.record_batch(
                [
                    tid,
                    pa.array(res, mask=nulls),
                ],
                names=[id_col, score_col],
            )

    return stream.select(
        F.col(id_col), F.col(vec_col), F.col(cell_col)
    ).mapInArrow(kernel, out_schema)


def margin_knn_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based pair mining between two embedding corpora — the
    ratio-margin criterion of Artetxe & Schwenk (TACL 2019) that built
    CCMatrix (Schwenk et al., ACL 2021), the standard recipe for
    mining aligned training pairs (bitext, caption-image, QA) out of
    two unaligned corpora: raw cosine over-selects hubs (vectors close
    to EVERYTHING), so each candidate's cosine is normalized by the
    average similarity of both endpoints' k-NN neighborhoods —

        margin(x, y) = cos(x, y) / ((avg_kNN(x) + avg_kNN(y)) / 2)

    — and the pair is trusted when it is MUTUALLY best (x's nearest
    target is y and y's nearest source is x).

    Mechanism: one scored frame (broadcast ``src``, one ``tgt`` scan —
    brute_force_topk's shape), persisted for its TWO ranking consumers
    (the forward per-src top-k and the backward per-tgt top-k, both
    through the two-stage bounded ranking); neighborhood averages are
    rounded to 12 (the engine's float-combination discipline) before
    the margin. Returns ONE row per src vector — its best target with
    the margin and the mutuality flag — so downstream thresholding
    (CCMatrix keeps margin >= ~1.06) is a plain filter.

    At corpus scale the brute scored frame is the exactness baseline;
    the IVF probe (:func:`ivf_probe_topk`) supplies the same
    per-query candidate sets from cell-bounded scans and composes the
    way the hard-negative family's does. A target that is best-for-
    many-sources concentrates its (narrow) stat rows in the final
    join — AQE's skew split handles it; vectors never re-shuffle.

    ``src`` and ``tgt`` must be distinct corpora (no self-pair
    exclusion is applied); NULL embeddings are excluded. ``margin`` is
    NULL when both neighborhoods average to exactly zero.
    """
    s = src.filter(F.col(vec_col).isNotNull())
    # fan the target scan before the |src|-per-row cosine kernel — a
    # 1-2 split local table otherwise runs the whole scored frame on
    # one core (the r11 one-split lesson; measured 7.3 → 1.7 s at
    # sf0.1). No-op at corpus scale.
    from mrt_data_integration_spark.operators.dedup import _spread

    t = _spread(tgt.filter(F.col(vec_col).isNotNull()))
    # The scored frame is the Arrow column-sequential kernel — the
    # exact cosines the crossJoin + interpreted zip_with/aggregate
    # fold produced (bit-identity pinned in tests), at ~7× less
    # executor CPU (14.4 → ~2 CPU-s at bench scale, opt r14; guide
    # §4.2). The broadcast envelope is unchanged: src rode an
    # F.broadcast hint before, it rides a broadcast variable now.
    # eager: the two ranking consumers below are concurrent stages of
    # one job — unmaterialized, they RACE to compute the 1M-pair
    # cosine kernel redundantly (measured 42.9 → 15.3 executor-CPU-s
    # and 6.6 → 3.0 s wall on the fold version, opt r14)
    scored = eager_cache(
        broadcast_cosine_scores(
            t, s, stream_out="tgt_id", bcast_out="src_id",
            id_col=id_col, vec_col=vec_col,
        ).select("src_id", "tgt_id", "cosine_sim")
    )
    fwd = bounded_topk(
        scored, k, "cosine_sim", key_col="src_id", tie_col="tgt_id"
    )
    # bwd ranks per-TGT (the stream side): each tgt's candidate set is
    # exactly the broadcast src block, bounded by the broadcast
    # envelope by construction — the local pre-rank stage prunes
    # nothing structural, so skip its extra exchange + sort + window
    # pass (opt r14, guide §2.4). fwd ranks per-SRC over the unbounded
    # stream side and keeps the full two-stage ranking.
    bwd = bounded_topk(
        scored, k, "cosine_sim", key_col="tgt_id", tie_col="src_id",
        bounded_key_groups=True,
    )
    return attach_cache(_margin_assemble(fwd, bwd), [scored])


def _margin_assemble(fwd: DataFrame, bwd: DataFrame) -> DataFrame:
    """Margin/mutuality assembly shared by the brute and IVF paths:
    ``fwd`` = per-src ranked targets, ``bwd`` = per-tgt ranked sources
    — both (src_id, tgt_id, cosine_sim, rk) with UNROUNDED cosines.

    The backward join is a LEFT join: under a partial IVF probe a
    source's best target can have NO backward candidates (its probed
    cells in the source index are empty), and an inner join would drop
    that source silently — the r11 ADVICE asymmetry. Such a pair is
    emitted with a NULL margin (no backward neighborhood to normalize
    by) and ``mutual = false`` (mutuality cannot be verified). On the
    brute path the two joins are identical — every forward-best target
    appears in the full scored frame, so backward stats always exist
    (byte-identical outputs, pinned by the driver oracle)."""
    fwd_stats = fwd.groupBy("src_id").agg(
        F.round(F.avg("cosine_sim"), 12).alias("__favg__"),
        F.min(F.when(F.col("rk") == 1, F.col("tgt_id"))).alias("tgt_id"),
        F.min(F.when(F.col("rk") == 1, F.col("cosine_sim"))).alias(
            "__fcos__"
        ),
    )
    bwd_stats = bwd.groupBy("tgt_id").agg(
        F.round(F.avg("cosine_sim"), 12).alias("__bavg__"),
        F.min(F.when(F.col("rk") == 1, F.col("src_id"))).alias("__bbest__"),
    )
    denom = (F.col("__favg__") + F.col("__bavg__")) / 2
    return fwd_stats.join(bwd_stats, "tgt_id", "left").select(
        "src_id",
        "tgt_id",
        F.round("__fcos__", 4).alias("cosine_sim"),
        F.round(
            F.when(denom != 0, F.col("__fcos__") / denom), 4
        ).alias("margin"),
        F.coalesce(
            F.col("__bbest__") == F.col("src_id"), F.lit(False)
        ).alias("mutual"),
    )


def margin_knn_pairs_ivf(
    src: DataFrame,
    tgt: DataFrame,
    src_centers: list[list[float]],
    tgt_centers: list[list[float]],
    k: int = 4,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """:func:`margin_knn_pairs` through the IVF cell probe — the
    corpus-scale composition the brute operator's docstring names, now
    code (the hard-negative family's precedent): BOTH corpora carry
    their own index (``cell_col`` + the matching centers list), the
    forward neighborhoods come from probing the target index with the
    sources and the backward neighborhoods from probing the source
    index with the targets, and the margin/mutuality assembly is the
    brute path's verbatim. ``n_probe == n_centroids`` on both sides
    reproduces :func:`margin_knn_pairs` exactly (pinned by test);
    partial probes approximate the neighborhoods the way every IVF
    probe does. Self-pairs are NOT excluded (``exclude_self=False`` —
    the corpora are distinct frames whose id spaces may overlap).

    A source whose probed cells hold no target vanishes from the
    output (no candidates → no row), the IVF completeness contract.
    A source whose best target has no BACKWARD probe candidates (the
    target's probed cells in the source index are empty) is KEPT, with
    a NULL margin and ``mutual = false`` — `_margin_assemble`'s left
    backward join; dropping it silently was the r11 ADVICE asymmetry.
    """

    def _assigned(corpus: DataFrame) -> DataFrame:
        return corpus.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("corpus_id"),
            F.col(vec_col).alias("__cvec__"),
            norm(vec_col).alias("__cn__"),
            F.col(cell_col).alias("__cell__"),
        )

    fwd = _ivf_probe(
        _assigned(tgt),
        src.filter(F.col(vec_col).isNotNull()),
        tgt_centers,
        k,
        n_probe,
        id_col,
        vec_col,
        label_col=None,
        exclude_self=False,
        round_scores=False,
    ).select(
        F.col("query_id").alias("src_id"),
        F.col("corpus_id").alias("tgt_id"),
        "cosine_sim",
        "rk",
    )
    bwd = _ivf_probe(
        _assigned(src),
        tgt.filter(F.col(vec_col).isNotNull()),
        src_centers,
        k,
        n_probe,
        id_col,
        vec_col,
        label_col=None,
        exclude_self=False,
        round_scores=False,
        # the query side here is the FULL target corpus (vectors in
        # tow) — never hard-broadcast it; shuffle on the cell key and
        # let AQE convert when the measured size allows
        broadcast_queries=False,
    ).select(
        F.col("query_id").alias("tgt_id"),
        F.col("corpus_id").alias("src_id"),
        "cosine_sim",
        "rk",
    )
    return _margin_assemble(fwd, bwd)
