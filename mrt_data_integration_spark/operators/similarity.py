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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    The query set is broadcast (it is small by definition); the corpus
    streams through one stage computing cosine, then a per-query
    ranking window takes k. Ties broken by corpus id → total order.
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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk")
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
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat__"),
    )
    model = KMeans(
        featuresCol="__feat__",
        predictionCol="__cell__",
        k=n_centroids,
        seed=seed,
        maxIter=max_iter,
    ).fit(feats)
    assigned = model.transform(feats).select(
        "corpus_id", "__cvec__", "__cn__", "__cell__"
    )

    centers = [list(map(float, c)) for c in model.clusterCenters()]

    def probe_cells(vec: Column | str) -> Column:
        """Array of the n_probe nearest cell ids (squared-L2 to each
        literal centroid; array_sort on (dist, cell) structs)."""
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

    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        norm(vec_col).alias("__qn__"),
        F.explode(probe_cells(vec_col)).alias("__cell__"),
    )
    scored = (
        assigned.join(F.broadcast(probes), "__cell__")
        .filter(F.col("query_id") != F.col("corpus_id"))
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
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk")
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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk")
    )


def _pq_train_codebooks(
    sample: "list[list[float]]",
    n_subspaces: int,
    n_centroids: int,
    seed: int,
    n_iter: int = 25,
) -> "list[list[list[float]]]":
    """Deterministic per-subspace Lloyd's k-means on a driver-side sample
    (pure numpy — no MLlib, so the codebooks are bit-reproducible given
    the seed). Returns codebooks[s][c] = centroid vector of subspace s.
    Empty clusters reseed to the farthest point (deterministic argmax).
    """
    import numpy as np

    X = np.asarray(sample, dtype=float)
    n, d = X.shape
    d_sub = d // n_subspaces
    rs = np.random.RandomState(seed)
    books = []
    for s in range(n_subspaces):
        Xs = X[:, s * d_sub : (s + 1) * d_sub]
        idx = rs.choice(n, size=n_centroids, replace=False)
        C = Xs[idx].copy()
        for _ in range(n_iter):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
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


def _sub_dot_sql(col_name: str, s: int, d_sub: int, cent: list) -> str:
    """q_sub · centroid as ONE SQL string: building this as nested Column
    ops cost ~190 py4j round-trips per entry × 512 entries ≈ 16 s of pure
    gateway chatter per call (profiled r4); a string is one round-trip
    when the enclosing array is wrapped in a single F.expr."""
    return " + ".join(
        f"CAST(element_at(`{col_name}`, {s * d_sub + i + 1}) AS DOUBLE) * {float(cent[i])!r}"
        for i in range(d_sub)
    )


def _pq_code(vec_name: str, books: list, d_sub: int) -> Column:
    """Array of per-subspace nearest-centroid ids (the PQ code) — one
    F.expr over literal centroids. Uses the ‖x−c‖² expansion:
    argmin_c ‖x−c‖² = argmax_c (x·c − ‖c‖²/2); per subspace the argmax
    is an array_sort over (−score, cid) structs (min cid tie-break)."""
    subs = []
    for s, book in enumerate(books):
        entries = []
        for cid, cent in enumerate(book):
            half_norm = 0.5 * sum(x * x for x in cent)
            entries.append(
                f"named_struct('neg', -({_sub_dot_sql(vec_name, s, d_sub, cent)}"
                f" - {float(half_norm)!r}), 'cid', {cid})"
            )
        subs.append(
            f"element_at(array_sort(array({', '.join(entries)})), 1).cid"
        )
    return F.expr("array(" + ", ".join(subs) + ")")


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
) -> DataFrame:
    """Product-quantization approximate top-k with exact re-rank — the
    memory-bounded ANN path: at corpus scale each vector is represented
    by ``n_subspaces`` byte-sized codes (here 4 codes ≈ 4 bytes vs
    256 bytes of float32×64), so the candidate scan touches codes, not
    vectors (Jégou et al. 2011, "Product Quantization for Nearest
    Neighbor Search", TPAMI).

    Shape: codebooks train on a bounded driver-side sample
    (deterministic numpy k-means); corpus encoding is map-only literal-
    centroid expressions; each query carries a flattened ADC lookup
    table (query-subvector · centroid dot products), broadcast against
    the coded corpus; the approximate score is ``n_subspaces`` array
    lookups per pair (vs a d-dim dot product); the top
    ``k·rerank_factor`` ADC candidates per query re-rank by exact
    cosine. Everything after training is JVM expressions — no UDFs.
    """
    d_sub_probe = corpus.select(F.size(_c(vec_col)).alias("d")).first()["d"]
    d_sub = d_sub_probe // n_subspaces
    sample = [
        [float(v) for v in r["v"]]
        for r in corpus.select(_c(vec_col).alias("v"))
        .orderBy(_c(id_col))
        .limit(train_sample)
        .collect()
    ]
    books = _pq_train_codebooks(sample, n_subspaces, n_centroids, seed)

    coded = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(vec_col).alias("__cn__"),
        _pq_code(vec_col, books, d_sub).alias("__codes__"),
    )

    # Flattened ADC LUT per query: lut[s*n_centroids + c] = q_sub · cent.
    lut_entries = []
    for s, book in enumerate(books):
        for cent in book:
            lut_entries.append(_sub_dot_sql(vec_col, s, d_sub, cent))
    lut_expr = F.expr("array(" + ", ".join(lut_entries) + ")")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        norm(vec_col).alias("__qn__"),
        lut_expr.alias("__lut__"),
    )

    nc = n_centroids
    scored = coded.crossJoin(F.broadcast(q)).filter(
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
    scored = scored.withColumn("__adc__", adc)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("__adc__").desc(), F.col("corpus_id")
    )
    cand = scored.withColumn("__r__", F.row_number().over(w_adc)).filter(
        F.col("__r__") <= k * rerank_factor
    )
    exact = cand.select(
        "query_id",
        "corpus_id",
        (dot("__qvec__", "__cvec__") / (F.col("__qn__") * F.col("__cn__"))).alias(
            "cosine_sim"
        ),
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
