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
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec__")
    )
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("__cvec__"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            cosine("__qvec__", "__cvec__").alias("cosine_sim"),
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
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va__"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb__"))
    if hyperplanes is not None:
        a = a.withColumn("__bkt__", hyperplane_bucket("__va__", hyperplanes))
        b = b.withColumn("__bkt__", hyperplane_bucket("__vb__", hyperplanes))
        pairs = a.join(b, ["__bkt__"]).filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", cosine("__va__", "__vb__").alias("cs"))
        .filter(F.col("cs") >= threshold)
        .select("id_a", "id_b", F.round("cs", 4).alias("cosine_sim"))
    )


def hyperplane_bucket(
    vec: Column | str, hyperplanes: list[list[float]]
) -> Column:
    """LSH bucket id: sign-bit pattern of dot products with fixed random
    hyperplanes (passed as literals — deterministic, broadcast-free)."""
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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on hyperplane bucket, exact cosine
    within bucket, ranking window for k. Recall grows with fewer bits /
    multi-probe; plan cost is keyed-join + window instead of N×Q."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        hyperplane_bucket(vec_col, hyperplanes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__cvec__"),
        hyperplane_bucket(vec_col, hyperplanes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id", cosine("__qvec__", "__cvec__").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "corpus_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rk")
    )
