"""Corpus-profiling + sink-layout queries (E11 sketches, S7 sink,
E3 semantic dedup) — the operations a 100 TB pipeline runs BEFORE and
AFTER the dedup/filter passes: exact heavy hitters, mergeable distinct
sketches, quantile profiles, partition-pruned dataset writes, and
SemDeDup embedding-space pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators import sketches as sk
from mrt_data_integration_spark.operators.similarity import semantic_dedup
from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.sources import load_table
from mrt_data_integration_spark.sources.sinks import (
    read_partitioned_dataset,
    write_partitioned_dataset,
)


@query(
    "heavy_hitters",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id, count(*) AS cnt
      FROM events
      GROUP BY event_type, user_id
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                   count(*) AS nk
            FROM counts)
    SELECT event_type, user_id, CAST(cnt AS BIGINT) AS cnt,
           round(cnt / CAST(total AS DOUBLE), 6) AS share
    FROM counts, tot
    WHERE cnt / CAST(total AS DOUBLE) >= 1.5 / nk
    """,
)
def heavy_hitters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: exact heavy hitters — (event_type, user_id) pairs at least
    1.5× over-represented vs the uniform share
    (operators.sketches.heavy_hitters: map-side partial counts, grand
    total + key count computed over the counts frame and broadcast back
    — the corpus is scanned once and raw rows never shuffle). The bar
    is relative-to-uniform, not absolute: user cardinality grows with
    the corpus, so any absolute share threshold degenerates to zero
    hits at scale, while k×-over-uniform selects the same tail
    fraction at every SF."""
    ev = load_table(spark, sf_dir, "events")
    return sk.heavy_hitters(ev, ["event_type", "user_id"], uniform_multiple=1.5)


@query("hll_daily_distinct")  # no oracle: Datasketches HLL estimates are
# engine-specific (DuckDB's approx_count_distinct uses a different sketch);
# tests/test_sketches.py pins merged-vs-direct equality and error bounds.
def hll_daily_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: mergeable distinct-user counting — per-day HLL sketches of
    user_id per event_type, unioned to an all-time estimate
    (operators.sketches.hll_rollup). The shape a 100 TB pipeline
    persists: daily sketch rows (~KB) instead of daily user sets, with
    month/all-time distincts answered by sketch union, never a rescan."""
    ev = load_table(spark, sf_dir, "events")
    _, rolled = sk.hll_rollup(
        ev,
        F.date_trunc("day", F.col("ts")),
        "user_id",
        group_cols=["event_type"],
    )
    return rolled.select(
        "event_type",
        F.col("distinct_est").cast("long").alias("distinct_users_est"),
        "n_buckets",
        "n_rows",
    ).orderBy("event_type")


@query("approx_distinct_quantiles")  # no oracle: sketch estimates are
# engine-specific; the exact twin columns are oracle-checkable but the
# point of the query is approx-vs-exact side by side (pinned in tests).
def approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: per-flag profile of lineitem — HLL++ distinct orders and
    Greenwald-Khanna price quantiles NEXT TO their exact twins
    (operators.sketches.approx_profile), so the sketch error is
    observable. At 100 TB the exact columns drop out; the plan shape
    (one scan, fixed-size partial state, tiny merge) is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    prof = sk.approx_profile(
        li, ["l_returnflag"], "l_orderkey", "l_extendedprice"
    )
    return prof.select(
        "l_returnflag",
        "distinct_approx",
        "distinct_exact",
        F.round(F.col("quantiles_approx")[1], 2).alias("p95_approx"),
        F.round(F.col("quantiles_exact")[1], 2).alias("p95_exact"),
        "n_rows",
    ).orderBy("l_returnflag")


@query(
    "partitioned_parquet_roundtrip",
    oracle="""
    SELECT lang,
           count(*)                          AS n_docs,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
           CAST(sum(n_chars) AS BIGINT)      AS total_chars
    FROM documents
    WHERE lang IN ('en', 'zh')
    GROUP BY lang
    """,
)
def partitioned_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: partitioned-dataset sink + partition-pruned source. Writes
    documents hive-partitioned by lang (sources.sinks
    .write_partitioned_dataset: salted single shuffle → bounded file
    counts per directory, doc_id-sorted rows within each file), reads
    COMPACTS it (r9: sources.sinks.compact_dataset — the skew-aware
    small-file maintenance pass, previously CI-only, now on the driver
    path the way the streaming maintenance ops are: compaction is
    content-preserving, so the oracle is unchanged and a hash match
    proves write → compact → pruned-read loses nothing), reads the
    compacted dataset back with a lang IN (...) filter — planning-time
    directory pruning, pinned by tests/test_sinks.py — and aggregates.
    The oracle aggregates the original table: the sink/source/compactor
    chain must be value-preserving including the partition-column
    round-trip (lang values become directory names and must come back
    as the same strings)."""
    from mrt_data_integration_spark.sources.sinks import (
        compact_dataset,
        ephemeral_dir,
    )

    docs = load_table(spark, sf_dir, "documents")
    out_dir = ephemeral_dir("mrt_part_roundtrip_")
    write_partitioned_dataset(
        docs,
        out_dir,
        partition_cols=["lang"],
        sort_cols=["doc_id"],
        files_per_partition=2,
    )
    compacted_dir = ephemeral_dir("mrt_part_compacted_")
    compact_dataset(
        spark,
        out_dir,
        compacted_dir,
        partition_cols=["lang"],
        target_file_bytes=4 << 20,
    )
    back = read_partitioned_dataset(spark, compacted_dir)
    return (
        back.filter(F.col("lang").isin("en", "zh"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("doc_id").alias("n_ids"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query("semantic_dedup_summary")  # no oracle: k-means cells are not
# SQL-expressible; determinism + planted-duplicate behavior pinned in
# tests/test_similarity.py.
def semantic_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (semantic modality): SemDeDup keep/drop over the embeddings
    table (operators.similarity.semantic_dedup — k-means cells, within-
    cell cosine ≥ 0.99 pruning, exact keep-one-per-component via
    connected components). Returns the per-cell census: total vs kept.

    The synthetic embeddings have no semantic near-dups (max pairwise
    cosine ≈ 0.51), so — same convention as ``pii_redact``'s planted
    PII — every 50th vector gets a scaled copy appended (cosine exactly
    1.0 with its original, new id = id + 1_000_000): the census must
    show exactly those copies dropped, landing in their original's
    cell. In production the union-plant disappears."""
    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.1)).alias("embedding"),
        "label",
    )
    seeded = emb.unionByName(copies)
    decisions = semantic_dedup(
        seeded, eps=0.99, n_centroids=8, exact_components=True,
        index_cache_key=f"emb+planted:{sf_dir}",
    )
    return (
        decisions.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .orderBy("cell")
    )


@query(
    "value_histogram",
    oracle="""
    WITH b AS (
      SELECT CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bucket,
             value
      FROM events
    )
    SELECT bucket,
           round(bucket * 25.0, 2)        AS lo,
           round((bucket + 1) * 25.0, 2)  AS hi,
           count(*)                       AS n,
           round(sum(value), 4)           AS sum_value
    FROM b
    GROUP BY bucket
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: fixed-width histogram of events.value — 20 buckets of width
    25 with the long tail clamped into the last bucket (the portable
    ``least(floor(x/w), n-1)`` formula rather than ``width_bucket``,
    whose edge conventions differ across engines). Map-side bucket
    expression + one keyed agg over ≤ n_buckets rows: the profiling
    histogram costs one scan at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("long")
    return (
        ev.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.round(F.col("bucket") * 25.0, 2).alias("lo"),
            F.round((F.col("bucket") + 1) * 25.0, 2).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select("bucket", "lo", "hi", "n", "sum_value")
    )


@query("incremental_rollup_merge")  # no oracle: the distinct estimate is
# Datasketches-HLL-specific; merged==direct (including a parquet
# round-trip of the binary sketch state) is pinned in tests/test_sketches.py.
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: incremental-ETL aggregate maintenance — the don't-rescan-
    history shape. Events split into two ingestion batches (before/after
    Jan 16); each batch reduces to a mergeable per-type STATE
    (operators.sketches.rollup_state: counts + sums + binary HLL user
    sketch), the states merge (counts add, sketches union), and the
    merged state finalizes to the report. At 100 TB only the new
    batch's raw rows are ever touched; history exists only as
    state rows. Counts and sums are exactly the full recompute;
    the distinct estimate is IDENTICAL to the full recompute's (HLL
    union is drift-free), which the CI test asserts."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    batch1 = ev.filter(F.col("ts") < cut)
    batch2 = ev.filter(F.col("ts") >= cut)
    s1 = sk.rollup_state(batch1, ["event_type"], "value", "user_id")
    s2 = sk.rollup_state(batch2, ["event_type"], "value", "user_id")
    merged = sk.merge_rollup_states(s1, s2)
    return (
        sk.finalize_rollup(merged)
        .select(
            "event_type",
            "n_rows",
            F.round("sum_value", 4).alias("sum_value"),
            F.col("distinct_est").alias("distinct_users_est"),
        )
        .orderBy("event_type")
    )


@query(
    "stratified_fixed_k_sample",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY substr(md5('fk:' || doc_id), 1, 16), doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id, n_chars
    FROM ranked
    WHERE rk <= 20
    """,
)
def stratified_fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10/E11: fixed-size per-stratum sampling — exactly 20 documents
    per language, the ones with the smallest md5('fk:'||doc_id) hash.
    Complements ``stratified_sample`` (rate-based): rates give you a
    fraction, this gives you an exact-k eval/calibration set per
    stratum, still fully deterministic (a doc's rank depends only on
    corpus membership, never on row order). Hex strings of equal length
    order identically to their numeric values, so both engines rank by
    the raw hash string.

    Scale shape: per-stratum ranking via the same two-stage bounded
    top-k the ANN paths use (similarity.bounded_topk, ascending) — a
    plain per-lang row_number window would sort the 40 %-of-corpus
    ``en`` stratum in ONE reducer; the bounded form caps every reducer
    group at one input partition's rows."""
    from mrt_data_integration_spark.operators.similarity import bounded_topk

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.substring(
            F.md5(F.concat(F.lit("fk:"), F.col("doc_id").cast("string"))), 1, 16
        ).alias("__h__"),
    )
    return bounded_topk(
        scored, 20, "__h__", key_col="lang", tie_col="doc_id", ascending=True
    ).select("lang", "rk", "doc_id", "n_chars")


@query(
    "length_drift_ks",
    # Full replay: slice flags, the value-grain collapse, the two
    # running-CDF windows over distinct values, the |difference|
    # profile. DuckDB lateral aliases let ks_term reference the CDFs.
    oracle="""
    WITH f AS (
      SELECT n_chars AS v, (lang = 'en') AS a
      FROM documents WHERE n_chars IS NOT NULL
    ),
    pv AS (
      SELECT v,
             count(CASE WHEN a THEN 1 END)     AS n_a,
             count(CASE WHEN NOT a THEN 1 END) AS n_b
      FROM f GROUP BY v
    ),
    t AS (
      SELECT CAST(count(CASE WHEN a THEN 1 END) AS DOUBLE)     AS ta,
             CAST(count(CASE WHEN NOT a THEN 1 END) AS DOUBLE) AS tb
      FROM f
    )
    SELECT v AS n_chars, n_a, n_b,
           CASE WHEN t.ta > 0 THEN round(
             sum(n_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) / t.ta,
             6) END AS cdf_a,
           CASE WHEN t.tb > 0 THEN round(
             sum(n_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) / t.tb,
             6) END AS cdf_b,
           round(abs(cdf_a - cdf_b), 6) AS ks_term
    FROM pv, t
    """,
)
def length_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11+ (late r12, operators/drift.py): two-sample KS drift
    profile — the distribution-free drift check between the English
    slice and the rest of the corpus over document length: one row per
    distinct n_chars with both empirical CDFs and the |difference|
    whose max IS the KS statistic (the profile keeps the drift
    LOCATION visible, not just the magnitude). Scale shape: the
    corpus collapses to the VALUE GRAIN first (one partial-agg hash
    shuffle; the global CDF window then runs over a table bounded by
    the length domain, not the corpus — the exact_percentiles
    precedent), totals ride a 1-row crossJoin broadcast. The oracle
    replays flags → collapse → windows → profile end-to-end."""
    from mrt_data_integration_spark.operators.drift import (
        two_sample_ks_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    return two_sample_ks_profile(
        docs, "n_chars", F.col("lang") == "en"
    )


@query(
    "lang_category_drift",
    # Full replay: slice flags, the category-grain collapse, the 1-row
    # totals, fractions, the PSI log term and the pooled-expected
    # chi-square term — expression order mirrored exactly so the
    # rounded doubles hash-match.
    oracle="""
    WITH f AS (
      SELECT lang AS c,
             (right(source, 1) IN ('0','2','4','6','8')) AS a
      FROM documents WHERE lang IS NOT NULL
    ),
    pc AS (
      SELECT c,
             count(CASE WHEN a THEN 1 END)     AS n_a,
             count(CASE WHEN NOT a THEN 1 END) AS n_b
      FROM f GROUP BY c
    ),
    t AS (
      SELECT CAST(count(CASE WHEN a THEN 1 END) AS DOUBLE)     AS ta,
             CAST(count(CASE WHEN NOT a THEN 1 END) AS DOUBLE) AS tb
      FROM f
    )
    SELECT c AS lang, n_a, n_b,
           CASE WHEN t.ta > 0 THEN round(n_a / t.ta, 6) END AS frac_a,
           CASE WHEN t.tb > 0 THEN round(n_b / t.tb, 6) END AS frac_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN round(
             (n_a / t.ta - n_b / t.tb) * ln((n_a / t.ta) / (n_b / t.tb)),
             6) END AS psi_term,
           CASE WHEN t.ta > 0 AND t.tb > 0 THEN round(
               pow(n_a - (n_a + n_b) * t.ta / (t.ta + t.tb), 2)
                 / ((n_a + n_b) * t.ta / (t.ta + t.tb))
             + pow(n_b - (n_a + n_b) * t.tb / (t.ta + t.tb), 2)
                 / ((n_a + n_b) * t.tb / (t.ta + t.tb)),
             6) END AS chi2_term
    FROM pc, t
    """,
)
def lang_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11+ (r13, operators/drift.category_drift_profile): CATEGORICAL
    drift between two ingest slices (even- vs odd-numbered sources)
    over the language distribution — the discrete complement of
    `length_drift_ks` (language labels have no ordered domain for a
    CDF): one row per language with both slice shares, the PSI term
    (sum = Population Stability Index, the score-monitoring standard)
    and the Pearson chi-square homogeneity term. Scale shape: one
    partial-agg hash shuffle to the CATEGORY grain (bounded by the
    label domain, not the corpus), totals on a 1-row crossJoin
    broadcast, no window at all. The oracle replays flags → collapse →
    totals → both term expressions end-to-end."""
    from mrt_data_integration_spark.operators.drift import (
        category_drift_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    return category_drift_profile(
        docs,
        "lang",
        F.right(F.col("source"), F.lit(1)).isin(
            "0", "2", "4", "6", "8"
        ),
    )
