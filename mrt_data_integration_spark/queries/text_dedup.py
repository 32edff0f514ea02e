"""Text-analysis and dedup queries on the documents table (SURVEY.md
§2.9 E3+E5), each with a DuckDB oracle (md5-based hashing is
bit-identical across engines, so even MinHash/LSH/SimHash are
exact-checkable — not just rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators import dedup as dd
from mrt_data_integration_spark.operators import text as tx
from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.sources import load_table

_STOP_SQL = "('the','a','an','of','to','and','in','is','it')"

# DuckDB twin of operators.text/dedup building blocks.
_TOKENS = "string_split_regex(text, '\\s+')"
_SHINGLES = f"""
  list_distinct(list_transform(
    generate_series(1, greatest(len({_TOKENS}) - 2, 1)),
    i -> array_to_string(({_TOKENS})[i:i+2], ' ')
  ))
"""


@query(
    "doc_quality_stats",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang, source,
             len({_TOKENS}) AS n_tokens,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
               / len({_TOKENS}) AS avg_token_len,
             CAST(len(list_filter({_TOKENS}, t -> t IN {_STOP_SQL})) AS DOUBLE)
               / len({_TOKENS}) AS stop_ratio
      FROM documents
    )
    SELECT source,
           count(*)                        AS n_docs,
           round(avg(n_tokens), 4)         AS avg_tokens,
           round(avg(avg_token_len), 4)    AS avg_tok_len,
           round(avg(stop_ratio), 4)       AS avg_stop_ratio
    FROM feats
    GROUP BY source
    """,
)
def doc_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: per-source document quality profile — token counts, average
    token length, stopword density (operators.text)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "source",
        tx.token_count("text").alias("n_tokens"),
        tx.avg_token_length("text").alias("avg_token_len"),
        tx.stopword_ratio("text").alias("stop_ratio"),
    )
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("avg_token_len"), 4).alias("avg_tok_len"),
        F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
    )


@query(
    "doc_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CASE WHEN CAST(len(list_filter({_TOKENS}, t -> t IN {_STOP_SQL})) AS DOUBLE)
                       / len({_TOKENS}) >= 0.02
                  THEN 'en' ELSE 'other' END AS lang_pred
      FROM documents
    )
    SELECT lang, lang_pred, count(*) AS n
    FROM scored
    GROUP BY lang, lang_pred
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: stopword-density language-ID heuristic vs the labeled lang
    column (confusion-matrix counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", tx.lang_id_heuristic("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "doc_fingerprint_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
      FROM documents
    )
    SELECT count(*)                   AS n_docs,
           count(DISTINCT fingerprint) AS n_distinct,
           count(*) - count(DISTINCT fingerprint) AS n_exact_dups
    FROM fp
    """,
)
def doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: exact dedup accounting via canonical md5 fingerprint
    (operators.text.fingerprint / operators.dedup.exact_dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(tx.fingerprint("text").alias("fingerprint"))
    return fp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("fingerprint")).alias("n_exact_dups"),
    )


@query(
    "minhash_signatures",
    oracle=f"""
    SELECT doc_id,
           list_min(list_transform({_SHINGLES}, x -> md5('seed0:' || x))) AS minhash_0,
           list_min(list_transform({_SHINGLES}, x -> md5('seed1:' || x))) AS minhash_1,
           list_min(list_transform({_SHINGLES}, x -> md5('seed2:' || x))) AS minhash_2,
           list_min(list_transform({_SHINGLES}, x -> md5('seed3:' || x))) AS minhash_3
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: MinHash signatures (4 seeds, 3-word shingles) on a doc sample
    — the per-row, shuffle-free half of MinHash-LSH dedup. Shingles are
    materialized once and shared across all hash seeds (one tokenize +
    shingle pass instead of four)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    with_sh = docs.select("doc_id", dd.word_shingles("text", 3).alias("__sh__"))
    return with_sh.select(
        "doc_id", *dd.minhash_signature("text", n_hashes=4, shingles=F.col("__sh__"))
    )


@query(
    "lsh_candidate_pairs",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id,
             list_min(list_transform({_SHINGLES}, x -> md5('seed0:' || x))) AS mh0,
             list_min(list_transform({_SHINGLES}, x -> md5('seed1:' || x))) AS mh1,
             list_min(list_transform({_SHINGLES}, x -> md5('seed2:' || x))) AS mh2,
             list_min(list_transform({_SHINGLES}, x -> md5('seed3:' || x))) AS mh3
      FROM documents
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band_id, md5(mh2 || '|' || mh3) AS band_key FROM sigs
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.band_id
    FROM bands a
    JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    """,
)
def lsh_candidate_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: MinHash-LSH banding (4 hashes × band size 2) → candidate
    near-dup pairs via equi-join on band keys (operators.dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.lsh_candidate_pairs(docs, n_hashes=4, band_size=2)


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, substr(md5(unnest({_SHINGLES})), 1, 16) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_inter,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    """,
)
def ngram_jaccard_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: exact 3-gram Jaccard near-dup pairs (shingle-join — only
    co-shingled docs meet; no N² cross join). ``max_shingle_df=None``
    explicitly: the SQL oracle computes UNCAPPED Jaccard, so the query
    must too — the operator's skew cap (default 500) changes semantics
    above the cap and belongs to production corpora, not this check."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, threshold=0.2, max_shingle_df=None)


@query(
    "ngram_jaccard_pairs_prefix",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, substr(md5(unnest({_SHINGLES})), 1, 16) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_inter,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
)
def ngram_jaccard_pairs_prefix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 scale path: the SAME exact-Jaccard result via PPJoin-style
    prefix filtering (rarest-first global shingle order, prefix-only
    candidate join, array_intersect verification). The oracle is the
    plain pair-join formulation — equality of results IS the exactness
    claim of the prefix filter."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs_prefix(docs, threshold=0.5)


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df_ AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.term,
             round(sum(tf.tf * ln((1.0 + n.n_docs) / (1.0 + df_.df)) ), 4)
               AS total_tfidf,
             max(df_.df) AS doc_freq
      FROM tf JOIN df_ ON tf.term = df_.term CROSS JOIN n
      GROUP BY tf.term
    )
    SELECT term, total_tfidf, doc_freq
    FROM scored
    ORDER BY total_tfidf DESC, term
    LIMIT 15
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: TF-IDF scoring — term frequency per doc, document frequency,
    smoothed idf ln((1+N)/(1+df)), corpus-level top terms. All JVM-side
    (explode → two grouped aggs → joins); total order on (score, term)
    so LIMIT is engine-independent.

    Scale notes (r12, the r11 verdict's broadcast-gating item): the
    corpus-wide distinct-term df table is Zipf-bounded but grows with
    the corpus and is unbounded in principle — a hard
    ``F.broadcast(df_)`` hint forced it through the driver at any
    size, the OOM class the engine gates everywhere else
    (decontaminate's ``broadcast_hits``, dedup's ``broadcast_frequent``
    escape hatch, DSIR's fixed-width hashed model). No hint: AQE
    broadcasts it at bench scale (measured — same physical join) and
    falls back to a shuffle join when it outgrows the threshold.
    ``n_docs`` stays IN-PLAN as a 1-row aggregate crossJoin-broadcast
    (the DSIR/BM25 pattern) instead of a separate ``docs.count()``
    action."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs__"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df rides a count window over term (tf is (doc, term)-distinct by
    # construction, so the count IS countDistinct(doc_id)), and the
    # final term aggregate reuses the window's partitioning — ONE
    # tokenize pass and one term-keyed exchange where the join form
    # re-tokenized the corpus for the df branch and shuffled the tf
    # frame a third time through the join (opt r14, guide §2.4; plan:
    # 2 `Scan parquet documents` → 1, the idf_shingle_weights window
    # precedent). The tf·idf addends are expression-identical to the
    # join form — only the (already shuffle-order-dependent) summation
    # grouping changed, absorbed by round(4) exactly as before.
    from pyspark.sql import Window as W

    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("term"))
    )
    idf = F.log((1.0 + F.col("__n_docs__")) / (1.0 + F.col("df")))
    scored = (
        tf.crossJoin(F.broadcast(n))  # 1 row: map-side constant
        .groupBy("term")
        .agg(
            F.round(F.sum(F.col("tf") * idf), 4).alias("total_tfidf"),
            F.max("df").alias("doc_freq"),
        )
    )
    return scored.orderBy(F.col("total_tfidf").desc(), "term").limit(15)


@query(
    "bpe_ish_token_counts",
    oracle=r"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
             AS whitespace_tokens,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]')))
                AS BIGINT) AS subword_tokens
    FROM documents
    GROUP BY source
    """,
)
def bpe_ish_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: token counting — whitespace tokens plus a BPE-ish regex
    segmentation (lowercase runs / Capitalized runs / digit runs /
    single punctuation), the pre-tokenizer shape of byte-pair
    encoders. JVM-side regexp_count; no Python."""
    docs = load_table(spark, sf_dir, "documents")
    bpe_pat = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]"
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+"))).alias("whitespace_tokens"),
        F.sum(F.regexp_count("text", F.lit(bpe_pat))).alias("subword_tokens"),
    )


@query(
    "char_ngram_min_sketch",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(text) - 7, 1)),
               i -> md5(substr(text, i, 8))
             ) AS hs
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id,
           list_min(hs)                        AS min_gram_hash,
           CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct_grams
    FROM grams
    """,
)
def char_ngram_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: rolling character-8-gram fingerprint sketch — the winnowing/
    min-hash shape over character shingles (every position, md5-hashed,
    min kept). Array expressions only; the per-doc sketch is the unit
    that scales to content-defined chunking."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1)))
    hs = F.transform(idx, lambda i: F.md5(F.col("text").substr(i, F.lit(8))))
    return docs.select(
        "doc_id",
        F.array_min(hs).alias("min_gram_hash"),
        F.size(F.array_distinct(hs)).cast("long").alias("n_distinct_grams"),
    )


@query(
    "simhash_buckets",
    oracle=None,  # assembled below (needs a generated per-bit SQL body)
)
def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: 16-bit SimHash per doc (majority vote over token-md5 bits) +
    bucket sizes. Oracle SQL is generated below with the identical
    nibble arithmetic."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    sh = docs.select("doc_id", dd.simhash("text", n_bits=16).alias("simhash"))
    return sh.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


def _simhash_oracle(n_bits: int = 16) -> str:
    """DuckDB twin of operators.dedup.simhash's nibble-bit expression."""
    def bit_expr(i: int) -> str:
        ch = f"substr(md5(t), {1 + i // 4}, 1)"
        nib = f"(ascii({ch}) - 48 - CASE WHEN ascii({ch}) >= 97 THEN 39 ELSE 0 END)"
        return f"((({nib}) >> {i % 4}) & 1)"

    votes = [
        f"CASE WHEN list_sum(list_transform({_TOKENS}, "
        f"t -> CASE WHEN {bit_expr(i)} = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {2**i} ELSE 0 END"
        for i in range(n_bits)
    ]
    total = " + ".join(votes)
    return f"""
    WITH sh AS (
      SELECT doc_id, CAST({total} AS BIGINT) AS simhash
      FROM documents
      WHERE doc_id % 5 = 0
    )
    SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
    FROM sh
    GROUP BY simhash
    """


from mrt_data_integration_spark.queries.registry import ORACLES  # noqa: E402

ORACLES["simhash_buckets"] = _simhash_oracle()


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             len({_TOKENS}) AS n_tokens,
             1.0 - CAST(len(list_distinct({_TOKENS})) AS DOUBLE)
                 / len({_TOKENS}) AS dup_token_frac,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
               / len({_TOKENS}) AS mean_word_len,
             CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / length(text) AS symbol_ratio
      FROM documents
    ),
    flagged AS (
      SELECT lang,
             CASE WHEN n_tokens BETWEEN 5 AND 100000
                   AND mean_word_len BETWEEN 2 AND 12
                   AND dup_token_frac < 0.6
                   AND symbol_ratio < 0.1 THEN 1 ELSE 0 END AS pass
      FROM feats
    )
    SELECT lang, count(*) AS n_docs, CAST(sum(pass) AS BIGINT) AS n_pass,
           round(CAST(sum(pass) AS DOUBLE)/count(*), 4) AS pass_rate
    FROM flagged GROUP BY lang
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: Gopher-style quality gates (Rae et al. 2021 §A1.1 — token
    count band, mean word length band, repetition cap, symbol cap),
    summarized as a per-language pass rate. Map-only feature pass +
    one tiny keyed aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    flags = docs.select(
        "lang", tx.gopher_quality_pass("text").alias("pass")
    )
    return flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pass").alias("n_pass"),
        F.round(F.sum("pass") / F.count(F.lit(1)), 4).alias("pass_rate"),
    )


@query(
    "deterministic_split",
    oracle="""
    WITH tagged AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
               % 100 AS h
      FROM documents
    )
    SELECT CASE WHEN h < 80 THEN 'train'
                WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM tagged GROUP BY 1
    """,
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment by hashing the
    stable document id (md5 → bucket mod 100) — the split every
    training pipeline needs: deterministic across engines, runs,
    partitionings and cluster sizes (no RNG, no sampleBy seed
    coupling), and any engine can recompute membership row-locally.
    Map-only + one tiny aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    tagged = docs.select(
        "doc_id",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test").alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "training_data_prep",
    oracle="""
    WITH fp AS (
      SELECT doc_id, text,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
      FROM documents
    ),
    keep AS (
      SELECT fingerprint, min(doc_id) AS doc_id FROM fp GROUP BY fingerprint
    ),
    deduped AS (
      SELECT fp.doc_id, fp.text FROM fp JOIN keep
        ON fp.fingerprint = keep.fingerprint AND fp.doc_id = keep.doc_id
    ),
    toks AS (
      SELECT doc_id, text, string_split_regex(text, '\\s+') AS tk FROM deduped
    ),
    quality AS (
      SELECT doc_id, len(tk) AS n_tokens FROM toks
      WHERE len(tk) BETWEEN 5 AND 100000
        AND CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / len(tk) BETWEEN 2 AND 12
        AND 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) < 0.6
        AND CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
            / length(text) < 0.1
    ),
    tagged AS (
      SELECT n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
               % 100 AS h
      FROM quality
    )
    SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 2) AS avg_tokens
    FROM tagged GROUP BY 1
    """,
)
def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+E5 composition — the end-to-end training-data prep pipeline:
    exact dedup (canonical fingerprint, keep smallest id) → Gopher
    quality gates → deterministic hash split → per-split document and
    token accounting. One fingerprint-keyed shuffle for the dedup
    semi-join and one tiny split aggregation; every filter is a
    map-side codegen expression, so the pipeline reads the corpus
    exactly twice (fingerprint pass + kept-rows pass) regardless of
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    deduped = dd.exact_dedup(docs)
    quality = deduped.filter(tx.gopher_quality_pass("text") == 1).select(
        "doc_id", tx.token_count("text").alias("n_tokens")
    )
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    tagged = quality.select(
        "n_tokens",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test").alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )


@query(
    "doc_repetition_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks FROM documents
    ),
    rep AS (
      SELECT lang,
             CASE WHEN len(toks) >= 2 THEN
               1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
                     i -> array_to_string(toks[i:i+1], ' ')))) AS DOUBLE)
                   / (len(toks) - 1)
             END AS dup2,
             1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup1
      FROM t
    )
    SELECT lang,
           count(*)                                    AS n_docs,
           CAST(count(*) FILTER (dup2 > 0.05) AS BIGINT) AS n_repetitious,
           round(avg(dup2), 4)                         AS avg_dup_2gram,
           round(avg(dup1), 4)                         AS avg_dup_token
    FROM rep GROUP BY lang
    """,
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 (round 4): within-document repetition at n-gram granularity —
    the Gopher duplicate-2-gram filter (Rae et al. 2021 §A1.1) beside
    the token-level signal. Map-only expressions + one tiny keyed agg;
    avg() skips the NULL (sub-2-token) docs identically in both
    engines."""
    from mrt_data_integration_spark.operators.decontaminate import word_ngrams

    docs = dd._spread(load_table(spark, sf_dir, "documents"))
    # Two-step projection: materialize the token/gram arrays ONCE per row
    # (a single expression referencing them 2-3 times would re-split and
    # re-slice per reference — measured 13s -> ~1s at sf0.1).
    arrays = docs.select(
        "lang",
        word_ngrams("text", 2).alias("g2"),
        tx.tokens("text").alias("tk"),
    )
    rep = arrays.select(
        "lang",
        F.when(
            F.size("g2") > 0,
            1.0 - F.size(F.array_distinct("g2")).cast("double") / F.size("g2"),
        ).alias("dup2"),
        (
            1.0 - F.size(F.array_distinct("tk")).cast("double") / F.size("tk")
        ).alias("dup1"),
    )
    return rep.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("dup2") > 0.05, 1)).alias("n_repetitious"),
        F.round(F.avg("dup2"), 4).alias("avg_dup_2gram"),
        F.round(F.avg("dup1"), 4).alias("avg_dup_token"),
    )


@query(
    "benchmark_decontamination",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS gram
      FROM t WHERE len(toks) >= 3
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    cont AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 97 <> 0
    )
    SELECT lang,
           count(*) AS n_corpus_docs,
           CAST(count(*) FILTER (doc_id IN (SELECT doc_id FROM cont))
                AS BIGINT) AS n_contaminated,
           round(CAST(count(*) FILTER (doc_id IN (SELECT doc_id FROM cont))
                 AS DOUBLE) / count(*), 4) AS contaminated_frac
    FROM t WHERE doc_id % 97 <> 0
    GROUP BY lang
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (round 4): cross-corpus decontamination — flag corpus docs
    sharing ≥1 word n-gram with a benchmark set (here the deterministic
    doc_id % 97 == 0 subset standing in for an eval set; n=3 so the
    synthetic corpus shows real overlap — production sweeps use n=8-13).
    Scale shape (operators/decontaminate.py): fixed-width md5 gram
    hashes only, benchmark side broadcast → the corpus never
    shuffles."""
    from mrt_data_integration_spark.operators.decontaminate import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = decontaminate(corpus, bench, ngram_n=3)
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_corpus_docs"),
        F.count(F.when(F.col("contaminated"), 1)).alias("n_contaminated"),
        F.round(
            F.count(F.when(F.col("contaminated"), 1)).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("contaminated_frac"),
    )


@query(
    "training_mix_rebalance",
    oracle="""
    WITH tok AS (
      SELECT lang, len(string_split_regex(text, '\\s+')) AS n_tokens
      FROM documents
    ),
    per AS (
      SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
      FROM tok GROUP BY lang
    ),
    tot AS (SELECT sum(lang_tokens) AS total, count(*) AS n_langs FROM per)
    SELECT lang,
           lang_tokens,
           round(CAST(lang_tokens AS DOUBLE) / total, 4)          AS current_share,
           round(1.0 / n_langs, 4)                                AS target_share,
           round(least(1.0, (CAST(total AS DOUBLE) / n_langs)
                 / lang_tokens), 4)                               AS sampling_rate
    FROM per, tot
    """,
)
def training_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 (round 4): language-mix rebalancing — per-language token
    shares and the downsampling rate that moves the corpus toward a
    uniform target mix (rate = min(1, target_tokens/current_tokens);
    upweighting is left to the loader, hence the cap at 1). The shape
    of every 'data mixture' step in LLM training-data pipelines: one
    map-side token count, one tiny keyed agg, one broadcast of the
    single-row total."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("lang", tx.token_count("text").alias("n_tokens"))
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("lang_tokens"))
    )
    tot = per.agg(
        F.sum("lang_tokens").alias("total"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    joined = per.crossJoin(F.broadcast(tot))
    return joined.select(
        "lang",
        "lang_tokens",
        F.round(F.col("lang_tokens").cast("double") / F.col("total"), 4).alias(
            "current_share"
        ),
        F.round(F.lit(1.0) / F.col("n_langs"), 4).alias("target_share"),
        F.round(
            F.least(
                F.lit(1.0),
                (F.col("total").cast("double") / F.col("n_langs"))
                / F.col("lang_tokens"),
            ),
            4,
        ).alias("sampling_rate"),
    )


# Char-trigram explode, shared by the LM-filter query and its oracle.
# Lowercased so the model sees case-normalized text (CCNet convention).
_TRIGRAMS_SQL = """
      list_transform(
        generate_series(1, length(lower(text)) - 2),
        o -> substr(lower(text), o, 3))
"""


@query(
    "char_trigram_lm_filter",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, lang, unnest({_TRIGRAMS_SQL}) AS g
      FROM documents
    ),
    model AS (
      SELECT g, count(*) AS c FROM grams WHERE lang = 'en' GROUP BY g
    ),
    tot AS (SELECT sum(c) AS n FROM model),
    scored AS (
      SELECT gr.doc_id, gr.lang,
             coalesce(ln(m.c / CAST(t.n AS DOUBLE)),
                      ln(0.5 / CAST(t.n AS DOUBLE))) AS lp
      FROM grams gr
      LEFT JOIN model m USING (g)
      CROSS JOIN tot t
    )
    SELECT lang,
           count(DISTINCT doc_id)      AS n_docs,
           round(avg(lp), 4)           AS avg_logprob,
           round(exp(-avg(lp)), 2)     AS perplexity
    FROM scored
    GROUP BY lang
    """,
)
def char_trigram_lm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E10: statistical LM quality filtering (the CCNet recipe,
    Wenzek et al. 2020: score text by a character-level n-gram LM
    trained on a reference corpus; outliers in perplexity are
    boilerplate or the wrong language). Here the reference model is the
    corpus's own English subset: trigram counts → unigram-normalized
    log-probabilities, unseen trigrams backed off to a 0.5-count floor.

    Scale shape: the model is a keyed agg over the reference slice
    (bounded by |alphabet|³ distinct keys, a few MB — broadcastable),
    scoring is one equi-join of exploded corpus trigrams against it,
    and the report is a per-language roll-up. Nothing quadratic, no
    Python. The oracle recomputes model AND scores in SQL, so the
    hash check covers training and scoring end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            # Guard short docs: sequence(1, 0) in Spark defaults to step -1
            # and yields the DESCENDING [1, 0] — two bogus partial
            # "trigrams" — whereas DuckDB's generate_series(1, len-2) is
            # empty. Gate on length >= 3 so both engines emit nothing.
            F.expr(
                "CASE WHEN length(text) >= 3 THEN"
                " transform(sequence(1, length(lower(text)) - 2),"
                " o -> substring(lower(text), o, 3))"
                " ELSE array() END"
            )
        ).alias("g"),
    )
    model = (
        grams.filter(F.col("lang") == "en").groupBy("g").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    total = model.agg(F.sum("c").alias("n"))
    scored = (
        grams.join(F.broadcast(model), "g", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "lang",
            F.coalesce(
                F.log(F.col("c") / F.col("n")),
                F.log(F.lit(0.5) / F.col("n")),
            ).alias("lp"),
        )
    )
    return scored.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
        F.round(F.exp(-F.avg("lp")), 2).alias("perplexity"),
    )


@query(
    "lsh_store_ingest_candidates",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id,
             list_min(list_transform({_SHINGLES}, x -> md5('seed0:' || x))) AS mh0,
             list_min(list_transform({_SHINGLES}, x -> md5('seed1:' || x))) AS mh1,
             list_min(list_transform({_SHINGLES}, x -> md5('seed2:' || x))) AS mh2,
             list_min(list_transform({_SHINGLES}, x -> md5('seed3:' || x))) AS mh3
      FROM documents
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band_id, md5(mh2 || '|' || mh3) AS band_key FROM sigs
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
    )
    SELECT c.new_id, c.ref_id,
           round((CASE WHEN n.mh0 = r.mh0 THEN 1 ELSE 0 END
                + CASE WHEN n.mh1 = r.mh1 THEN 1 ELSE 0 END
                + CASE WHEN n.mh2 = r.mh2 THEN 1 ELSE 0 END
                + CASE WHEN n.mh3 = r.mh3 THEN 1 ELSE 0 END) / 4.0, 4)
             AS sig_agreement
    FROM cands c
    JOIN sigs n ON n.doc_id = c.new_id
    JOIN sigs r ON r.doc_id = c.ref_id
    """,
)
def lsh_store_ingest_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (round 6): incremental text-dedup ingest against a PERSISTED
    LSH signature store (operators.dedup.build_lsh_signature_store /
    lsh_store_candidates) — the even-id half of the corpus is the
    stored "training set", the odd-id half the incoming batch; returns
    candidate pairs + the minhash Jaccard estimate. The store is built
    once per corpus under a content-keyed temp dir (build-once/
    probe-many); each probe scans only the BATCH and joins the stored
    band table without re-shingling the reference — at 100 TB the
    difference between a daily full-corpus scan and a daily batch scan.
    The DuckDB oracle recomputes both sides' signatures from scratch,
    so the hash check covers store write, read-back, and the probe join
    end-to-end."""
    import hashlib
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    src = os.path.join(sf_dir, "documents.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    key = hashlib.md5(f"{sf_dir}|{mtime}|lshstore-v2-4x2".encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"mrt_lsh_store_{key}")
    # Shared build-private-then-publish protocol: two concurrent
    # invocations (bench + parity test on the same sf_dir) would
    # otherwise race check-then-build, and one's mode("overwrite")
    # would delete bands/ under the other's probe.
    from mrt_data_integration_spark.sources.sinks import build_and_publish

    path = build_and_publish(
        path,
        "meta.json",
        lambda tmp: dd.build_lsh_signature_store(
            ref, tmp, n_hashes=4, band_size=2
        ),
    )
    return dd.lsh_store_candidates(spark, path, new)


def _bpe_ctes(n_merges: int) -> str:
    """The generated BPE training chain shared by both oracles: one CTE
    stage per merge round (pair explode → weighted count → argmax with
    the (count DESC, left, right) tie-break → double-replace merge),
    over the same one-scan word-frequency table the operator
    aggregates. Returns the complete ``WITH ...`` prefix; callers
    append their final SELECT."""
    ctes = [
        r"""w0 AS (
      SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' </w>' AS s, cnt
      FROM (
        SELECT w AS word, count(*) AS cnt FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          FROM documents)
        WHERE w <> '' GROUP BY w)
    )"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(f"""p{i} AS (
      SELECT syms[k] AS "left", syms[k+1] AS "right", sum(cnt) AS total
      FROM (SELECT string_split(s, ' ') AS syms, cnt FROM w{i - 1}),
           LATERAL (SELECT unnest(range(1, len(syms))) AS k) u
      GROUP BY 1, 2
    ), b{i} AS (
      SELECT "left", "right", total FROM p{i}
      ORDER BY total DESC, "left", "right" LIMIT 1
    ), w{i} AS (
      SELECT trim(replace(replace(' ' || s || ' ',
                  ' ' || "left" || ' ' || "right" || ' ',
                  ' ' || "left" || "right" || ' '),
                  ' ' || "left" || ' ' || "right" || ' ',
                  ' ' || "left" || "right" || ' ')) AS s, cnt
      FROM w{i - 1}, b{i}
    )""")
    return "WITH " + ",\n    ".join(ctes)


def _bpe_oracle(n_merges: int) -> str:
    """The learned merge table: the training chain plus one row per
    round's argmax. CAST the HUGEINT sum back to BIGINT (the r3
    sessionization lesson)."""
    finals = "\n    UNION ALL ".join(
        f'SELECT {i} AS rank, "left", "right", "left" || "right" AS merged,'
        f" CAST(total AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return _bpe_ctes(n_merges) + "\n    " + finals


def _bpe_tokens_oracle(n_merges: int, top: int) -> str:
    """Same generated training chain, but the final select re-encodes
    nothing — it reads the chain's LAST word-state CTE (w{n}) directly:
    trainer final state == encoder output by construction, so this
    oracle pins the encode path's token frequencies too."""
    return (
        _bpe_ctes(n_merges)
        + f"""
    SELECT token, CAST(sum(cnt) AS BIGINT) AS n_occurrences
    FROM (SELECT string_split(s, ' ') AS syms, cnt FROM w{n_merges}),
         LATERAL (SELECT unnest(syms) AS token) u
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT {top}"""
    )


@query("bpe_train_merges", oracle=_bpe_oracle(8))
def bpe_train_merges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (round 7): distributed BPE tokenizer TRAINING — learn the
    first 8 merges from the documents corpus (operators/tokenizer.py:
    one corpus scan to a Zipf-compressed word-frequency table, then one
    small distributed job + O(1)-row argmax collect per round). The
    oracle replays the whole training loop as chained SQL CTEs, so the
    hash match pins every round's pair counts, tie-breaks, and merge
    applications, not just the final table."""
    from mrt_data_integration_spark.operators.tokenizer import train_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    return train_bpe_merges(docs, n_merges=8, min_pair_count=1)


@query("bpe_token_counts", oracle=_bpe_tokens_oracle(8, 20))
def bpe_token_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (late r7): the ENCODE half of the tokenizer contract — the
    top-20 corpus tokens under the learned tokenizer. Reads the
    trainer's final symbol state (which IS the encoded corpus;
    encoder == trainer is pinned by tests/test_tokenizer.py's
    python-twin state comparison) so the query pays ONE corpus scan,
    and the oracle reads the training chain's final word-state CTE —
    the hash match pins the full 8 merge applications plus the
    weighted token aggregation. Deterministic (count DESC, token)
    top-k cut on both sides."""
    from mrt_data_integration_spark.operators.tokenizer import (
        token_frequencies,
        train_bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    # return_state: the trainer's final symbol table IS the encoded
    # corpus (encoder == trainer by construction, pinned in
    # tests/test_tokenizer.py) — re-encoding from scratch would pay the
    # corpus scan and all 8 merge passes a second time.
    _, state = train_bpe_merges(
        docs, n_merges=8, min_pair_count=1, return_state=True
    )
    return (
        token_frequencies(state)
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(20)
    )


def _pagerank_oracle(iters: int, damping: float, topk: int) -> str:
    """Chained-CTE replay of the FULL PageRank power iteration (same
    generator pattern as the BPE oracle): edge derivation (the exact
    Jaccard pair join, verbatim from `ngram_jaccard_pairs`), then one
    (contrib, dangling-mass, rank) CTE triple per iteration. Float
    constants are emitted with repr() so DuckDB parses the IDENTICAL
    double Python handed Spark ((1-0.85) is 0.15000000000000002, not
    0.15) — every arithmetic step is then the same IEEE op on the same
    operands in both engines; only summation ORDER can differ, which
    round(,8) absorbs (see the A-ES rounding note, LATE_R7_NOTES.md)."""
    head = f"""
    WITH sh AS (
      SELECT doc_id, substr(md5(unnest({_SHINGLES})), 1, 16) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    outdeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    r0 AS (
      SELECT doc_id AS node, 1.0 / (SELECT n FROM nn) AS rank
      FROM documents
    )"""
    teleport = repr(1.0 - damping)
    its = []
    for i in range(1, iters + 1):
        p = i - 1
        its.append(f""",
    c{i} AS (
      SELECT e.dst AS node, sum(r.rank / o.odeg) AS c
      FROM r{p} r
      JOIN edges e ON r.node = e.src
      JOIN outdeg o ON o.src = e.src
      GROUP BY e.dst
    ),
    dm{i} AS (
      SELECT coalesce(sum(r.rank), 0) AS dm
      FROM r{p} r LEFT JOIN outdeg o ON r.node = o.src
      WHERE o.src IS NULL
    ),
    r{i} AS (
      SELECT d.doc_id AS node,
             {teleport} / (SELECT n FROM nn)
             + {damping!r} * (coalesce(c.c, 0)
                              + (SELECT dm FROM dm{i}) / (SELECT n FROM nn))
               AS rank
      FROM documents d LEFT JOIN c{i} c ON d.doc_id = c.node
    )"""
        )
    tail = f"""
    SELECT node AS doc_id, round(rank, 8) AS rank8
    FROM r{iters}
    ORDER BY rank8 DESC, doc_id
    LIMIT {topk}
    """
    return head + "".join(its) + tail


@query("near_dup_pagerank", oracle=_pagerank_oracle(6, 0.85, 20))
def near_dup_pagerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 (late r7): PageRank centrality over the document
    near-duplicate graph (operators/graph.py) — rank documents by how
    central they are in the exact-Jaccard near-dup neighborhood (the
    canonical-representative selection signal; the host-rank pattern at
    doc granularity). Edges are the `ngram_jaccard_pairs` pair set
    (threshold 0.2), symmetrized; nodes are ALL documents, so the many
    isolated docs exercise the dangling-mass redistribution every
    round. Six fixed power iterations — no convergence collect — which
    is what lets the DuckDB oracle replay the ENTIRE run as chained
    CTEs: a hash match pins the edge derivation, out-degrees, dangling
    mass, and all six rank updates, not just the final ordering. Output
    is the top-20 by rank rounded to 8 places (identical IEEE ops both
    sides — see `_pagerank_oracle`), ties broken by doc_id."""
    from mrt_data_integration_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, threshold=0.2, max_shingle_df=None
    ).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    pr = pagerank(edges, nodes, iterations=6, damping=0.85)
    return (
        pr.select(
            F.col("node").alias("doc_id"), F.round("rank", 8).alias("rank8")
        )
        .orderBy(F.col("rank8").desc(), "doc_id")
        .limit(20)
    )


# r8: BM25 ranked retrieval (operators/retrieval.py). The probe-query
# vocabulary is a fixed literal set over the corpus's synthetic
# vocabulary; every float input to the score is integer-derived except
# the idf log, rounded to 12 in BOTH engines before the product (the
# A-ES ULP-proofing pattern). k1=1.2, b=0.75 appear as the evaluated
# literals 2.2 / 0.25 / 0.75 so both engines see identical doubles.
_BM25_QUERIES = [
    ("q_join", ["hash", "join"]),
    ("q_scan", ["scan", "filter", "slow"]),
    ("q_stream", ["stream", "window", "batch"]),
    ("q_vector", ["vector", "data", "customer"]),
]
_BM25_Q_SQL = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)


@query(
    "bm25_doc_search",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {_BM25_Q_SQL}),
    toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, len({_TOKENS}) AS dl FROM documents),
    st AS (
      SELECT count(*) AS n_docs, avg(len({_TOKENS})) AS avgdl
      FROM documents
    ),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    sc AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               round(ln(1 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)), 12)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
             ), 6) AS score
      FROM q
      JOIN tf USING (term)
      JOIN dl USING (doc_id)
      JOIN dft USING (term)
      CROSS JOIN st
      GROUP BY 1, 2
    ),
    r AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS rank
      FROM sc
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score
    FROM r WHERE rank <= 5
    """,
)
def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (r8): BM25 top-5 per probe query over the whole documents
    table — postings pruned to the query vocabulary by broadcast
    semi-join BEFORE the (doc, term) shuffle, corpus stats as a 1-row
    broadcast, deterministic (rounded score desc, doc_id) ranking."""
    from mrt_data_integration_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id string, terms array<string>"
    )
    return bm25_topk(docs, queries_df, k=5)


@query(
    "fuzzy_title_pairs",
    oracle="""
    WITH p AS (
      SELECT doc_id, substring(text, 1, 24) AS s
      FROM documents WHERE text IS NOT NULL
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
    FROM p a JOIN p b ON a.doc_id < b.doc_id
    WHERE abs(length(a.s) - length(b.s)) <= 2
      AND levenshtein(a.s, b.s) <= 2
    """,
)
def fuzzy_title_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+ (r9, operators/fuzzy.py): approximate string-match join —
    all document-prefix pairs within Levenshtein distance 2, the
    entity-resolution primitive the set-similarity dedup family can't
    express (edit distance respects order and position). Candidates
    come from the lossless PassJoin segment index (k+1 even segments
    per string; a partner within distance k must contain one segment
    EXACTLY, ±k-shifted — pigeonhole), so the output is EXACTLY the
    brute-force pair set — which is what the oracle runs (levenshtein
    is integer-exact in both engines; no float proofing needed)."""
    from mrt_data_integration_spark.operators.fuzzy import (
        edit_distance_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 24).alias("s")
    )
    return edit_distance_pairs(docs, max_dist=2, id_col="doc_id", str_col="s")


@query(
    "bloom_decontamination",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS gram
      FROM t WHERE len(toks) >= 3
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    cont AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 97 <> 0
    )
    SELECT lang,
           count(*) AS n_corpus_docs,
           CAST(count(*) FILTER (doc_id IN (SELECT doc_id FROM cont))
                AS BIGINT) AS n_contaminated,
           round(CAST(count(*) FILTER (doc_id IN (SELECT doc_id FROM cont))
                 AS DOUBLE) / count(*), 4) AS contaminated_frac
    FROM t WHERE doc_id % 97 <> 0
    GROUP BY lang
    """,
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8+ (r9, operators/decontaminate.decontaminate_bloom): the
    benchmark-too-big-to-broadcast decontamination path — a Bloom
    filter over the benchmark gram hashes (built distributedly, only
    n_bits/64 words reach the driver) gates corpus grams map-side, and
    only the survivors enter the exact semi-join verify. The output is
    EXACT (false positives die in the verify), so the oracle is the
    IDENTICAL SQL as `benchmark_decontamination` — a hash match proves
    bloom-gated == exact == SQL."""
    from mrt_data_integration_spark.operators.decontaminate import (
        decontaminate_bloom,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = decontaminate_bloom(corpus, bench, ngram_n=3)
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_corpus_docs"),
        F.count(F.when(F.col("contaminated"), 1)).alias("n_contaminated"),
        F.round(
            F.count(F.when(F.col("contaminated"), 1)).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("contaminated_frac"),
    )


@query(
    "dedup_spans_rewrite",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    ),
    seg AS (
      SELECT doc_id, t,
             list_filter(
               range(2, len(t) + 1),
               i -> CAST(('0x' || substr(md5(t[i]), 1, 4)) AS INTEGER)
                    % 8 = 0
             ) AS anchors
      FROM d
    ),
    kept_anchors AS (
      SELECT doc_id, t,
             list_filter(
               anchors,
               (x, i) -> x - (CASE WHEN i = 1 THEN 1
                                   ELSE anchors[i - 1] END) >= 4
             ) AS ka
      FROM seg
    ),
    bounds AS (
      SELECT doc_id, t,
             list_concat(list_concat([1], ka), [len(t) + 1]) AS b
      FROM kept_anchors
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(b)),
               i -> {'ord': i,
                     'c': array_to_string(t[b[i]:b[i + 1] - 1], ' '),
                     'nt': b[i + 1] - b[i]}
             )) AS u
      FROM bounds
    ),
    ranked AS (
      SELECT doc_id, u.ord AS ord, u.c AS c, u.nt AS nt,
             row_number() OVER (
               PARTITION BY md5(u.c) ORDER BY doc_id, u.ord
             ) AS rk
      FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           count(*) FILTER (rk = 1 OR nt < 4) AS n_kept,
           CAST(length(coalesce(
             string_agg(c, ' ' ORDER BY ord)
               FILTER (rk = 1 OR nt < 4), ''
           )) AS BIGINT) AS clean_len,
           md5(coalesce(
             string_agg(c, ' ' ORDER BY ord)
               FILTER (rk = 1 OR nt < 4), ''
           )) AS clean_md5
    FROM ranked
    GROUP BY doc_id
    """,
)
def dedup_spans_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+++ (r9, operators/dedup.remove_duplicate_spans): the REMOVAL
    half of substring dedup — every document rewritten with its
    duplicated spans dropped (token-anchored content-defined chunks,
    global first-occurrence keep, position-ordered space-joined
    reassembly; sub-min_tokens tails always kept). The oracle replays
    the whole computation — token split, md5-bucket anchors, CDC
    min-gap rule, boundary partition, ranked first-occurrence, ordered
    re-concat — and compares the rewritten text by md5, so a hash
    match pins every byte of every rewritten document."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = remove_duplicate_spans(docs)
    return out.select(
        "doc_id",
        "n_chunks",
        "n_kept",
        F.length("clean_text").cast("long").alias("clean_len"),
        F.md5("clean_text").alias("clean_md5"),
    )


@query(
    "boilerplate_span_removal",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    ),
    seg AS (
      SELECT doc_id, t,
             list_filter(
               range(2, len(t) + 1),
               i -> CAST(('0x' || substr(md5(t[i]), 1, 4)) AS INTEGER)
                    % 8 = 0
             ) AS anchors
      FROM d
    ),
    kept_anchors AS (
      SELECT doc_id, t,
             list_filter(
               anchors,
               (x, i) -> x - (CASE WHEN i = 1 THEN 1
                                   ELSE anchors[i - 1] END) >= 4
             ) AS ka
      FROM seg
    ),
    bounds AS (
      SELECT doc_id, t,
             list_concat(list_concat([1], ka), [len(t) + 1]) AS b
      FROM kept_anchors
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(b)),
               i -> {'ord': i,
                     'c': array_to_string(t[b[i]:b[i + 1] - 1], ' '),
                     'nt': b[i + 1] - b[i]}
             )) AS u
      FROM bounds
    ),
    freq AS (
      SELECT md5(u.c) AS h
      FROM chunks
      WHERE u.nt >= 4
      GROUP BY 1
      HAVING count(DISTINCT doc_id) >= 2
    ),
    flagged AS (
      SELECT c.doc_id, c.u.ord AS ord, c.u.c AS c,
             (c.u.nt < 4 OR f.h IS NULL) AS keep
      FROM chunks c LEFT JOIN freq f ON md5(c.u.c) = f.h
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           count(*) FILTER (keep) AS n_kept,
           CAST(length(coalesce(
             string_agg(c, ' ' ORDER BY ord) FILTER (keep), ''
           )) AS BIGINT) AS clean_len,
           md5(coalesce(
             string_agg(c, ' ' ORDER BY ord) FILTER (keep), ''
           )) AS clean_md5
    FROM flagged
    GROUP BY doc_id
    """,
)
def boilerplate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10+ (r11, operators/dedup.remove_boilerplate_spans): the
    C4/RefinedWeb boilerplate filter — every document rewritten with
    its CORPUS-FREQUENT spans removed (content-defined chunks found in
    >= 2 distinct documents drop from EVERY host, the complement of
    dedup_spans_rewrite's keep-first rule; sub-min_tokens tails always
    kept). Same segmentation primitive as the dedup half, so the
    oracle reuses its chunk-replay CTEs verbatim and swaps the ranked
    first-occurrence criterion for a distinct-doc frequency HAVING;
    the md5 comparison pins every byte of every rewritten document."""
    from mrt_data_integration_spark.operators.dedup import (
        remove_boilerplate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = remove_boilerplate_spans(docs, min_docs=2)
    return out.select(
        "doc_id",
        "n_chunks",
        "n_kept",
        F.length("clean_text").cast("long").alias("clean_len"),
        F.md5("clean_text").alias("clean_md5"),
    )


@query(
    "pmi_collocations",
    oracle=f"""
    WITH base AS (
      SELECT {_TOKENS} AS ts FROM documents WHERE text IS NOT NULL
    ),
    js AS (SELECT unnest(generate_series(1, 2)) AS j),
    pairs AS (
      SELECT unnest([{{'w1': ts[i], 'w2': ts[i+j]}}
                     for i in generate_series(1, len(ts)-j)]) AS p
      FROM base, js
    ),
    pc AS (
      SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS n_pair
      FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    uc AS (
      SELECT w, count(*) AS n_w
      FROM (SELECT unnest(ts) AS w FROM base) GROUP BY 1
    ),
    np AS (
      SELECT sum(greatest(len(ts) - 1, 0))
           + sum(greatest(len(ts) - 2, 0)) AS np FROM base
    ),
    nw AS (SELECT sum(n_w) AS nw FROM uc)
    SELECT w1, w2, n_pair,
           u1.n_w AS n_w1, u2.n_w AS n_w2,
           round((round(ln(n_pair), 12) - round(ln(np), 12))
               - (round(ln(u1.n_w), 12) - round(ln(nw), 12))
               - (round(ln(u2.n_w), 12) - round(ln(nw), 12)), 6) AS pmi
    FROM pc
    JOIN uc u1 ON pc.w1 = u1.w
    JOIN uc u2 ON pc.w2 = u2.w, np, nw
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 (r11, operators/collocations.py): PMI collocation extraction
    (Church & Hanks 1990) — the top 20 ordered word pairs co-occurring
    within 2 tokens, ranked by pointwise mutual information with a
    min_count=5 Zipf floor. The engine's term-TERM corpus statistic
    (TF-IDF/BM25 are doc-term): phrase detection, tokenizer-merge
    candidates. Pair generation is a map-side array expression (no
    self-join); counts are partial-agg; the floor prunes the pair tail
    BEFORE the unigram joins; ranking is a global TakeOrdered(20).
    The oracle replays pairs → counts → floor → logs end-to-end."""
    from mrt_data_integration_spark.operators.collocations import (
        pmi_collocations as pmi_op,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = pmi_op(docs, window=2, min_count=5)
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(20)


@query(
    "weighted_minhash_signatures",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df_ AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (round(ln((1.0 + n.n_docs) / (1.0 + df_.df)), 12)
                            + 1.0), 6) AS w
      FROM tf JOIN df_ ON tf.term = df_.term CROSS JOIN n
    ),
    keyed AS (
      SELECT doc_id, term, seed,
             round(pow(CAST(concat('0x', substr(
                         md5('wmh' || seed || ':' || term), 1, 8))
                       AS BIGINT) / 4294967296.0, 1.0 / w), 12) AS k
      FROM w, (SELECT unnest(generate_series(0, 7)) AS seed)
      WHERE w > 0
    )
    SELECT doc_id, seed, winner
    FROM (
      SELECT doc_id, seed, term AS winner,
             row_number() OVER (
               PARTITION BY doc_id, seed ORDER BY k DESC, term
             ) AS rn
      FROM keyed
    )
    WHERE rn = 1
    """,
)
def weighted_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (r11, operators/wminhash.py): weighted MinHash — tf-idf
    ORDER-SAMPLING signatures (Efraimidis-Spirakis keys with term-keyed
    shared uniforms; agreement probability = the Moulton-Jiang 2018
    probability-Jaccard), the importance-weighted member of the
    signature family (plain MinHash/SimHash treat docs as unweighted
    sets). Weight = tf · (smoothed idf + 1), rounded to 6 so 1/w is
    cross-engine identical; keys are round(pow(u, 1/w), 12) with term
    tie-breaks — the A-ES float-proofing verbatim. One max_by
    aggregate per (doc, seed); the oracle replays tf → df → idf →
    weights → keys → winners end-to-end."""
    from mrt_data_integration_spark.operators.wminhash import (
        weighted_minhash_signatures as wmh_op,
    )

    docs = load_table(spark, sf_dir, "documents")
    # n_docs in-plan (1-row crossJoin broadcast — the DSIR/BM25
    # pattern) and NO hard hint on the full-vocabulary df join: the
    # distinct-term table grows with the corpus, so AQE decides (it
    # broadcasts at bench scale; shuffle join beyond the threshold) —
    # the r11 verdict's broadcast-gating item, clearing the query
    # layer's `weak` mark.
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs__"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df rides a count window over term — tf is (doc, term)-distinct
    # by construction, so the count IS countDistinct(doc_id), and the
    # window replaces the join form's SECOND tokenize scan (the df
    # branch re-ran scan→explode→aggregate because column pruning made
    # its subtree non-reusable) plus the join itself (opt r14, guide
    # §2.4; plan: 2 `Scan parquet documents` → 1 — the
    # tfidf_top_terms/idf_shingle_weights window precedent)
    from pyspark.sql import Window as W

    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("term"))
    )
    idf = F.round(
        F.log((1.0 + F.col("__n_docs__")) / (1.0 + F.col("df"))), 12
    ) + F.lit(1.0)
    w = tf.crossJoin(F.broadcast(n)).select(  # 1 row: map-side constant
        "doc_id",
        "term",
        F.round(F.col("tf") * idf, 6).alias("w"),
    )
    return wmh_op(w, n_hashes=8)


@query(
    "lm_perplexity_filter",
    # Full replay: tokenize with ordinality, train the hashed bigram
    # model on the even-doc_id half (md5 buckets — dsir._bucket's
    # arithmetic, bit-identical in DuckDB), score every doc's bigram
    # stream under stupid backoff, collapse to the doc grain.
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
      FROM documents
    ),
    train_tok AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
    uni AS (
      SELECT CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT)
               % 65536 AS b,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM train_tok GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_tokens FROM train_tok),
    pairs AS (
      SELECT doc_id,
             (string_split_regex(text, '\s+'))[g.i] AS w1,
             (string_split_regex(text, '\s+'))[g.i + 1] AS w2
      FROM documents,
           unnest(generate_series(
             1, greatest(len(string_split_regex(text, '\s+')) - 1, 0)
           )) AS g(i)
    ),
    bi AS (
      SELECT CAST(concat('0x', substr(md5(w1 || ' ' || w2), 1, 8))
                  AS BIGINT) % 65536 AS b,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM pairs WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    scored AS (
      SELECT p.doc_id,
             CASE WHEN bi.cnt IS NOT NULL AND cu.cnt IS NOT NULL
                  THEN bi.cnt / cu.cnt
                  ELSE 0.4 * (COALESCE(uw.cnt, 0) + 1.0)
                       / (n.n_tokens + 65536.0)
             END AS s
      FROM pairs p
      CROSS JOIN n
      LEFT JOIN bi
        ON bi.b = CAST(concat('0x',
             substr(md5(p.w1 || ' ' || p.w2), 1, 8)) AS BIGINT) % 65536
      LEFT JOIN uni cu
        ON cu.b = CAST(concat('0x', substr(md5(p.w1), 1, 8)) AS BIGINT)
                  % 65536
      LEFT JOIN uni uw
        ON uw.b = CAST(concat('0x', substr(md5(p.w2), 1, 8)) AS BIGINT)
                  % 65536
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(sum(ln(s)) / count(*), 6) AS avg_logprob,
           (round(sum(ln(s)) / count(*), 6) >= -3.4) AS kept
    FROM scored
    GROUP BY doc_id
    """,
)
def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (r12, operators/ngram_lm.py): CCNet-style perplexity
    filtering (Wenzek et al. 2020) — a hashed bigram LM with stupid
    backoff (Brants et al. 2007) trained on the even-doc_id reference
    half, scoring EVERY document's bigram stream; kept = the
    low-perplexity tail (avg_logprob >= -3.4, the sf-scale median).
    The model is md5-bucket count tables (fixed width 65536 — DSIR's
    hashing trick), so the scoring joins broadcast a BOUNDED frame at
    any corpus size; training is two explode → hash-agg passes with
    the token total kept in-plan. The oracle replays tokenize → train
    → backoff → collapse end-to-end."""
    from mrt_data_integration_spark.operators.ngram_lm import (
        perplexity_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    return perplexity_filter(
        docs,
        docs.filter(F.col("doc_id") % 2 == 0),
        min_avg_logprob=-3.4,
    )


@query(
    "winnowing_profile",
    # Full replay: k=3 word grams -> 32-bit md5-prefix hashes combined
    # with their gram offset (h * 2^31 + pos, so numeric min == the
    # (h, pos)-lexicographic argmin), w=4 window minima, distinct
    # selections, per-doc profile. Short docs (1-3 grams) contribute
    # their single whole-doc minimum; gram-less docs profile with 0.
    oracle=r"""
    WITH g AS (
      SELECT doc_id,
             list_transform(
               generate_series(
                 1, greatest(len(string_split_regex(text, '\s+')) - 2, 0)
               ),
               i -> CAST(concat('0x', substr(md5(array_to_string(
                      (string_split_regex(text, '\s+'))[i:i+2], ' '
                    )), 1, 8)) AS BIGINT) * 2147483648 + (i - 1)
             ) AS hs
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(hs) AS n_grams,
             CASE WHEN len(hs) >= 4 THEN
               list_distinct(list_transform(
                 generate_series(1, len(hs) - 3),
                 j -> list_min(hs[j:j+3])
               ))
             WHEN len(hs) >= 1 THEN [list_min(hs)]
             ELSE CAST([] AS BIGINT[]) END AS sel
      FROM g
    )
    SELECT doc_id,
           CAST(n_grams AS INTEGER) AS n_grams,
           CAST(len(sel) AS INTEGER) AS n_fps,
           CASE WHEN n_grams >= 4
                THEN round(len(sel) / CAST(n_grams - 3 AS DOUBLE), 6)
                WHEN n_grams >= 1 THEN 1.0
           END AS density,
           list_min(sel) // 2147483648 AS min_fp,
           list_max(sel) // 2147483648 AS max_fp
    FROM s
    """,
)
def winnowing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3++ (r12, operators/winnow.py): winnowing fingerprint profile
    (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm):
    k=3-gram md5 hashes, w=4 window minima with the leftmost tie rule,
    distinct selections; per-doc (n_grams, n_fps, density, min/max
    fingerprint). Density tracks the paper's 2/(w+1) expectation — a
    corpus-health signal. A PURE MAP: one scan, zero shuffles (the
    selection guarantee — any shared >= w+k-1-token run surfaces a
    shared fingerprint — and the postings pair join live in
    operators/winnow.py with the hot-fingerprint cap; the pair join's
    band->equi-join->count physical shape is `lsh_candidate_pairs`'
    verbatim on the fingerprint key, CI-pinned by the guarantee fuzz
    test)."""
    from mrt_data_integration_spark.operators.winnow import (
        winnow_profile,
    )

    return winnow_profile(
        load_table(spark, sf_dir, "documents"), k=3, w=4
    )


@query(
    "phrase_search_occurrences",
    # Full replay: positional tokens via generate_series indexing, the
    # unrolled (phrase, slot, term) frame as VALUES, slot-aligned
    # candidate starts, the all-slots-voted bar, per-doc counts.
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             (string_split_regex(text, '\s+'))[g.i] AS term,
             g.i - 1 AS pos
      FROM documents,
           unnest(generate_series(
             1, len(string_split_regex(text, '\s+'))
           )) AS g(i)
    ),
    ph(phrase_id, phrase, slot, term, n_slots) AS (VALUES
      (0, 'table hash', 0, 'table', 2),
      (0, 'table hash', 1, 'hash', 2),
      (1, 'customer join', 0, 'customer', 2),
      (1, 'customer join', 1, 'join', 2),
      (2, 'slow hash batch', 0, 'slow', 3),
      (2, 'slow hash batch', 1, 'hash', 3),
      (2, 'slow hash batch', 2, 'batch', 3),
      (3, 'a a', 0, 'a', 2),
      (3, 'a a', 1, 'a', 2)
    ),
    starts AS (
      SELECT p.phrase_id, p.phrase, t.doc_id, t.pos - p.slot AS s
      FROM tok t JOIN ph p ON t.term = p.term
      GROUP BY 1, 2, 3, 4
      HAVING count(DISTINCT p.slot) = max(p.n_slots)
    )
    SELECT CAST(phrase_id AS INTEGER) AS phrase_id, phrase, doc_id,
           count(*) AS n_occurrences
    FROM starts
    GROUP BY 1, 2, 3
    """,
)
def phrase_search_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5++ (r12, operators/retrieval.py): exact PHRASE search over
    positional postings — the retrieval primitive BM25's bag-of-words
    scoring cannot express. Four probe phrases (two bigrams, a
    trigram, and the repeated-term 'a a' that exercises the
    distinct-slot bar and overlapping starts) counted per document.
    The phrase frame joins broadcast (the BM25 vocab-prune class: the
    term join IS the vocabulary prune), candidate starts vote at
    pos - slot, a start wins when all slots voted; two partial-agg
    shuffles, text never moves. The oracle replays positions → slot
    votes → all-slots bar → counts end-to-end."""
    from mrt_data_integration_spark.operators.retrieval import (
        phrase_search,
    )

    return phrase_search(
        load_table(spark, sf_dir, "documents"),
        ["table hash", "customer join", "slow hash batch", "a a"],
    )


@query(
    "winnowing_decontamination",
    # Replays the winnowing selection for BOTH frame halves (the
    # winnowing_profile CTEs verbatim), reduces each side to DISTINCT
    # (doc, fingerprint) pairs, and intersects on the fingerprint.
    oracle=r"""
    WITH g AS (
      SELECT doc_id,
             list_transform(
               generate_series(
                 1, greatest(len(string_split_regex(text, '\s+')) - 2, 0)
               ),
               i -> CAST(concat('0x', substr(md5(array_to_string(
                      (string_split_regex(text, '\s+'))[i:i+2], ' '
                    )), 1, 8)) AS BIGINT) * 2147483648 + (i - 1)
             ) AS hs
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4 THEN
               list_distinct(list_transform(
                 generate_series(1, len(hs) - 3),
                 j -> list_min(hs[j:j+3])
               ))
             WHEN len(hs) >= 1 THEN [list_min(hs)]
             ELSE CAST([] AS BIGINT[]) END AS sel
      FROM g
    ),
    fp AS (
      SELECT DISTINCT doc_id, f // 2147483648 AS fp
      FROM (SELECT doc_id, unnest(sel) AS f FROM s)
    )
    SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
    FROM fp c JOIN fp b ON c.fp = b.fp
    WHERE c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
    GROUP BY 1, 2
    """,
)
def winnowing_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9+++ (mid-r12, operators/winnow.py winnow_contamination):
    substring-level decontamination through the winnowing index — the
    >=L-token-run contamination rule (Lee et al. / LLaMA-class) with
    the selection guarantee: any corpus doc sharing a run of >=
    w+k-1 = 6 tokens with a benchmark doc (doc_id %% 20 == 0) is
    GUARANTEED to surface, while the index holds only ~2/(w+1) of the
    gram stream (the scale story vs the dense-gram exact path, which
    indexes EVERY gram for the same promise). Both sides reduce to
    DISTINCT (doc, fp) longs before the join; the benchmark side
    broadcasts (eval-set-small, escape hatch documented). A shared
    fingerprint is an exact shared k-gram (md5-prefix equality)."""
    from mrt_data_integration_spark.operators.winnow import (
        winnow_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    return winnow_contamination(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        k=3,
        w=4,
        min_shared=1,
    )


@query(
    "token_diversity_stats",
    # Full replay: the float sum (Σ c·ln c) is order-pinned on BOTH
    # engines — Spark folds sequentially over the sorted token array,
    # the oracle list_reduce's the counts in token order — so the one
    # transcendental accumulation is bit-identical by construction,
    # not by luck (a GROUP BY sum would be shuffle-fetch-order
    # nondeterministic on the Spark side). Integer aggregates replay
    # as plain SQL; all ratios rounded to 6.
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
      FROM documents WHERE text IS NOT NULL
    ),
    cnt AS (
      SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT)   AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(max(c) AS BIGINT)   AS max_c,
             CAST(sum(c * c) AS BIGINT) AS sum_c2,
             coalesce(list_reduce(
               list_transform(
                 list(CAST(c AS DOUBLE) ORDER BY t), x -> x * ln(x)
               ),
               (a, b) -> a + b
             ), 0.0) AS slnc
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(max_c AS DOUBLE) / n_tokens, 6)   AS top_frac,
           round(ln(CAST(n_tokens AS DOUBLE))
                 - slnc / n_tokens, 6)                  AS entropy,
           round(1.0 - CAST(sum_c2 AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * n_tokens), 6) AS simpson
    FROM agg
    """,
)
def token_diversity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (r13, operators/diversity.token_diversity_profile): per-doc
    token-diversity profile — type-token ratio, top-token share,
    unigram Shannon entropy (nats) and Gini–Simpson diversity, the
    collapsed-distribution quality signals that complement the n-gram
    repetition filter's repeated-span view (keyword stuffing and
    generation loops score low here even when no span repeats). Scale
    shape: a PURE MAP, zero shuffles (the winnow_profile class) — each
    document run-length-encodes its SORTED token array in one
    sequential `aggregate` fold, so the single float accumulation
    (Σ c·ln c) has a fixed engine-replayable order; every other
    aggregate is integer. The oracle replays counts → ordered ln-fold
    → the four ratios end-to-end."""
    from mrt_data_integration_spark.operators.diversity import (
        token_diversity_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    return token_diversity_profile(docs)


@query(
    "containment_dedup_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, substr(md5(unnest({_SHINGLES})), 1, 16) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_inter,
           CAST(sa.n_sh AS BIGINT) AS n_a,
           CAST(sb.n_sh AS BIGINT) AS n_b,
           round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 4)
             AS overlap,
           round(CAST(n_inter AS DOUBLE) / sa.n_sh, 4) AS containment_a,
           round(CAST(n_inter AS DOUBLE) / sb.n_sh, 4) AS containment_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.2
    """,
)
def containment_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3++ (r13, operators/dedup.containment_pairs): exact n-gram
    CONTAINMENT pairs — the asymmetric metric symmetric Jaccard is
    blind to (a quote fully embedded in a long article has Jaccard
    ≈ 0.01 but overlap coefficient 1.0): shingle-keyed self-join,
    per-pair intersection counts, Szymkiewicz–Simpson overlap
    |A∩B|/min(|A|,|B|) thresholded at 0.2 with both directional
    containments riding along (which side is the fragment).
    ``max_shingle_df=None`` explicitly: the SQL oracle computes
    UNCAPPED containment, so the query must too — the operator's
    boilerplate-shingle cap (default 500, THE fan-out control since
    containment admits no size-ratio join prune) belongs to
    production corpora, not this check."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.containment_pairs(
        docs, threshold=0.2, max_shingle_df=None
    )


@query(
    "zipf_lexical_profile",
    # Full replay: token counts, the deterministic (freq DESC, token)
    # top-1000 ranking, the four regression sums folded in RANK order
    # on both engines (Spark: one sequential pass over the rank-sorted
    # struct array; DuckDB: ordered list_reduce per sum — identical
    # per-accumulator op sequences, so the slope's float arithmetic is
    # bit-pinned), the corpus totals, the top-20 emission.
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(text, '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL
    ),
    cnt AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
    stats AS (
      SELECT CAST(sum(freq) AS BIGINT)  AS n_tokens,
             CAST(count(*) AS BIGINT)   AS n_types,
             round(CAST(count(*) FILTER (WHERE freq = 1) AS DOUBLE)
                   / count(*), 6)       AS hapax_frac
      FROM cnt
    ),
    top AS (
      SELECT token, freq,
             CAST(row_number() OVER (ORDER BY freq DESC, token)
                  AS BIGINT) AS rank
      FROM cnt ORDER BY freq DESC, token LIMIT 1000
    ),
    fit AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             list_reduce(list(ln(CAST(rank AS DOUBLE))
               ORDER BY rank), (a, b) -> a + b) AS sx,
             list_reduce(list(ln(CAST(freq AS DOUBLE))
               ORDER BY rank), (a, b) -> a + b) AS sy,
             list_reduce(list(ln(CAST(rank AS DOUBLE))
               * ln(CAST(freq AS DOUBLE))
               ORDER BY rank), (a, b) -> a + b) AS sxy,
             list_reduce(list(ln(CAST(rank AS DOUBLE))
               * ln(CAST(rank AS DOUBLE))
               ORDER BY rank), (a, b) -> a + b) AS sxx
      FROM top
    )
    SELECT rank, token, CAST(freq AS BIGINT) AS freq,
           n_tokens, n_types, hapax_frac,
           CASE WHEN fit.n >= 2 THEN round(
             (fit.n * sxy - sx * sy) / (fit.n * sxx - sx * sx), 6
           ) END AS zipf_slope
    FROM top, stats, fit
    WHERE rank <= 20
    """,
)
def zipf_lexical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (r13, operators/lexstats.zipf_profile): corpus rank-
    frequency diagnostics — the top-20 tokens with the Zipf log-log
    slope fit over the top 1000 ranks (natural text ≈ −1; this
    synthetic corpus reads ≈ −0.18, correctly flagging templated
    text), hapax fraction and vocabulary totals: the corpus-grain
    lexical-health check per release (per-document diversity is
    `token_diversity_stats`; the two disagree exactly when healthy
    documents are near-copies of each other). Scale shape: one
    token-grain shuffle, the global top-1000 via two-phase
    bounded_topk (never a vocabulary-wide single-reducer window), the
    regression sums folded sequentially in rank order (order-pinned
    floats), totals on 1-row broadcasts. The oracle replays counts →
    ranking → ordered folds → slope end-to-end."""
    from mrt_data_integration_spark.operators.lexstats import (
        zipf_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    return zipf_profile(docs, fit_n=1000, emit_n=20)


@query(
    "heaps_vocab_growth",
    # Full replay: per-doc token counts, token-grain first-occurrence
    # min(doc_id), the integer-exact checkpoint bounds from the id
    # domain, the bounded fan-out cumulation joins, and the log-log
    # OLS fit folded in CHECKPOINT order on both engines (Spark: one
    # sequential pass over the checkpoint-sorted struct array; DuckDB:
    # ordered list_reduce per sum — identical per-accumulator op
    # sequences, the zipf_lexical_profile discipline).
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TOKENS} AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    doc_tok AS (SELECT doc_id, len(toks) AS n_tok FROM d),
    bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM doc_tok),
    cps AS (
      SELECT DISTINCT CAST(lo + floor(((hi - lo) * i + 15) / 16.0) AS BIGINT)
        AS checkpoint
      FROM bounds, generate_series(1, 16) t(i)
    ),
    first_doc AS (
      SELECT token, min(doc_id) AS fd
      FROM (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM d)
      GROUP BY token
    ),
    nc AS (
      SELECT checkpoint, CAST(count(*) AS BIGINT) AS n_docs_cum,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens_cum
      FROM cps JOIN doc_tok ON doc_id <= checkpoint GROUP BY checkpoint
    ),
    vc AS (
      SELECT checkpoint, CAST(count(*) AS BIGINT) AS vocab_cum
      FROM cps JOIN first_doc ON fd <= checkpoint GROUP BY checkpoint
    ),
    pts AS (
      SELECT checkpoint, n_docs_cum, n_tokens_cum, vocab_cum
      FROM nc JOIN vc USING (checkpoint)
    ),
    fit AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
        list_reduce(list(ln(CAST(n_tokens_cum AS DOUBLE))
          ORDER BY checkpoint), (a, b) -> a + b) AS sx,
        list_reduce(list(ln(CAST(vocab_cum AS DOUBLE))
          ORDER BY checkpoint), (a, b) -> a + b) AS sy,
        list_reduce(list(ln(CAST(n_tokens_cum AS DOUBLE))
          * ln(CAST(vocab_cum AS DOUBLE))
          ORDER BY checkpoint), (a, b) -> a + b) AS sxy,
        list_reduce(list(ln(CAST(n_tokens_cum AS DOUBLE))
          * ln(CAST(n_tokens_cum AS DOUBLE))
          ORDER BY checkpoint), (a, b) -> a + b) AS sxx
      FROM pts
    )
    SELECT checkpoint, n_docs_cum, n_tokens_cum, vocab_cum,
      CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> 0 THEN
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
      END AS heaps_beta,
      CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> 0 THEN
        round(exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
          / n), 6)
      END AS heaps_k
    FROM pts, fit
    """,
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (r14, operators/lexstats.heaps_growth): Heaps'-law
    vocabulary-growth curve — cumulative (docs, tokens, vocabulary) at
    16 id-spaced checkpoints with the V ≈ K·N^β log-log fit as
    constant columns: the corpus-duplication diagnostic that
    complements the Zipf slope (a release whose β drops is repeating
    itself; this synthetic fixed-vocab corpus reads β ≈ 0 — saturated
    at the first checkpoint — correctly flagging template text).
    Scale shape: NO global cumulative window or sort — cumulation is
    re-expressed as ≤ 16-way bounded map-side fan-out against the
    broadcast checkpoint bounds (doc grain for token totals; ONE
    token-grain shuffle, zipf's grain, for first occurrences), integer
    collapses, then the fit folded sequentially in checkpoint order
    (order-pinned floats) riding 1-row broadcasts."""
    from mrt_data_integration_spark.operators.lexstats import (
        heaps_growth,
    )

    docs = load_table(spark, sf_dir, "documents")
    return heaps_growth(docs, n_checkpoints=16)


@query(
    "source_overlap_audit",
    # Full replay: the (source, shingle) DISTINCT grain, the pair
    # counts, both sizes, and all four ratio columns. The oracle's
    # pair self-join and the operator's per-shingle source-set
    # expansion are the same arithmetic at different physical shapes
    # (the array form never shuffles pairs wider than |S|²).
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT source, substr(md5(unnest({_SHINGLES})), 1, 16)
        AS shingle
      FROM documents WHERE text IS NOT NULL
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared, sa.n AS n_a, sb.n AS n_b,
      round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 4)
        AS jaccard,
      round(CAST(n_shared AS DOUBLE) / least(sa.n, sb.n), 4) AS overlap,
      round(CAST(n_shared AS DOUBLE) / sa.n, 4) AS containment_a,
      round(CAST(n_shared AS DOUBLE) / sb.n, 4) AS containment_b
    FROM pairs JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)
def source_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+ (r14, operators/dedup.source_overlap_matrix): corpus-grain
    duplication audit — every source pair's distinct-shingle overlap
    (jaccard / Szymkiewicz–Simpson / both containments), the matrix a
    mixture plan consults before weighting sources and the
    corpus-level complement of the document-grain containment screen
    (two dumps of one crawl read jaccard ≈ 1; a subset source reads
    containment ≈ 1 with small jaccard). Scale shape: one
    (source, shingle) DISTINCT shuffle, ONE shingle-grain aggregate
    whose collected source sets are bounded by the SOURCE DOMAIN (a
    config-class constant), a ≤ |S|²/2 map-side pair expansion, and a
    pair-grain integer count — text never shuffles and no stage grows
    with the corpus, only with |S|² and the shingle domain.
    ``max_shingle_sources=None``: the oracle computes the uncapped
    matrix, so the query must too (the cap exists for pathological
    source domains and follows containment's capped-universe
    contract)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.source_overlap_matrix(docs)


@query(
    "robust_quality_outliers",
    # Full replay: the (lang, value) counts collapse, the exact
    # order-statistic median from running count sums, the MAD pass
    # over |x − med|, and the per-document robust-z flags. No float
    # accumulation crosses a shuffle on either engine (integer counts
    # + single float ops), so no order-pinning is needed.
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS x FROM documents
    ),
    ok AS (SELECT lang, x FROM d WHERE x IS NOT NULL AND lang IS NOT NULL),
    counts AS (SELECT lang, x, count(*) AS c FROM ok GROUP BY lang, x),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n
            FROM counts GROUP BY lang),
    cum AS (
      SELECT lang, x, sum(c) OVER (PARTITION BY lang ORDER BY x) AS cum
      FROM counts
    ),
    med AS (
      SELECT cum.lang,
        (min(CASE WHEN cum >= floor((n + 1) / 2.0) THEN x END)
       + min(CASE WHEN cum >= floor((n + 2) / 2.0) THEN x END)) / 2 AS med
      FROM cum JOIN tot USING (lang) GROUP BY cum.lang
    ),
    dcounts AS (
      SELECT counts.lang, abs(x - med) AS dv, CAST(sum(c) AS BIGINT) AS c
      FROM counts JOIN med USING (lang) GROUP BY counts.lang, abs(x - med)
    ),
    dtot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n
             FROM dcounts GROUP BY lang),
    dcum AS (
      SELECT lang, dv, sum(c) OVER (PARTITION BY lang ORDER BY dv) AS cum
      FROM dcounts
    ),
    mad AS (
      SELECT dcum.lang,
        (min(CASE WHEN cum >= floor((n + 1) / 2.0) THEN dv END)
       + min(CASE WHEN cum >= floor((n + 2) / 2.0) THEN dv END)) / 2 AS mad
      FROM dcum JOIN dtot USING (lang) GROUP BY dcum.lang
    )
    SELECT doc_id, d.lang, x AS n_chars,
      CASE WHEN x IS NOT NULL THEN med END AS med,
      CASE WHEN x IS NOT NULL THEN mad END AS mad,
      CASE WHEN x IS NOT NULL AND mad > 0
           THEN round((x - med) / (1.4826 * mad), 4) END AS robust_z,
      coalesce(abs(CASE WHEN x IS NOT NULL AND mad > 0
           THEN round((x - med) / (1.4826 * mad), 4) END) > 3.5, false)
        AS is_outlier
    FROM d LEFT JOIN med ON d.lang = med.lang
    LEFT JOIN mad ON d.lang = mad.lang
    """,
)
def robust_quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (r14, operators/robust.robust_outlier_flags): per-language
    robust z-score outlier flags over document length — exact grouped
    median/MAD (the Iglewicz–Hoaglin detector that survives the very
    outliers it hunts, unlike mean/stddev) with per-document robust z
    and the 3.5-sigma flag. Scale shape: the naive per-group exact
    percentile would shuffle every observation to ~5 hot language
    reducers; instead ONE (lang, value)-grain counts collapse (bounded
    by group × value DOMAIN — the KS-drift precedent), exact order
    statistics from running count sums over that bounded table, a
    second identical pass over |x − med| for MAD, and a map-side
    join-back of the ≤|langs|-row stats frame. Zero outliers on this
    synthetic corpus (uniform lengths) — the separation behavior is
    pinned with planted outliers in tests/test_robust.py."""
    from mrt_data_integration_spark.operators.robust import (
        robust_outlier_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    return robust_outlier_flags(docs, "n_chars", "lang")


@query(
    "ppmi_word_similarity",
    # Full replay: the windowed ordered pairs, the symmetrized
    # co-occurrence counts with the min_count floor, the PPMI cells
    # (ln's rounded 12, cells rounded 6, positive kept — marginals of
    # the PRUNED matrix, the consistent-universe convention), then
    # BOTH float reductions as ordered folds (Spark: sequential
    # aggregate over context-sorted struct arrays; DuckDB: ordered
    # list_reduce — identical per-accumulator op sequences) and the
    # single-op cosine.
    oracle=f"""
    WITH base AS (
      SELECT {_TOKENS} AS ts FROM documents WHERE text IS NOT NULL
    ),
    js AS (SELECT unnest(generate_series(1, 2)) AS j),
    op AS (
      SELECT unnest([{{'w1': ts[i], 'w2': ts[i+j]}}
                     for i in generate_series(1, len(ts)-j)]) AS p
      FROM base, js
    ),
    cooc AS (
      SELECT w, c, count(*) AS n_wc FROM (
        SELECT p.w1 AS w, p.w2 AS c FROM op
        UNION ALL
        SELECT p.w2 AS w, p.w1 AS c FROM op
      ) GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    marg AS (SELECT w, CAST(sum(n_wc) AS BIGINT) AS n_w
             FROM cooc GROUP BY w),
    tot AS (SELECT CAST(sum(n_wc) AS BIGINT) AS n_t FROM cooc),
    pv0 AS (
      SELECT cooc.w, cooc.c,
        round(round(ln(n_wc), 12) + round(ln(n_t), 12)
            - round(ln(m1.n_w), 12) - round(ln(m2.n_w), 12), 6) AS ppmi
      FROM cooc JOIN marg m1 ON cooc.w = m1.w
      JOIN marg m2 ON cooc.c = m2.w, tot
    ),
    pv AS (SELECT * FROM pv0 WHERE ppmi > 0),
    norms AS (
      SELECT w,
        list_reduce(list(ppmi * ppmi ORDER BY c), (a, b) -> a + b) AS n2
      FROM pv GROUP BY w
    ),
    dots AS (
      SELECT a.w AS w1, b.w AS w2,
        list_reduce(list(a.ppmi * b.ppmi ORDER BY a.c),
                    (x, y) -> x + y) AS dot,
        CAST(count(*) AS BIGINT) AS n_shared
      FROM pv a JOIN pv b ON a.c = b.c AND a.w < b.w
      GROUP BY 1, 2
    )
    SELECT w1, w2, n_shared,
      round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
    FROM dots JOIN norms na ON na.w = w1 JOIN norms nb ON nb.w = w2
    WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= 0.2
    """,
)
def ppmi_word_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5+ (r14, operators/collocations.ppmi_word_similarity):
    distributional word-word similarity — cosine between sparse PPMI
    context vectors (the count-based representation; Church & Hanks
    1990, Levy/Goldberg/Dagan 2015), computed as distributed sparse
    linear algebra: context-keyed equi-join = the inverted-index
    sparse matrix product, no dense matrix, no driver-side
    vocabulary. Scale shape: co-occurrence is the PMI family's
    map-side slide (bodies never shuffle), PPMI cells ride
    vocab-bounded joins + a 1-row total broadcast, and the fan-out
    controls (per-word top_contexts, max_context_df — the df-cap
    class) bound the context join; both float reductions fold
    SEQUENTIALLY over context-sorted arrays (order-pinned, the zipf
    discipline). Uncapped here: the oracle computes the exact full
    product, so the query must too."""
    from mrt_data_integration_spark.operators.collocations import (
        ppmi_word_similarity as ppmi_op,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ppmi_op(docs, window=2, min_count=5, threshold=0.2)


@query(
    "source_js_divergence",
    # Full replay: (source, token) counts, the global top-V ranking
    # (gn DESC, token — the zipf tie), OOV bucketing, probabilities,
    # the shared-support terms with ln's rounded 12, the three
    # bucket-ORDERED folds (Spark sequential aggregate == DuckDB
    # ordered list_reduce), and the disjoint-mass closed form over
    # the all-pairs frame.
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKENS}) AS token
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    cnt AS (SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2),
    gcnt AS (SELECT token, sum(n) AS gn FROM cnt GROUP BY token),
    top AS (
      SELECT token, true AS kept
      FROM gcnt ORDER BY gn DESC, token LIMIT 1000
    ),
    bucketed AS (
      SELECT source,
             CASE WHEN kept THEN token ELSE '__oov__' END AS bucket,
             CAST(sum(n) AS BIGINT) AS n
      FROM cnt LEFT JOIN top USING (token)
      GROUP BY 1, 2
    ),
    totals AS (SELECT source, CAST(sum(n) AS BIGINT) AS t
               FROM bucketed GROUP BY source),
    p AS (
      SELECT source, bucket, CAST(n AS DOUBLE) / t AS p
      FROM bucketed JOIN totals USING (source)
    ),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b, a.bucket,
             0.5 * (a.p * round(ln(2 * a.p / (a.p + b.p)), 12)
                  + b.p * round(ln(2 * b.p / (a.p + b.p)), 12)) AS term,
             a.p AS pa, b.p AS pb
      FROM p a JOIN p b ON a.bucket = b.bucket AND a.source < b.source
    ),
    stats AS (
      SELECT source_a, source_b,
             list_reduce(list(term ORDER BY bucket), (x, y) -> x + y)
               AS st,
             list_reduce(list(pa ORDER BY bucket), (x, y) -> x + y)
               AS sa,
             list_reduce(list(pb ORDER BY bucket), (x, y) -> x + y)
               AS sb,
             CAST(count(*) AS BIGINT) AS n_common
      FROM shared GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM totals a JOIN totals b ON a.source < b.source
    )
    SELECT source_a, source_b,
           coalesce(n_common, 0) AS n_common,
           round(coalesce(st, 0.0)
                 + 0.5 * (1 - coalesce(sa, 0.0)) * round(ln(2), 12)
                 + 0.5 * (1 - coalesce(sb, 0.0)) * round(ln(2), 12), 6)
             AS js
    FROM pairs LEFT JOIN stats USING (source_a, source_b)
    """,
)
def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11+ (r14, operators/drift.source_js_matrix): pairwise
    Jensen–Shannon divergence between every two sources' unigram
    distributions (Lin 1991) — the DISTRIBUTIONAL complement of the
    set-overlap audit (shared vocabulary at different rates reads
    similar there, drifted here) and the all-pairs form of the
    two-slice drift profiles. Vocabulary-capped at the global top-1000
    (not binding on this corpus) with the tail folded into a per-source
    __oov__ bucket — the cap is what bounds every per-pair structure
    at a config constant, and the bucketed JS lower-bounds the
    uncapped one (coarsening never increases an f-divergence). Scale
    shape: one (source, token) hash aggregate, the two-phase
    bounded_topk (never a vocabulary-wide window), a ≤|S|·(V+1)
    re-aggregate, a bucket-keyed pair join (≤|S|² fan-out per bucket),
    the three float sums folded SEQUENTIALLY over bucket-sorted ≤V+1
    arrays (order-pinned), and the disjoint-support mass in closed
    form — zero-overlap pairs still appear, at ln 2."""
    from mrt_data_integration_spark.operators.drift import (
        source_js_matrix,
    )

    docs = load_table(spark, sf_dir, "documents")
    return source_js_matrix(docs, top_v=1000)


@query(
    "idf_shingle_neighbors",
    # Full replay: md5-prefix shingle keys, the smoothed idf
    # ln((1+N)/(1+df)) rounded 12 (N in-plan, zero-weight rows pruned),
    # BOTH float reductions as VALUE-ORDERED folds (Spark: sequential
    # aggregate over sorted double arrays; DuckDB: ordered list_reduce
    # — the summand alone determines the fold order, so equal values
    # sum identically in any order at half the struct-fold payload),
    # cosine rounded 6 BEFORE the ranking window, and the
    # per-anchor row_number over (cosine DESC, neighbor_id) — the
    # total-order tie-break that makes the top-k frontier
    # engine-independent.
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, substr(md5(unnest({_SHINGLES})), 1, 16) AS s
      FROM documents WHERE text IS NOT NULL
    ),
    nd AS (
      SELECT CAST(count(*) AS DOUBLE) AS n
      FROM documents WHERE text IS NOT NULL
    ),
    dfq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
    w AS (
      SELECT doc_id, sh.s,
             round(ln((1 + nd.n) / (1 + dfq.df)), 12) AS w
      FROM sh JOIN dfq USING (s) CROSS JOIN nd
      WHERE round(ln((1 + nd.n) / (1 + dfq.df)), 12) <> 0
    ),
    norms AS (
      SELECT doc_id AS id,
             list_reduce(list(w * w ORDER BY w * w), (a, b) -> a + b) AS n2
      FROM w GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             list_reduce(list(a.w * b.w ORDER BY a.w * b.w),
                         (x, y) -> x + y) AS dot,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT d1 AS doc_id, d2 AS neighbor_id, dot, n_shared FROM dots
      UNION ALL
      SELECT d2 AS doc_id, d1 AS neighbor_id, dot, n_shared FROM dots
    ),
    cos AS (
      SELECT sym.doc_id, sym.neighbor_id, sym.n_shared,
             round(sym.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
      FROM sym
      JOIN norms na ON na.id = sym.doc_id
      JOIN norms nb ON nb.id = sym.neighbor_id
    )
    SELECT doc_id, neighbor_id, rank, n_shared, cosine
    FROM (
      SELECT doc_id, neighbor_id, n_shared, cosine,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY cosine DESC, neighbor_id
             ) AS rank
      FROM cos WHERE cosine >= 0.05
    )
    WHERE rank <= 3
    """,
)
def idf_shingle_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/E4+ (operators/docsim.idf_cosine_topk): per-document top-k
    nearest neighbors under idf-weighted shingle cosine — the WEIGHTED
    complement of `ngram_jaccard_pairs` (equal-weight sets) and
    `containment_dedup_pairs` (asymmetric sets): corpus-rare shingles
    dominate the score, boilerplate decays smoothly as ln((1+N)/(1+df))
    instead of being dropped at the hard df cap. Also restores a
    top-k-similarity driver seat through genuinely different machinery
    than the retired dense `cosine_topk` (sparse inverted-index product
    vs dense dot). Scale shape: bodies never shuffle (md5-prefix
    keys); df rides the shingle-key count window (the n_sh precedent);
    ONE undirected self-join symmetrized at pair grain; both float
    reductions fold order-pinned; `max_shingle_df=None` explicitly —
    the oracle computes the textbook uncapped cosine, so the query
    must too (the operator's cap belongs to production corpora)."""
    from mrt_data_integration_spark.operators.docsim import idf_cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    return idf_cosine_topk(
        docs, k=3, threshold=0.05, shingle_n=3, max_shingle_df=None
    )


@query(
    "lang_agreement_kappa",
    # Full replay: binarized reference labels, the stopword-density
    # predictor, the (ref, pred) cell counts, union-domain marginals
    # with coalesced zeros, accuracy, the label-ORDERED pe fold
    # (Spark sequential aggregate == DuckDB ordered list_reduce), the
    # kappa closed form with its pe==1 NULL contract, and the
    # per-class precision/recall/F1 honest-NULL rules.
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS r,
             CASE WHEN CAST(len(list_filter({_TOKENS}, t -> t IN {_STOP_SQL})) AS DOUBLE)
                       / len({_TOKENS}) >= 0.02
                  THEN 'en' ELSE 'other' END AS p
      FROM documents WHERE lang IS NOT NULL
    ),
    cells AS (SELECT r, p, count(*) AS n FROM scored GROUP BY 1, 2),
    refm AS (SELECT r, sum(n) AS n_ref FROM cells GROUP BY 1),
    predm AS (SELECT p, sum(n) AS n_pred FROM cells GROUP BY 1),
    diag AS (SELECT r AS label, n AS n_correct FROM cells WHERE r = p),
    labels AS (SELECT r AS label FROM refm UNION SELECT p FROM predm),
    per AS (
      SELECT labels.label AS label,
        CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
        CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
        CAST(coalesce(n_correct, 0) AS BIGINT) AS n_correct
      FROM labels
      LEFT JOIN refm ON refm.r = labels.label
      LEFT JOIN predm ON predm.p = labels.label
      LEFT JOIN diag ON diag.label = labels.label
    ),
    tot AS (
      SELECT CAST(sum(n_ref) AS DOUBLE) AS n,
             CAST(sum(n_correct) AS DOUBLE) AS diag_n,
             list_reduce(
               list(CAST(n_ref AS DOUBLE) * CAST(n_pred AS DOUBLE)
                    ORDER BY label),
               (a, b) -> a + b
             ) AS pesum
      FROM per
    )
    SELECT label, n_ref, n_pred, n_correct,
      CASE WHEN n_pred > 0
           THEN round(CAST(n_correct AS DOUBLE) / n_pred, 6) END AS precision,
      CASE WHEN n_ref > 0
           THEN round(CAST(n_correct AS DOUBLE) / n_ref, 6) END AS recall,
      CASE WHEN n_pred > 0 AND n_ref > 0 THEN
        CASE WHEN n_correct > 0 THEN
          round(2.0 * (CAST(n_correct AS DOUBLE) / n_pred)
                    * (CAST(n_correct AS DOUBLE) / n_ref)
                / ((CAST(n_correct AS DOUBLE) / n_pred)
                   + (CAST(n_correct AS DOUBLE) / n_ref)), 6)
        ELSE 0.0 END
      END AS f1,
      round(diag_n / n, 6) AS accuracy,
      CASE WHEN pesum / (n * n) <> 1.0
           THEN round((diag_n / n - pesum / (n * n))
                      / (1.0 - pesum / (n * n)), 6) END AS kappa
    FROM per, tot
    """,
)
def lang_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-QA (operators/agreement.label_agreement): Cohen's-kappa
    agreement audit between the stopword-density language-ID heuristic
    and the binarized reference lang label — the standard validation
    before a cheap classifier drives corpus-scale filtering. The only
    corpus-scale operation is ONE (ref, pred) hash aggregate
    (map-side partial, label-domain-bounded output); marginals,
    accuracy, the label-ordered pe fold, and the kappa closed form
    all ride the domain-bounded cell frame + a 1-row broadcast.
    Honest-NULL contracts: precision NULL for never-predicted
    classes, recall NULL for reference-absent classes, kappa NULL at
    pe == 1."""
    from mrt_data_integration_spark.operators.agreement import label_agreement

    docs = load_table(spark, sf_dir, "documents")
    frame = docs.filter(F.col("lang").isNotNull()).select(
        F.when(F.col("lang") == "en", F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("ref"),
        tx.lang_id_heuristic("text").alias("pred"),
    )
    return label_agreement(frame, "ref", "pred")
