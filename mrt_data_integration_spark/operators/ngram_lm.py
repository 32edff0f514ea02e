"""Hashed bigram language model + perplexity scoring — the CCNet
quality-filtering recipe (Wenzek et al., LREC 2020: score web text
under an LM trained on a reference corpus; keep the low-perplexity
tail) with stupid-backoff scoring (Brants et al., EMNLP 2007 — the
web-scale backoff that needs no discounting, exactly because it was
designed for distributed count tables like these).

Extension beyond the reference surface (the E5 text-analysis family,
alongside char_trigram_lm_filter's character model and DSIR's
importance weights — this is the TOKEN-level generative score both of
those decline to be: char trigrams smooth over word identity, DSIR
ratios need a target AND a raw corpus, while perplexity needs only a
reference half).

Design for 100 TB:
- The model is COUNT TABLES over md5-hashed buckets (the DSIR
  fixed-width trick, dsir.py:44): vocabulary never escapes to the
  driver, the table width is ``n_buckets`` BY CONSTRUCTION, so the
  scoring joins broadcast a bounded frame no matter how large the
  training corpus grows — the gated-broadcast discipline
  (text_dedup's r12 fix) satisfied structurally rather than by hint
  removal. Collisions fold rare grams into shared buckets; both
  engines hash identically, so the DuckDB oracle replays them.
- Training is two explode → hash-aggregate passes (map-side partial),
  plus a 1-row token total kept IN-PLAN (crossJoin broadcast — the
  DSIR/BM25 pattern, never a separate .count() action).
- Scoring is map-side: the bigram array is built from a MATERIALIZED
  token column with lambdas touching only their own struct args (the
  r11 interpreted-HOF discipline), exploded once, joined to the three
  bounded model frames, and collapsed back to the doc grain in a
  single shuffle.

No UDFs anywhere; everything replays in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.text import tokens


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-derived bucket id — dsir._bucket's arithmetic (bit-identical
    in DuckDB: CAST(concat('0x', substr(md5(g),1,8)) AS BIGINT) % n)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the hashed bigram model: returns ``(unigrams, bigrams,
    totals)`` — (bucket, cnt) count frames over md5 buckets plus the
    1-row token total (``n_tokens`` double), all UNMATERIALIZED
    (callers broadcast the bounded frames into the scoring joins;
    nothing is collected).

    Tokenization is the engine-wide whitespace split (text.tokens);
    bigrams are space-joined token pairs (decontaminate.word_ngrams'
    convention, so the scoring side's concat_ws(' ', w1, w2) hashes to
    the same bucket)."""
    from mrt_data_integration_spark.operators.decontaminate import (
        word_ngrams,
    )

    uni_inst = docs.select(
        F.explode(word_ngrams(text_col, 1)).alias("__g__")
    )
    unigrams = uni_inst.groupBy(
        _bucket(F.col("__g__"), n_buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bigrams = (
        docs.select(F.explode(word_ngrams(text_col, 2)).alias("__g__"))
        .groupBy(_bucket(F.col("__g__"), n_buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = uni_inst.agg(
        F.count(F.lit(1)).cast("double").alias("n_tokens")
    )
    return unigrams, bigrams, totals


def bigram_logprob_scores(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    totals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document average bigram log-probability under the trained
    model — stupid backoff (Brants 2007):

        s(w2 | w1) = cnt(w1 w2) / cnt(w1)             both buckets seen
                   = alpha * (cnt(w2)+1)/(N+B)        otherwise

    (the backoff leg is Laplace-smoothed over the B buckets so unseen
    words never hit log 0). Output grain: one row per document with at
    least one bigram — (id_col, n_bigrams, avg_logprob), avg rounded
    to 6 (the float-combination discipline; higher = more probable =
    "cleaner" under CCNet's reading, log-perplexity = -avg_logprob).

    One explode, three broadcast joins against the bounded model
    frames, one doc-grain aggregate: the corpus shuffles once.
    """
    toks = docs.select(id_col, tokens(text_col).alias("__toks__"))
    m = F.size("__toks__") - 1
    z = F.arrays_zip(
        F.slice("__toks__", 1, m).alias("w1"),
        F.slice("__toks__", 2, m).alias("w2"),
    )
    pairs = toks.select(
        id_col, F.explode(z).alias("__p__")
    ).select(
        id_col,
        F.col("__p__.w1").alias("__w1__"),
        F.col("__p__.w2").alias("__w2__"),
    )
    bi = F.broadcast(
        bigrams.select(
            F.col("bucket").alias("__bb__"),
            F.col("cnt").cast("double").alias("__bc__"),
        )
    )
    cu = F.broadcast(
        unigrams.select(
            F.col("bucket").alias("__cb__"),
            F.col("cnt").cast("double").alias("__cu__"),
        )
    )
    uw = F.broadcast(
        unigrams.select(
            F.col("bucket").alias("__wb__"),
            F.col("cnt").cast("double").alias("__uw__"),
        )
    )
    gram = F.concat_ws(" ", F.col("__w1__"), F.col("__w2__"))
    joined = (
        pairs.join(bi, _bucket(gram, n_buckets) == F.col("__bb__"), "left")
        .join(
            cu,
            _bucket(F.col("__w1__"), n_buckets) == F.col("__cb__"),
            "left",
        )
        .join(
            uw,
            _bucket(F.col("__w2__"), n_buckets) == F.col("__wb__"),
            "left",
        )
        .crossJoin(F.broadcast(totals))  # 1 row: map-side constant
    )
    s = F.when(
        F.col("__bc__").isNotNull() & F.col("__cu__").isNotNull(),
        F.col("__bc__") / F.col("__cu__"),
    ).otherwise(
        F.lit(alpha)
        * (F.coalesce(F.col("__uw__"), F.lit(0.0)) + F.lit(1.0))
        / (F.col("n_tokens") + F.lit(float(n_buckets)))
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum(F.log(s)) / F.count(F.lit(1)), 6).alias(
            "avg_logprob"
        ),
    )


def perplexity_filter(
    docs: DataFrame,
    reference: DataFrame,
    min_avg_logprob: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
    alpha: float = 0.4,
) -> DataFrame:
    """CCNet composition: train on ``reference``, score ``docs``, flag
    the keep set — (id_col, n_bigrams, avg_logprob, kept) where kept =
    avg_logprob >= min_avg_logprob (low perplexity). Thin wrapper so
    the train/score split stays one call for pipelines."""
    uni, bi, tot = train_bigram_lm(
        reference, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    scored = bigram_logprob_scores(
        docs,
        uni,
        bi,
        tot,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        alpha=alpha,
    )
    return scored.withColumn(
        "kept", F.col("avg_logprob") >= F.lit(float(min_avg_logprob))
    )
