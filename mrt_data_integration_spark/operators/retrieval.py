"""BM25 ranked retrieval over the document corpus.

Training-data pipelines score documents against probe queries for
retrieval-augmented mixing, benchmark decontamination triage, and
topic-targeted sampling; BM25 (Robertson-Spärck Jones) is the standard
lexical ranking function. (The reference has no retrieval surface —
this is part of the LLM-pipeline mandate, like operators/text.py.)

Spark-first shape — one postings pass over the corpus plus a map-only
1-row stats scan (N/avgdl must see docs containing NO query term, so
they cannot ride the vocab-pruned postings):

- postings are built by exploding the SAME whitespace tokenization the
  rest of the text stack uses (operators/text.tokens — oracle twin
  ``string_split_regex``), immediately semi-joined to the query
  vocabulary (broadcast — a query set is small by definition), so the
  per-(doc, term) aggregation only shuffles rows for terms somebody
  asked about, not the whole corpus vocabulary;
- corpus stats (N, avgdl) are a 1-row map-only aggregate crossJoined
  back (broadcast of one row — the same scale shape as PageRank's
  dangling mass);
- document frequencies ride the postings (count over the term's
  posting rows = docs containing it, since tf rows are per doc);
- final scores are one (query, term)×(term → postings) join keyed by
  term + a (query, doc) partial-agg sum + a rank-limit-pushed window
  (Spark inserts a partial WindowGroupLimit before the shuffle for
  ``row_number() <= k``, so the final sort only sees k-bounded groups).

Float determinism for the DuckDB oracle: tf/df/N/dl/avgdl are exact
(integer-derived; avgdl's integer sum is exact in double far past any
corpus size here), so the only libm call is the idf log — rounded to
12 decimals on BOTH engines before entering the score product, the
same ULP-proofing as the A-ES sampling key (queries/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.text import tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` has one row per query: (query_id, terms array<string>).
    Duplicate terms within a query are counted once (classic BM25 query
    form). Returns (query_id, rank, doc_id, score) with score rounded
    to 6 decimals and ties broken by doc_id — fully deterministic.

        score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
    """
    from mrt_data_integration_spark.operators.dedup import _spread

    # Fan a small corpus scan across the cluster before the two
    # tokenize passes below (toks + avgdl) — a 1-2 split local table
    # otherwise runs the regex tokenizer on ONE core twice (the r11
    # one-split lesson; measured 2.8 → 1.9 s cold at sf0.1). No-op at
    # corpus scale, where input splits provide the parallelism.
    docs = _spread(docs)
    qterms = queries.select(
        query_id_col, F.explode(F.array_distinct(F.col(terms_col))).alias("term")
    )
    vocab = qterms.select("term").distinct()
    # dl rides the explode (a per-row constant repeated on each token
    # row, folded back with max in the same (doc, term) aggregation) —
    # a separate doc-length frame would cost a second corpus scan AND a
    # fact-fact doc_id join (a 9-exchange plan measured; this shape is
    # 6 with zero SortMergeJoin). dl is computed in its OWN projection
    # BELOW the Generate (opt r15): selecting size(tokens()) as a
    # SIBLING of the explode plans the size Project ABOVE the Generate,
    # where it re-tokenizes the document once per TOKEN row (measured
    # 7× on the raw exploded pass at sf0.1 — the exploded cousin of the
    # HOF-capture class); split this way the optimizer keeps dl below
    # the Generate, one tokenize per doc per expression.
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("dl"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col("dl"),
        F.explode(tokens(text_col)).alias("term"),
    )
    # postings for queried terms only — the broadcast semi-join prunes
    # the explode BEFORE the (doc, term) shuffle
    tf = (
        toks.join(F.broadcast(vocab), "term", "left_semi")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    # tf feeds TWO consumers (document frequencies + the postings
    # join); without a persist each re-executes the corpus explode —
    # two full scans. Same handle discipline as the dedup family
    # (release_cache on the returned frame frees it).
    from mrt_data_integration_spark.cache_registry import track_cache
    from mrt_data_integration_spark.cache_registry import attach_cache

    tf = track_cache(tf.persist())
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = tf.join(F.broadcast(df_t), "term").crossJoin(
        F.broadcast(stats)
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        12,
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        qterms.join(postings, "term")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )
    return attach_cache(out, [tf])


def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, term, pos): one row per token OCCURRENCE with its
    0-based position — the positional inverted index BM25's bag-of-
    words postings decline to be. Built by posexploding the shared
    whitespace tokenization (oracle twin: generate_series indexing
    into ``string_split_regex``)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    ).select(id_col, "term", "pos")


def phrase_search(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase occurrence counting over positional postings — the
    retrieval primitive ranked-bag scoring cannot express ("slow hash
    batch" as a PHRASE, not three independent terms): per (phrase,
    doc), the number of positions where every phrase slot's term
    appears in order.

    Mechanism (the standard positional-join): the phrase list unrolls
    to a tiny (phrase_id, slot, term) frame (broadcast — a query set,
    the BM25 vocab-prune class); joining it to the postings ON TERM is
    simultaneously the vocabulary prune (only rows for asked-about
    terms survive the scan) and the slot assignment; each match votes
    for a candidate start ``pos - slot``, and a start wins when all
    ``len(phrase)`` DISTINCT slots voted — repeated terms in a phrase
    ("a a") work because each slot must find ITS OWN term at its own
    offset, and overlapping occurrences ("a a a" → two starts) fall
    out naturally. Negative candidate starts die on the distinct-slot
    bar (slot > pos can't complete). Two partial-agg shuffles on
    (phrase, doc, start) then (phrase, doc); postings carry only
    (id, term-join artifacts, two ints) — text never shuffles.

    Returns (phrase_id, phrase, id_col, n_occurrences), occurrences
    >= 1 only (docs without the phrase simply don't appear).
    """
    rows = []
    for pid, p in enumerate(phrases):
        # any-whitespace split (ADVICE r12): documents tokenize on \s+,
        # so a phrase with consecutive/tab whitespace must not produce
        # empty-string slot terms that silently match nothing.
        terms = p.split()
        if not terms:
            raise ValueError(f"phrase {p!r} tokenizes to no terms")
        for slot, t in enumerate(terms):
            rows.append((pid, p, slot, t, len(terms)))
    spark = docs.sparkSession
    ph = spark.createDataFrame(
        rows,
        "phrase_id int, phrase string, slot int, term string, "
        "n_slots int",
    )
    post = positional_postings(docs, id_col, text_col)
    votes = post.join(F.broadcast(ph), "term").select(
        "phrase_id",
        "phrase",
        id_col,
        (F.col("pos") - F.col("slot")).alias("__start__"),
        "slot",
        "n_slots",
    )
    starts = (
        votes.groupBy("phrase_id", "phrase", id_col, "__start__")
        .agg(
            F.countDistinct("slot").alias("__hit__"),
            F.max("n_slots").alias("__need__"),
        )
        .filter(F.col("__hit__") == F.col("__need__"))
    )
    return starts.groupBy("phrase_id", "phrase", id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
