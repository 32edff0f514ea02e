"""Deduplication operators (SURVEY.md §2.9 E3): exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design:
- Exact dedup = hash aggregation on a fingerprint column (one shuffle of
  (fingerprint, id) pairs — never the document bodies).
- MinHash signatures are per-row array expressions (no shuffle at all);
  LSH banding turns near-dup search into an equi-join on band keys, so
  the only shuffle is keyed by band hash. Candidate verification happens
  only within buckets — the quadratic step is bounded by bucket size.
- All hashing is MD5-based (bit-identical across engines → DuckDB-
  checkable), applied to shingles via JVM-side ``transform`` lambdas.
  A production deployment would swap md5 for xxhash64 (same plan shape,
  ~5× faster); md5 is chosen here for cross-engine verifiability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# attach_cache/release_cache live in cache_registry (r10 — the handle
# discipline is shared by five operator modules, not dedup-specific);
# re-exported here (noqa: F401) because tests, scripts, and the other
# operator modules historically import them from this module.
from mrt_data_integration_spark.cache_registry import (  # noqa: F401
    attach_cache as _attach_cache,
    eager_cache,
    release_cache,
    track_cache,
    untrack,
)
from mrt_data_integration_spark.operators.text import fingerprint, tokens


def _spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a small scan across the cluster before CPU-heavy hashing.

    No-op when the scan already yields enough splits: at corpus scale the
    input splits provide the parallelism, and a blanket ``repartition``
    would full-shuffle the raw document bodies — the classic own-goal.
    Only tiny local files (1-2 splits) take the shuffle.
    """
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df




def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (smallest id) per canonical-text fingerprint."""
    fp = df.withColumn("__fp__", fingerprint(text_col))
    keep = fp.groupBy("__fp__").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, ["__fp__", id_col], "left_semi").drop("__fp__")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of distinct n-word shingles (space-joined).

    Pure array expressions: ``arrays_zip`` of the n shifted slices of
    the token array, concat'd per element — the lambda touches only
    its struct argument. (The original ``transform(sequence(1, m),
    i -> concat_ws(' ', slice(toks, i, n)))`` captured ``toks`` inside
    the lambda; interpreted HOF lambdas re-evaluate captured
    sub-expressions per element, re-running the regex tokenizer once
    per shingle — the decontaminate.word_ngrams finding, r11.)

    Exact original semantics preserved: docs with fewer than n tokens
    emit ONE whole-doc shingle (``m = greatest(size−(n−1), 1)``; the
    shorter shifted slices zip-pad with NULLs, which ``concat_ws``
    skips — identical to the short ``slice``); NULL text yields
    ``[""]`` (concat_ws of an all-NULL row), pinned explicitly here
    because the zip of NULL arrays would otherwise be NULL."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    z = F.arrays_zip(
        *[F.slice(toks, F.lit(i + 1), m).alias(f"w{i}") for i in range(n)]
    )
    sh = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(n)])
    )
    return F.array_distinct(
        F.when(toks.isNotNull(), sh).otherwise(F.array(F.lit("")))
    )


def _seeded_minhash(shingles: Column, seed: int) -> Column:
    """min over shingles of md5('seed{s}:' || shingle) — a valid uniform
    min-hash (lexicographic min over uniform hex digests)."""

    def hash_one(x: Column) -> Column:
        return F.md5(F.concat(F.lit(f"seed{seed}:"), x))

    return F.array_min(F.transform(shingles, hash_one))


def minhash_signature(
    text: Column | str,
    n_hashes: int = 8,
    shingle_n: int = 3,
    shingles: Column | None = None,
) -> list[Column]:
    """MinHash signature columns, aliased ``minhash_{s}``. Pass a
    pre-materialized ``shingles`` column to share one shingle
    computation across all hash seeds (see queries/text_dedup.py)."""
    sh = shingles if shingles is not None else word_shingles(text, shingle_n)
    return [_seeded_minhash(sh, s).alias(f"minhash_{s}") for s in range(n_hashes)]


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (id_a < id_b, band_id).

    bands = n_hashes / band_size; docs sharing any full band collide.
    The self-join runs per band bucket — the shuffle key is the band
    hash, so cost is Σ bucket² not N².
    """
    # One scan: signature columns → an ARRAY of (band_id, band_key)
    # structs exploded to long form. A per-band union of n_bands selects
    # would scan (or cache) the signature frame once per band and hand
    # Catalyst a union-of-joins plan to compile; the explode keeps the
    # whole banding map-side in a single projection, so nothing needs a
    # persist and the self-join below is the only shuffle.
    with_sh = _spread(df).select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("__sh__")
    )
    sigs = with_sh.select(
        F.col(id_col),
        *minhash_signature(text_col, n_hashes, shingle_n, shingles=F.col("__sh__")),
    )
    n_bands = n_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"minhash_{b * band_size + k}") for k in range(band_size)],
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    bands = sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("band")
    ).select(
        F.col(id_col), F.col("band.band_id").alias("band_id"),
        F.col("band.band_key").alias("band_key"),
    )
    a = bands.alias("a")
    b_ = bands.alias("b")
    out = (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.band_id").alias("band_id"),
        )
        .distinct()
    )
    return out


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    band_size: int,
    shingle_n: int,
    out_id: str,
) -> tuple[DataFrame, DataFrame]:
    """One scan → (sigs, bands): the id-keyed signature frame (persisted
    + tracked — it feeds both banding and the agreement verify) and its
    exploded (band_id, band_key) form."""
    # Two-step projection: __sh__ is referenced by all n_hashes seeds, so
    # CollapseProject keeps it materialized (one shingle pass per row);
    # inlining word_shingles into each seed would tokenize 8×.
    with_sh = _spread(df).select(
        F.col(id_col).alias(out_id),
        F.col(text_col),
        word_shingles(text_col, shingle_n).alias("__sh__"),
    )
    sigs = with_sh.select(
        F.col(out_id),
        *minhash_signature(text_col, n_hashes, shingle_n, shingles=F.col("__sh__")),
    )
    sigs = track_cache(sigs.persist())
    n_bands = n_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"minhash_{b * band_size + k}") for k in range(band_size)],
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    bands = sigs.select(
        F.col(out_id), F.explode(F.array(*band_structs)).alias("band")
    ).select(
        F.col(out_id),
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_key").alias("band_key"),
    )
    return sigs, bands


def lsh_cross_candidates(
    df_new: DataFrame,
    df_ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    min_sig_agreement: float = 0.0,
) -> DataFrame:
    """Cross-corpus MinHash-LSH near-dup candidates — the incremental
    ingestion shape: flag documents of a NEW batch that near-duplicate
    anything in an existing REFERENCE corpus (new crawl vs deduped
    training set), without the reference ever joining against itself.

    Returns (new_id, ref_id, sig_agreement): pairs sharing ≥1 full
    minhash band, with the fraction of agreeing minhashes as the
    standard unbiased Jaccard estimate. ``min_sig_agreement`` filters
    the estimate (e.g. 0.5 ≈ Jaccard ≥ 0.5 up to MC error of the
    n_hashes sketch).

    Scale shape: each side is scanned once (signatures persist via the
    tracked-cache discipline); the candidate join is keyed by (band_id,
    band_key) — cost Σ bucket_new × bucket_ref, never |new|×|ref| — and
    the agreement verify re-joins the bounded candidate set to the two
    id-keyed signature frames, so the ~256 B signature rows are never
    multiplied through the band explode and document bodies never enter
    any shuffle.
    """
    sigs_new, bands_new = _banded_signatures(
        df_new, id_col, text_col, n_hashes, band_size, shingle_n, "new_id"
    )
    sigs_ref, bands_ref = _banded_signatures(
        df_ref, id_col, text_col, n_hashes, band_size, shingle_n, "ref_id"
    )
    cands = (
        bands_new.join(bands_ref, ["band_id", "band_key"])
        .select("new_id", "ref_id")
        .distinct()
    )
    sig_n = F.array(*[F.col(f"n.minhash_{s}") for s in range(n_hashes)])
    sig_r = F.array(*[F.col(f"r.minhash_{s}") for s in range(n_hashes)])
    agree = (
        F.size(F.filter(F.zip_with(sig_n, sig_r, lambda x, y: x == y), lambda b: b))
        / float(n_hashes)
    )
    out = (
        cands.join(sigs_new.alias("n"), "new_id")
        .join(sigs_ref.alias("r"), "ref_id")
        .select("new_id", "ref_id", F.round(agree, 4).alias("sig_agreement"))
    )
    if min_sig_agreement > 0.0:
        out = out.filter(F.col("sig_agreement") >= min_sig_agreement)
    return _attach_cache(out, [sigs_new, sigs_ref])


def dedup_against_reference(
    df_new: DataFrame,
    df_ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Keep only the NEW rows whose best signature agreement against the
    reference corpus is below ``threshold`` — the actionable form of
    ``lsh_cross_candidates`` (left-anti join on the flagged id set)."""
    cands = lsh_cross_candidates(
        df_new, df_ref, id_col, text_col, n_hashes, band_size, shingle_n,
        min_sig_agreement=threshold,
    )
    flagged = cands.select(F.col("new_id").alias(id_col)).distinct()
    out = df_new.join(flagged, id_col, "left_anti")
    return _attach_cache(out, list(getattr(cands, "__graft_cached__", ())))


def build_lsh_signature_store(
    docs: DataFrame,
    path: str,
    n_hashes: int = 4,
    band_size: int = 2,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist a corpus's MinHash signatures as an LSH probe store —
    the build-once/append-many layout for INCREMENTAL text dedup (the
    E3 twin of the persisted IVFADC index).

    Writes ``{path}/bands`` — (ref_id, band_key) rows partitioned by
    band_id, sorted by band_key within files so selective probes prune
    on row-group min/max — and ``{path}/sigs`` (the full signatures,
    for the agreement verify), plus ``meta.json`` pinning the hash
    parameters (a probe or append with different parameters would
    silently produce garbage candidates; they are validated instead).

    Why persist: ``lsh_cross_candidates`` re-shingles the REFERENCE
    corpus on every batch — at a 100 TB training set vs a daily crawl
    batch that is a daily full-corpus scan. The store amortizes it to
    one scan ever; each ingest then costs one scan of the BATCH plus a
    band-keyed join in which the store side never shuffles (the batch's
    band frame is small → broadcast, by AQE or threshold).
    """
    import json
    import os

    sigs, bands = _banded_signatures(
        docs, id_col, text_col, n_hashes, band_size, shingle_n, "ref_id"
    )
    (
        # Range-partition by (band_id, band_key), NOT by band_id alone:
        # band_id has only n_hashes/band_size distinct values, so a
        # band_id hash repartition would funnel the whole corpus's band
        # table through that many write tasks. Range keeps full write
        # parallelism AND the within-file band_key sort the probe's
        # row-group pruning relies on.
        bands.repartitionByRange("band_id", "band_key")
        .sortWithinPartitions("band_id", "band_key")
        .write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(os.path.join(path, "bands"))
    )
    sigs.write.mode("overwrite").parquet(os.path.join(path, "sigs"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(
            {
                "n_hashes": n_hashes,
                "band_size": band_size,
                "shingle_n": shingle_n,
            },
            fh,
        )
    # The tracked signature persist fed both writes; release it now —
    # the store on disk is the reusable artifact, not the cache.
    sigs.unpersist()
    untrack(sigs)


def _read_lsh_store_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def append_to_lsh_signature_store(
    docs_batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Append a batch's signatures to a persisted store (one scan of
    the batch; the stored corpus is never rescanned or rewritten).
    Caller owns id uniqueness across batches. Returns rows appended."""
    import os

    meta = _read_lsh_store_meta(path)
    sigs, bands = _banded_signatures(
        docs_batch, id_col, text_col,
        meta["n_hashes"], meta["band_size"], meta["shingle_n"], "ref_id",
    )
    (
        bands.repartitionByRange("band_id", "band_key")
        .sortWithinPartitions("band_id", "band_key")
        .write.mode("append")
        .partitionBy("band_id")
        .parquet(os.path.join(path, "bands"))
    )
    sigs.write.mode("append").parquet(os.path.join(path, "sigs"))
    # Count the still-persisted signature frame (one row per batch doc,
    # served from cache) — counting docs_batch would rescan the raw
    # batch, the exact extra pass this operator exists to avoid.
    n = sigs.count()
    sigs.unpersist()
    untrack(sigs)
    return n


def lsh_store_candidates(
    spark,
    path: str,
    df_new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sig_agreement: float = 0.0,
) -> DataFrame:
    """Near-dup candidates of a NEW batch against a persisted signature
    store: (new_id, ref_id, sig_agreement) for pairs sharing ≥1 full
    band, with the fraction of agreeing minhashes as the Jaccard
    estimate — same semantics as ``lsh_cross_candidates`` with the
    reference side read from the store instead of re-shingled
    (differential-tested equal). The batch is scanned once; the store's
    band table streams through one join keyed by (band_id, band_key)."""
    import os

    meta = _read_lsh_store_meta(path)
    n_hashes = meta["n_hashes"]
    sigs_new, bands_new = _banded_signatures(
        df_new, id_col, text_col,
        n_hashes, meta["band_size"], meta["shingle_n"], "new_id",
    )
    bands_ref = spark.read.parquet(os.path.join(path, "bands")).select(
        "ref_id", F.col("band_id").cast("int").alias("band_id"), "band_key"
    )
    sigs_ref = spark.read.parquet(os.path.join(path, "sigs"))
    cands = (
        bands_new.join(bands_ref, ["band_id", "band_key"])
        .select("new_id", "ref_id")
        .distinct()
    )
    sig_n = F.array(*[F.col(f"n.minhash_{s}") for s in range(n_hashes)])
    sig_r = F.array(*[F.col(f"r.minhash_{s}") for s in range(n_hashes)])
    agree = (
        F.size(F.filter(F.zip_with(sig_n, sig_r, lambda x, y: x == y), lambda b: b))
        / float(n_hashes)
    )
    out = (
        cands.join(sigs_new.alias("n"), "new_id")
        .join(sigs_ref.alias("r"), "ref_id")
        .select("new_id", "ref_id", F.round(agree, 4).alias("sig_agreement"))
    )
    if min_sig_agreement > 0.0:
        out = out.filter(F.col("sig_agreement") >= min_sig_agreement)
    return _attach_cache(out, [sigs_new])


def simhash(text: Column | str, n_bits: int = 16) -> Column:
    """SimHash over word tokens: per-bit majority vote of token-md5 bits.

    For each bit position: +1 per token with the bit set, −1 otherwise;
    a positive total sets the output bit. ONE md5 per token, folded to a
    single integer via ``conv(hex_prefix, 16, 10)`` in the same hoisted
    transform, so the hot vote fold extracts each bit with one
    shift+mask — the earlier per-bit nibble chain (substring + ascii +
    branch, ×n_bits per token) was ~2× the fold cost (r5 profile). Bit
    numbering is unchanged (bit i = bit i%4 of hex nibble i//4), so
    hash values — and the DuckDB oracle, which keeps the portable
    nibble arithmetic — are identical. No shuffle, no UDF.
    """
    n_chars = (n_bits + 3) // 4
    digests = F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, n_chars), 16, 10).cast("long"),
    )

    def votes(acc: Column, v: Column) -> Column:
        bits = F.array(*[
            F.shiftright(v, 4 * (n_chars - 1) - 4 * (i // 4) + i % 4)
            .bitwiseAND(F.lit(1))
            .cast("int")
            for i in range(n_bits)
        ])
        # vote contribution: bit==1 → +1, bit==0 → −1  (= 2b − 1)
        return F.zip_with(acc, bits, lambda a, b: a + b * 2 - 1)

    counts = F.aggregate(
        digests, F.array_repeat(F.lit(0), n_bits), votes
    )
    powers = F.array(*[F.lit(2**i) for i in range(n_bits)])
    contrib = F.zip_with(
        counts, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0))
    )
    return F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x).cast("long")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 500,
    hot_shingle_obs: "Observation | None" = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    explode(shingles) → equi-join on shingle → per-pair intersection
    count → |A∪B| = |A|+|B|−|A∩B|. The shuffle is keyed by shingle, so
    only co-shingled docs ever meet (no N² cross join).

    ``max_shingle_df`` bounds skew: a boilerplate shingle ("all rights
    reserved") shared by k docs would alone emit k² join rows, so any
    shingle whose document frequency exceeds the cap is dropped from the
    shingle sets BEFORE the self-join (Jaccard is then computed over the
    capped sets — sizes and intersections see the same universe, so the
    metric stays a true Jaccard of the filtered sets). The worst-case
    join fan-out per shingle becomes cap², independent of corpus size.
    The default (500) is skew-safe: one hot shingle costs at most
    500² = 250k join rows, cheap on any executor; 10k (the old default)
    would have allowed 10⁸ per hot shingle. ``None`` disables the cap
    (exact semantics at any frequency — the oracle-checked query passes
    ``None`` explicitly because its SQL twin computes uncapped Jaccard).

    ``hot_shingle_obs``: optional ``pyspark.sql.Observation``; when
    given, ``obs.get["n_hot_shingles_dropped"]`` after the first action
    reports how many distinct shingles the cap removed — the dropped-
    shingle counter, collected for free on the broadcast branch.
    """
    # Join on a 64-bit md5 prefix of the shingle, not the shingle text:
    # the self-join shuffle then carries (8-byte-ish key, id) pairs
    # instead of full n-gram strings — the shuffle payload is the cost
    # driver at corpus scale. Collision probability ~2^-64 per pair.
    exploded = _spread(df).select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles(text_col, shingle_n),
                lambda s: F.substring(F.md5(s), 1, 16),
            )
        ).alias("shingle"),
    )
    # The exploded frame feeds several consumers (hot-shingle agg, both
    # self-join sides, the per-doc size agg). The join sides share one
    # ReusedExchange, but the other consumers shuffle differently —
    # without a persist each would re-read and re-shingle the corpus.
    # MEMORY_AND_DISK (the default) spills at corpus scale; recomputing
    # a 100 TB tokenize+md5 several times costs more. Released via
    # release_cache() on the returned frame. Deliberately LAZY (not
    # eager_cache): the consumers form a chain, not racing branches —
    # the n_sh window feeds the join inputs and the two join sides are
    # identical subtrees sharing one ReusedExchange, so the cache
    # materializes exactly once; a 5-pair A/B read the eager variant
    # as wash-to-worse (opt r14).
    exploded = track_cache(exploded.persist())
    if max_shingle_df is not None:
        # Shingles are distinct per doc (array_distinct), so count(1)
        # per shingle IS its document frequency. The hot set is tiny by
        # construction (only ultra-frequent boilerplate) → broadcast
        # anti-join, map-side, no extra shuffle on the exploded frame.
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        if hot_shingle_obs is not None:
            hot = hot.observe(
                hot_shingle_obs,
                F.count(F.lit(1)).alias("n_hot_shingles_dropped"),
            )
        sh = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        sh = exploded
    # Capped set size rides on every exploded row, so the self-join can
    # size-prune BEFORE the pair aggregation: J(A,B) ≥ t ⇒
    # n_inter ≥ t·(n_a+n_b)/(1+t), and n_inter ≤ min ⇒ a qualifying
    # pair needs min(n_a,n_b) ≥ t·max(n_a,n_b). Pairs failing the
    # ratio test are dropped AT the join — exact (they provably can't
    # pass the final threshold filter) — pruning every hot shingle
    # bucket's k² fan-out down to its similar-sized subset (at dedup
    # thresholds t ≥ 0.5, a 2× length spread disqualifies). The size
    # attach is a count window over id: one keyed shuffle of the
    # exploded frame, replacing the old post-aggregation size lookups
    # (two joins against pair-sized frames). A join against a separate
    # per-doc counts frame measured slower here — it adds another
    # consumer of the persisted exploded frame for the same shuffle
    # volume. Also measured and rejected (r4): reading sizes off the
    # shingle ARRAY pre-explode to skip this window entirely — 2x slower
    # warm, because the window's shuffle is what gives AQE the runtime
    # stats to convert the self-join to broadcast; without it the join
    # stays shuffle-based and the cache materializes twice.
    from pyspark.sql import Window

    sh = sh.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    a, b = sh.alias("a"), sh.alias("b")
    t = float(threshold)
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= F.lit(t) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
            ),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
    )
    out = (
        inter.withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", F.round("jaccard", 4).alias("jaccard"))
    )
    return _attach_cache(out, [exploded])


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 500,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs — the asymmetric dedup metric
    symmetric Jaccard is blind to: a 50-shingle quote fully embedded
    in a 5000-shingle article has Jaccard ≈ 0.01 but containment 1.0.
    Thresholding the OVERLAP COEFFICIENT |A∩B| / min(|A|,|B|)
    (Szymkiewicz–Simpson) catches partial copies, quotations, and
    excerpt-expansion pairs that survive every symmetric filter; both
    directional containments |A∩B|/|A| and |A∩B|/|B| ride along so
    callers can tell which side is the fragment.

    Same candidate machinery as :func:`ngram_jaccard_pairs`
    (explode distinct shingles → md5-prefix keys → shingle-keyed
    self-join → per-pair intersection counts) with one deliberate
    difference: NO size-ratio join prune. Jaccard ≥ t implies
    min(n)/max(n) ≥ t, so unlike-sized pairs can be dropped AT the
    join there; containment's entire point is pairing unlike sizes,
    so no size predicate is sound here. That makes ``max_shingle_df``
    (the boilerplate-shingle document-frequency cap) THE fan-out
    control — it stays ON by default and should only be ``None`` for
    oracle-exact checks at test scale, never production corpora.
    Post-aggregation the threshold prunes at the pair grain:
    n_inter ≥ t·min(n_a, n_b).

    CAPPED-UNIVERSE CONTRACT: under ``max_shingle_df``, EVERY reported
    quantity — ``n_a``/``n_b``, ``n_inter``, and all three ratios — is
    computed over the capped shingle sets (sizes and intersections see
    the same universe, the ``ngram_jaccard_pairs`` convention). For
    this asymmetric metric the consequence is sharper than for
    Jaccard: a boilerplate-heavy fragment's denominator shrinks toward
    its RARE shingles, so ``overlap``/``containment_*`` read as
    distinctive-content containment — 1.0 means "everything
    distinctive about the smaller doc is in the larger one", which is
    the screening-relevant quantity, NOT the uncapped textbook ratio
    the ``max_shingle_df=None`` oracle computes. Pinned by
    tests/test_containment.py::test_capped_universe_denominators.

    Returns (id_a, id_b, n_inter, n_a, n_b, overlap, containment_a,
    containment_b), id_a < id_b, ratios rounded to 4."""
    exploded = _spread(df).select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles(text_col, shingle_n),
                lambda s: F.substring(F.md5(s), 1, 16),
            )
        ).alias("shingle"),
    )
    # Same multi-consumer persist rationale as ngram_jaccard_pairs —
    # and the same deliberate-lazy call (chain + ReusedExchange, no
    # racing branches; eager A/B'd wash-to-worse, opt r14).
    exploded = track_cache(exploded.persist())
    if max_shingle_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        sh = exploded
    from pyspark.sql import Window

    sh = sh.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
    )
    ov = F.col("n_inter") / F.least("n_a", "n_b")
    out = (
        inter.filter(ov >= F.lit(float(threshold)))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_a",
            "n_b",
            F.round(ov, 4).alias("overlap"),
            F.round(F.col("n_inter") / F.col("n_a"), 4).alias(
                "containment_a"
            ),
            F.round(F.col("n_inter") / F.col("n_b"), 4).alias(
                "containment_b"
            ),
        )
    )
    return _attach_cache(out, [exploded])


def containment_cross_pairs(
    df_new: DataFrame,
    df_ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 500,
) -> DataFrame:
    """Cross-corpus :func:`containment_pairs` — the incremental-ingest
    form: how much of each NEW document's shingle set already lives in
    a REFERENCE document (quote/partial-copy screening of a fresh
    crawl against the held corpus, where the symmetric cross-LSH path
    misses fragments the same way Jaccard does within one corpus).

    Emits (new_id, ref_id, n_inter, n_new, n_ref, containment_new =
    |N∩R| / |N| — the decontamination-relevant direction, thresholded
    — plus the symmetric overlap for callers that want it), ratios
    rounded to 4. The document-frequency cap is computed over the
    UNION of both corpora (a boilerplate shingle is boilerplate
    wherever it appears) and remains the fan-out control — no
    size-ratio prune is sound here either. The capped-universe
    contract is :func:`containment_pairs`'s verbatim: under the cap,
    ``n_new``/``n_ref`` and every ratio are computed over the CAPPED
    shingle sets (same universe as the intersection), so
    ``containment_new`` reads as distinctive-content containment of
    the new document, not the uncapped textbook ratio.
    """
    def _explode(df: DataFrame, side: str) -> DataFrame:
        return _spread(df).select(
            F.col(id_col).alias(f"{side}_id"),
            F.explode(
                F.transform(
                    word_shingles(text_col, shingle_n),
                    lambda s: F.substring(F.md5(s), 1, 16),
                )
            ).alias("shingle"),
        )

    new_sh = track_cache(_explode(df_new, "new").persist())
    ref_sh = track_cache(_explode(df_ref, "ref").persist())
    if max_shingle_df is not None:
        hot = (
            new_sh.select("shingle")
            .unionByName(ref_sh.select("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        n_side = new_sh.join(F.broadcast(hot), "shingle", "left_anti")
        r_side = ref_sh.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        n_side, r_side = new_sh, ref_sh
    from pyspark.sql import Window

    n_side = n_side.withColumn(
        "n_new", F.count(F.lit(1)).over(Window.partitionBy("new_id"))
    )
    r_side = r_side.withColumn(
        "n_ref", F.count(F.lit(1)).over(Window.partitionBy("ref_id"))
    )
    inter = (
        n_side.join(r_side, "shingle")
        .groupBy("new_id", "ref_id")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("n_new").alias("n_new"),
            F.first("n_ref").alias("n_ref"),
        )
    )
    c_new = F.col("n_inter") / F.col("n_new")
    out = inter.filter(c_new >= F.lit(float(threshold))).select(
        "new_id",
        "ref_id",
        "n_inter",
        "n_new",
        "n_ref",
        F.round(c_new, 4).alias("containment_new"),
        F.round(
            F.col("n_inter") / F.least("n_new", "n_ref"), 4
        ).alias("overlap"),
    )
    return _attach_cache(out, [new_sh, ref_sh])


def source_overlap_matrix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
    max_shingle_sources: int | None = None,
) -> DataFrame:
    """CORPUS-grain duplication audit: for every pair of sources, how
    much distinct shingle content they share — the matrix a mixture
    plan consults before weighting sources (two dumps of the same
    crawl read jaccard ≈ 1; a source that is a subset of another reads
    containment ≈ 1 with a small jaccard, exactly the asymmetry the
    document-grain :func:`containment_pairs` flags one level down).

    One row per unordered source pair that shares at least one
    shingle: (source_a < source_b, n_shared, n_a, n_b, jaccard,
    overlap = |A∩B|/min — Szymkiewicz–Simpson, containment_a,
    containment_b), ratios rounded 4, over each source's DISTINCT
    shingle set (md5-prefix keys, the containment family's
    convention). NULL-text rows are excluded.

    Scale shape: one (source, shingle)-grain DISTINCT shuffle, then
    ONE shingle-grain hash aggregate collecting each shingle's sorted
    source set (bounded by the SOURCE DOMAIN |S| — a config-class
    constant: crawls/dumps/registries number in the tens-to-hundreds,
    never the corpus), then a map-side pair expansion of at most
    |S|·(|S|−1)/2 per shingle and a pair-grain integer count: the
    matrix never shuffles text, and no stage's width grows with the
    corpus — only with |S|² and the shingle domain. For a pathological
    source domain, ``max_shingle_sources`` drops shingles present in
    more than that many sources before the expansion (the containment
    family's capped-universe contract VERBATIM: sizes and
    intersections then both see the capped universe).
    """
    sh = (
        _spread(df)
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col(source_col).alias("source"),
            F.explode(
                F.transform(
                    word_shingles(text_col, shingle_n),
                    lambda s: F.substring(F.md5(s), 1, 16),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    # eager: the sizes aggregate and the source-set aggregate are
    # sibling branches of the final job — unmaterialized they race the
    # (source, shingle) DISTINCT, this operator's dominant term
    # (opt r14).
    sh = eager_cache(sh)
    if max_shingle_sources is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_sources)
            .select("shingle")
        )
        kept = sh.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        kept = sh
    sizes = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    )
    # per-shingle sorted source set (|S|-bounded), then the pair
    # expansion — two-step select so the lambda touches only column
    # refs (the interpreted-HOF capture discipline)
    src_sets = (
        kept.groupBy("shingle")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
        .select("srcs", F.size("srcs").alias("m"))
    )
    pairs = src_sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("srcs"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("srcs"), i + 2, F.col("m") - i - 1
                        ),
                        lambda y: F.struct(
                            x.alias("source_a"), y.alias("source_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    counts = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    out = (
        counts.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b"), 4
            ).alias("overlap"),
            F.round(F.col("n_shared") / F.col("n_a"), 4).alias(
                "containment_a"
            ),
            F.round(F.col("n_shared") / F.col("n_b"), 4).alias(
                "containment_b"
            ),
        )
    )
    return _attach_cache(out, [sh])


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PPJoin-style prefix filtering —
    the corpus-scale path for the same result ``ngram_jaccard_pairs``
    computes (prefix-filter principle: Chaudhuri et al., "A Primitive
    Operator for Similarity Joins", ICDE'06; Xiao et al., "Efficient
    Similarity Joins for Near Duplicate Detection", WWW'08).

    Shape: rank every shingle by global document frequency (rarest
    first, shingle hash as the tie-break → a deterministic total order
    of the universe); per doc, keep the sorted array and explode only
    its PREFIX of length |X| − ⌈t·|X|⌉ + 1. Any pair with J ≥ t must
    (a) pass the size-ratio test min ≥ t·max and (b) share a prefix
    element under the global order, so the candidate equi-join on
    prefix shingles finds a superset of qualifying pairs — exactness
    preserved. Candidates then verify by joining the two full sorted
    arrays and counting ``array_intersect``.

    Measured crossover (results/PPJOIN_CROSSOVER.md, round 4): on a
    uniform-frequency corpus the plain self-join wins at every scale
    tried (prefix's two extra keyed shuffles buy nothing); on a
    boilerplate-heavy corpus — every doc sharing one sentence, the
    shape of real web data — prefix wins 2.8x at just 5k docs with
    identical exact output, and the gap grows ~n². So: default to
    ``ngram_jaccard_pairs`` (capped) for throughput; use THIS operator
    when exact semantics are required on a skewed corpus.

    Why this wins on skewed corpora over the plain shingle self-join:
    - boilerplate shingles ("all rights reserved") have the HIGHEST
      document frequency, so the rarest-first order pushes them out of
      every prefix — the skew-killer bucket never forms, without the
      frequency cap (and without its semantics change);
    - the candidate join touches ~(1−t) of each doc's shingles instead
      of all of them, and the quadratic work happens per candidate
      pair, not per co-shingled pair.
    Cost: two extra keyed shuffles (df join, array re-assembly) — the
    classic trade of pair-explosion for bounded passes.
    """
    t = float(threshold)
    exploded = _spread(df).select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles(text_col, shingle_n),
                lambda s: F.substring(F.md5(s), 1, 16),
            )
        ).alias("shingle"),
    )
    # Feeds the df agg and the rank join → persist once, release via
    # release_cache() (same discipline as ngram_jaccard_pairs; the
    # dfreq broadcast build sequences the scans, so lazy — opt r14).
    exploded = track_cache(exploded.persist())
    dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
    ranked = exploded.join(dfreq, "shingle")
    arrs = (
        ranked.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("dfreq"), F.col("shingle")))
            ).alias("ranked")
        )
        .select(
            F.col(id_col),
            F.transform(F.col("ranked"), lambda s: s["shingle"]).alias("sh_arr"),
            F.size(F.col("ranked")).alias("n_sh"),
        )
    )
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + F.lit(1)
    ).cast("int")
    pref = arrs.select(
        F.col(id_col),
        F.col("n_sh"),
        F.explode(F.slice(F.col("sh_arr"), F.lit(1), prefix_len)).alias("shingle"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= F.lit(t) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    va = arrs.select(
        F.col(id_col).alias("id_a"),
        F.col("sh_arr").alias("arr_a"),
        F.col("n_sh").alias("n_a"),
    )
    vb = arrs.select(
        F.col(id_col).alias("id_b"),
        F.col("sh_arr").alias("arr_b"),
        F.col("n_sh").alias("n_b"),
    )
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "n_inter", F.round("jaccard", 4).alias("jaccard"))
    )
    return _attach_cache(out, [exploded])


def substring_chunk_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 32,
    anchor_mod: int = 16,
    min_shared: int = 1,
    max_chunk_df: int | None = 500,
) -> DataFrame:
    """Exact shared-substring candidate pairs via content-defined chunk
    hashes — the scalable approximation of suffix-array substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22: verbatim multi-sentence overlap survives MinHash
    because it dilutes the doc-level Jaccard; substring-level matching
    catches it).

    Chunk boundaries must not depend on position — a fixed-stride grid
    misses identical text at different offsets (doc A embeds the passage
    at char 100, doc B at char 37: their grid windows sample different
    phases of it). So windows ANCHOR on local content, the
    content-defined-chunking idea from storage dedup (Muthitacharoen et
    al., "A Low-Bandwidth Network File System", SOSP'01): offset ``o``
    is anchored iff a polynomial of the 4 leading char codes ≡ 0 mod
    ``anchor_mod`` (≈ 1/``anchor_mod`` of offsets, chosen by the text
    itself). A verbatim passage therefore anchors at the SAME relative
    positions in every doc containing it; any shared passage with at
    least one anchored window inside it is found — expected to hold
    once the overlap exceeds ~``chunk + anchor_mod`` chars.

    Each doc emits md5 hashes of its anchored ``chunk``-char windows
    (distinct per doc, so internal repetition can't inflate pair
    counts); docs sharing ≥ ``min_shared`` hashes pair up. Per-doc cost
    is O(len) integer ops (the anchor polynomial) + O(anchors) md5 —
    all inside JVM codegen; only (hash, id) rows shuffle, bodies stay
    put. ``max_chunk_df`` drops boilerplate chunks the same way
    ``ngram_jaccard_pairs`` caps hot shingles (bounds any join bucket
    at cap²); None = exact, for oracle checks. Docs shorter than
    ``chunk`` emit nothing (the exact-dedup path owns those).
    """
    if chunk < 4:
        # the anchor polynomial reads the window's first 4 chars from
        # the codes array; a smaller window would probe past the last
        # offset's window end (ANSI element_at throws)
        raise ValueError(f"chunk must be >= 4 (anchor lookahead), got {chunk}")
    text = F.col(text_col)
    chars = F.col("__chars__")
    codes = F.col("__codes__")

    def _anchored(o: Column) -> Column:
        # probe the per-doc codepoint ARRAY: element_at is O(1), where
        # substr(text, o, 1) is O(o) on UTF8 strings (byte-walk to the
        # char boundary) — with ~len/anchor_mod anchored offsets that
        # made both the anchor scan and the window extraction O(len²)
        # per doc, ruinous at real web-document lengths
        def code(k: int) -> Column:
            return F.element_at(codes, o + F.lit(k))

        poly = ((code(0) * 31 + code(1)) * 31 + code(2)) * 31 + code(3)
        return poly % anchor_mod == 0

    offsets = F.filter(
        F.sequence(F.lit(1), F.length(text) - (chunk - 1)), _anchored
    )
    # window hashes are built from O(chunk) array slices BEFORE the
    # explode (exploding (id, offset, chars) rows would copy the chars
    # array into every offset row); array_distinct IS the per-doc
    # distinct the downstream expects
    window_hashes = F.array_distinct(
        F.transform(
            offsets,
            lambda o: F.md5(F.array_join(F.slice(chars, o, chunk), "")),
        )
    )
    chunks = (
        _spread(df.select(id_col, text_col))
        .filter(F.length(text) >= chunk)
        .select(
            F.col(id_col), text, F.split(text, "").alias("__chars__")
        )
        .select(
            F.col(id_col),
            text,
            chars,
            F.transform(chars, F.ascii).alias("__codes__"),
        )
        .select(F.col(id_col), F.explode(window_hashes).alias("__h__"))
    )
    if max_chunk_df is not None:
        hot = (
            chunks.groupBy("__h__")
            .agg(F.count(F.lit(1)).alias("__df__"))
            .filter(F.col("__df__") > max_chunk_df)
            .select("__h__")
        )
        chunks = chunks.join(F.broadcast(hot), "__h__", "left_anti")
    # lazy: the self-join sides are identical subtrees (one
    # ReusedExchange — no racing branches; eager A/B'd as overhead,
    # opt r14)
    chunks = track_cache(chunks.persist())
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__h__") == F.col("b.__h__"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_chunks"))
        .filter(F.col("n_shared_chunks") >= min_shared)
    )
    return _attach_cache(pairs, [chunks])


def split_content_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_mod: int = 8,
    min_tokens: int = 4,
) -> DataFrame:
    """Disjoint content-defined segmentation at TOKEN granularity: cut
    each document before every anchor token (md5 bucket of the token ≡
    0 mod ``anchor_mod`` — content-defined, so a verbatim passage cuts
    at the SAME relative positions in every doc containing it) into
    consecutive non-overlapping chunks of whole tokens.

    Token anchoring over char anchoring is a deliberate cost call: the
    anchor decision runs once per TOKEN (~len/6 interpreted
    higher-order-function evaluations per doc) instead of once per
    CHARACTER — a measured ~5× wall-clock difference at equal
    semantics, because Spark's HOF lambdas evaluate interpreted, never
    codegen'd. Tokens are split on the literal single space, so empty
    tokens survive round-trip (``split → join`` is byte-exact for any
    whitespace layout) and duplicated natural-text passages — which
    are token-aligned — still cut identically.

    ``min_tokens`` is the CDC minimum-chunk-size rule: an anchor is
    kept only if it sits ≥ min_tokens past the PREVIOUS anchor
    (previous of the first = the text start) — a local,
    offset-shift-invariant test, so shared passages still cut
    identically while pathological tiny chunks (single hot tokens
    would collide across every doc and let span-dedup mangle unrelated
    text) cannot occur. Only the FINAL chunk of a doc can carry fewer
    than min_tokens tokens.

    Returns (id, ord, chunk, n_toks): ``ord`` the 1-based chunk
    position, ``chunk`` the space-joined token run, ``n_toks`` its
    token count; joining chunks with a single space in ord order
    reproduces the text exactly. Docs with no anchors emit one
    whole-document chunk. All JVM-side and O(len) per doc.
    """
    text = F.col(text_col)
    toks = F.col("__toks__")
    n = F.size(toks)

    def _anchor_bucket(i: Column) -> Column:
        return (
            F.conv(
                F.substring(F.md5(F.element_at(toks, i)), 1, 4), 16, 10
            ).cast("int")
            % anchor_mod
            == 0
        )

    # candidate boundaries BEFORE tokens 2..n; sequence(2, 1) DESCENDS,
    # so single-token docs must yield an empty array explicitly
    anchors = F.when(
        n >= 2, F.filter(F.sequence(F.lit(2), n), _anchor_bucket)
    ).otherwise(F.array().cast("array<int>"))
    # two-argument filter lambda: (element, 0-based index). prev of
    # the first anchor is the text start; the index is guarded because
    # element_at(_, 0) throws under ANSI even inside the untaken
    # when-branch. The lambda reads the anchors array through a
    # CONCRETE COLUMN (__anch__, projected below), never the anchors
    # expression itself: a captured non-column expression re-evaluates
    # inside the lambda PER ELEMENT, which re-ran the whole md5 anchor
    # scan per anchor — O(tokens × anchors) per doc (measured 3.8× on
    # the boundary compute at sf0.1, opt r14; guide §4/§1.2 per-task
    # work).
    anch_col = F.col("__anch__")
    kept = F.filter(
        anch_col,
        lambda x, i: x
        - F.when(i == 0, F.lit(1)).otherwise(
            F.element_at(anch_col, F.greatest(i, F.lit(1)))
        )
        >= min_tokens,
    )
    bounds = F.concat(
        F.array(F.lit(1)),
        kept,
        F.array(n + 1),
    )
    pairs = F.arrays_zip(
        F.slice(bounds, 1, F.size(bounds) - 1).alias("s"),
        F.slice(bounds, 2, F.size(bounds) - 1).alias("e"),
    )
    chunks = F.transform(
        pairs,
        lambda p: F.struct(
            F.array_join(F.slice(toks, p["s"], p["e"] - p["s"]), " ").alias(
                "c"
            ),
            (p["e"] - p["s"]).alias("nt"),
        ),
    )
    # two-step projection: __toks__ is referenced n× by the anchor
    # filter and chunk slices — its own projection keeps it
    # materialized once per row (the same CollapseProject discipline
    # as _banded_signatures' __sh__)
    with_toks = (
        _spread(df.select(id_col, text_col))
        .filter(text.isNotNull() & (F.length(text) > 0))
        .select(F.col(id_col), F.split(text, " ", -1).alias("__toks__"))
        # anchors materialized as its own column so the kept-filter's
        # lambda reads it by reference (see comment above); referenced
        # twice, so CollapseProject leaves the projection in place
        .select(F.col(id_col), toks, anchors.alias("__anch__"))
    )
    return with_toks.select(
        F.col(id_col),
        F.posexplode(chunks).alias("__z__", "__u__"),
    ).select(
        id_col,
        (F.col("__z__") + 1).alias("ord"),
        F.col("__u__.c").alias("chunk"),
        F.col("__u__.nt").alias("n_toks"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_mod: int = 8,
    min_tokens: int = 4,
) -> DataFrame:
    """Rewrite each document with its DUPLICATED SPANS REMOVED — the
    removal half of substring dedup (the detection half is
    :func:`substring_chunk_pairs`): Lee et al. (ACL'22) remove the
    repeated passage, not the whole document, because the rest of the
    doc is usually unique and worth training on.

    Mechanism: :func:`split_content_chunks` partitions every doc at
    content-defined boundaries (identical passages cut identically
    regardless of offset), each chunk keeps iff ITS (doc, position) is
    the globally-first occurrence of the chunk's md5 — ordered by
    (id, ord), so the earliest doc keeps its text and later verbatim
    repeats (within a doc or across docs) drop — and survivors
    reassemble in position order, space-joined (chunks are whole-token
    runs). Joining every chunk of an all-unique doc reproduces it
    byte-identically.

    Scale shape: the first-occurrence winner per chunk hash is a HASH
    AGGREGATE (min of the (id, ord) struct), not a row_number window —
    a window partition on md5(chunk) funnels EVERY occurrence of a hot
    chunk (boilerplate repeats 1e7-1e8x on real web corpora) through
    one sorted reducer, while the aggregate collapses the hot key
    map-side (each task contributes one partial row regardless of
    occurrence count). The winner set — one (id, ord) position per
    distinct chunk — then re-keys to per-doc winner-ordinal sets and
    joins back ON THE DOC ID, a key that cannot be hot (docs are
    bounded) and that the final re-concat groupBy shares, so chunk
    text shuffles on doc-grain keys only; the chunk hash never keys a
    row-preserving shuffle at all. (The first de-skew draft joined the
    winners back on the hash itself, which re-concentrated every hot
    occurrence into one join partition — 57 s vs 35 s at 30x on the
    degenerate corpus; the full design table is in
    results/SCALING_CURVE.md.)
    The chunking scan feeds both consumers through ONE persisted
    materialization (the interpreted-HOF chunking is the dominant CPU
    term — re-executing it for the winner branch measured ~2× on the
    whole operator), and the winner aggregate shuffles only
    (hash, id, ord) partials.
    Chunks are >= min_tokens tokens by the CDC minimum-size rule
    (split_content_chunks) with no upper bound — a pathological
    anchor-free doc is one chunk, which a task must hold anyway to
    rewrite it.

    Chunks with FEWER than ``min_tokens`` tokens (only a doc's final
    chunk can be) are always kept: a sub-min_tokens tail is too little
    text to call a duplicated span (Lee et al. remove long verbatim
    overlap, not two-word suffixes), and deduping it would mangle
    unrelated docs that merely end alike.

    ``id_col`` must be UNIQUE per document (the operator's grain: the
    re-concat groups by it, and the winner sets key by it) — duplicate
    ids would interleave two documents' chunks into one rewritten row.

    Returns one row per input doc (empty/NULL docs excluded):
    (id, clean_text, n_chunks, n_kept) — ``clean_text`` is '' when
    every span was seen earlier (a verbatim duplicate of an
    earlier doc).
    """
    # Persisted once: the chunking scan (interpreted HOF anchors — the
    # operator's dominant CPU term, measured 13× across the r9 design
    # iterations) feeds TWO consumers below (the winner aggregate and
    # the join probe side); without the persist it would execute
    # twice. Same cache discipline as substring_chunk_pairs. Kept LAZY
    # after an eager A/B read wash-to-worse (opt r14): at bench scale
    # the doc-grain winners frame rides a broadcast build, which
    # sequences the two scans anyway.
    chunks = track_cache(
        split_content_chunks(
            df, id_col, text_col, anchor_mod, min_tokens
        )
        .withColumn("__h__", F.md5("chunk"))
        .persist()
    )
    pos = F.struct(F.col(id_col).alias("i"), F.col("ord").alias("o"))
    # min of the (id, ord) struct == lexicographically-first
    # occurrence, exactly the ordering the former row_number window
    # used; partial aggregation absorbs any hot chunk hash before the
    # exchange. The winner set then re-keys to the DOC GRAIN (each
    # winner is one (id, ord) position; positions are unique, so the
    # per-doc winner-ordinal sets are exact) and joins back on the doc
    # id — a join the chunk-hash side CANNOT make hot (docs are
    # bounded), and whose partitioning the final re-concat groupBy
    # reuses. Joining on the hash instead re-shuffles every occurrence
    # of a hot chunk into one partition — measured 57 s vs 35 s at 30×
    # on the degenerate corpus (results/SCALING_CURVE.md).
    winners = (
        chunks.groupBy("__h__")
        .agg(F.min(pos).alias("__w__"))
        .groupBy(F.col("__w__.i").alias(id_col))
        .agg(F.collect_set("__w__.o").alias("__wins__"))
    )
    kept = chunks.join(winners, id_col, "left").withColumn(
        "__keep__",
        F.coalesce(
            F.array_contains("__wins__", F.col("ord")), F.lit(False)
        )
        | (F.col("n_toks") < min_tokens),
    )
    # ONE conditional aggregation over all chunk rows (kept flag decides
    # what enters the re-concat; collect_list drops the NULLs the
    # un-kept rows produce) — a separate per-doc count frame would
    # re-execute the chunking lineage and pay a join
    out = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep__"), F.struct("ord", "chunk")
                        )
                    )
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("__keep__"), 1)).alias("n_kept"),
    )
    return _attach_cache(out, [chunks])


def remove_boilerplate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_mod: int = 8,
    min_tokens: int = 4,
    min_docs: int = 2,
    broadcast_frequent: bool = True,
) -> DataFrame:
    """Rewrite each document with its CORPUS-FREQUENT SPANS removed —
    the boilerplate filter of the C4/RefinedWeb recipe (Raffel et al.
    JMLR 2020 drop repeated three-sentence spans; Penedo et al. 2023
    and MassiveText strip lines recurring across documents: cookie
    banners, navigation chrome, license footers). The criterion is the
    complement of :func:`remove_duplicate_spans`: dedup keeps the
    FIRST occurrence of a repeated span, boilerplate removal drops
    EVERY occurrence of a span found in >= ``min_docs`` DISTINCT
    documents — recurring chrome is noise in all of its hosts, there
    is no "original" worth keeping. Intra-doc repetition alone never
    triggers it (that is doc_repetition_filter's job): the frequency
    is counted over distinct doc ids.

    Segmentation is the SAME content-defined chunking as the dedup
    half (:func:`split_content_chunks` — identical passages cut
    identically regardless of offset), so one primitive serves both
    criteria and the two rewrites compose. Sub-``min_tokens`` tails
    are always kept and never counted (too little text to call
    boilerplate — the dedup half's rule, same rationale).

    Scale shape: the frequent-span set is a HASH AGGREGATE
    (count(DISTINCT id) per chunk md5 — Spark's two-phase distinct
    spreads a hot span's occurrences over (hash, id) first, so no
    single reducer sees them all), threshold-pruned to the boilerplate
    tail. Under ``broadcast_frequent`` (default) the keep flag is then
    a map-side broadcast LEFT join straight on the chunk frame — zero
    additional shuffles between the chunking scan and the final
    doc-grain reassembly (measured: the first draft routed even the
    broadcast path through per-doc removal-ordinal sets and a doc-
    keyed join-back, paying a removals aggregate plus an SMJ whose
    sort carries the chunk TEXT — 17.7 s vs 15.3 s at 10× on the
    every-doc-hot corpus, where the doc-grain reassembly of every
    rewritten doc dominates both forms; the saved join matters more
    the smaller the affected-doc fraction). Set ``broadcast_frequent=False`` when the
    post-threshold span set could exceed driver memory (a
    template-farm crawl): that path probes the frequent set with only
    the NARROW (hash, id, ord) projection, aggregates removal
    ordinals per doc, and joins back ON THE DOC ID — chunk TEXT never
    shuffles by the chunk hash in either form (the r10 de-skew
    discipline); the one hash-keyed exchange that remains is the
    narrow triple probe, where a hot span's occurrences do land in
    one partition as 3-column rows — AQE's skew split parallelizes
    an oversized probe partition, and the triple width bounds the
    damage a text-carrying join would amplify.

    ``id_col`` must be UNIQUE per document (same grain contract as
    the dedup half). Returns one row per non-empty input doc:
    (id, clean_text, n_chunks, n_kept) — ``clean_text`` is '' when
    the whole document was corpus-frequent chrome.
    """
    if min_docs < 2:
        # min_docs=1 marks EVERY >= min_tokens span frequent — the
        # whole corpus rewrites to its sub-min_tokens tails, which is
        # never the intent (that degenerate "remove everything seen
        # once" is not a boilerplate criterion)
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # One persisted chunking scan feeds both consumers (frequency
    # aggregate + rewrite) — the dedup half's cache discipline; the
    # interpreted-HOF chunking is the dominant CPU term. Deliberately
    # NOT eager_cache (opt r14): the frequent set rides a broadcast
    # build, which must complete before the probe stage starts — the
    # build's scan materializes the cache, so the scans are already
    # sequenced (census: 28.8 CPU-s here vs 93.6 for the racing
    # remove_duplicate_spans twin over the same chunking).
    chunks = track_cache(
        split_content_chunks(df, id_col, text_col, anchor_mod, min_tokens)
        .withColumn("__h__", F.md5("chunk"))
        .persist()
    )
    frequent = (
        chunks.filter(F.col("n_toks") >= min_tokens)
        .groupBy("__h__")
        .agg(F.countDistinct(id_col).alias("__nd__"))
        .filter(F.col("__nd__") >= min_docs)
        .select("__h__", F.lit(True).alias("__f__"))
    )
    if broadcast_frequent:
        # map-side flag attach: the threshold-pruned set rides a
        # broadcast, so chunk rows take no shuffle at all before the
        # final doc-grain reassembly
        kept = chunks.join(F.broadcast(frequent), "__h__", "left")
    else:
        # no-broadcast path: probe with the narrow (hash, id, ord)
        # projection only, aggregate removal ordinals per doc, join
        # back on the doc id — the chunk hash never keys a
        # row-preserving shuffle even when the frequent set is too
        # big to broadcast
        removals = (
            chunks.select(id_col, "ord", "__h__")
            .join(frequent, "__h__")
            .groupBy(id_col)
            .agg(F.collect_set("ord").alias("__rm__"))
        )
        kept = chunks.join(removals, id_col, "left").withColumn(
            "__f__",
            F.when(
                F.coalesce(
                    F.array_contains("__rm__", F.col("ord")),
                    F.lit(False),
                ),
                F.lit(True),
            ),
        )
    kept = kept.withColumn(
        "__keep__",
        (F.col("n_toks") < min_tokens) | F.col("__f__").isNull(),
    )
    out = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep__"), F.struct("ord", "chunk")
                        )
                    )
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("__keep__"), 1)).alias("n_kept"),
    )
    return _attach_cache(out, [chunks])
