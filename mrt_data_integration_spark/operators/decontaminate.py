"""Benchmark decontamination + n-gram repetition — two training-data
pipeline operators (extensions beyond the reference, alongside
operators/dedup.py; cf. Gopher §A1.1 repetition filters, Rae et al.
2021, and the n-gram eval-overlap decontamination of GPT-3 appendix C /
Llama reports).

Everything is JVM-side array/string expressions except nothing — no
Python UDFs anywhere; hashes are MD5 (bit-identical across engines, so
DuckDB oracles can replay them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.dedup import _spread
from mrt_data_integration_spark.operators.text import tokens


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def word_ngrams(text: Column | str, n: int) -> Column:
    """Array of ALL n-word grams (space-joined, duplicates kept —
    unlike ``dedup.word_shingles`` which is distinct'd for set
    semantics). Empty array when the doc has fewer than n tokens.

    Built as ``arrays_zip`` of the n shifted ``slice``\\s of the token
    array, with the lambda touching only its own struct argument. The
    original form — ``transform(sequence(1, m), i -> concat_ws(' ',
    slice(toks, i, n)))`` — captures ``toks`` INSIDE the lambda, and
    interpreted HOF lambdas re-evaluate captured sub-expressions per
    element, re-running the regex tokenizer O(n_tokens) times per doc
    (measured 5-6× end-to-end on a single-split scan — the same
    expression-form hazard word_pairs documents)."""
    toks = tokens(text)
    if n == 1:
        return F.when(F.size(toks) >= 1, toks).otherwise(
            F.array().cast("array<string>")
        )
    m = F.size(toks) - (n - 1)
    z = F.arrays_zip(
        *[F.slice(toks, F.lit(i + 1), m).alias(f"w{i}") for i in range(n)]
    )
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_repetition(text: Column | str, n: int = 2) -> Column:
    """Duplicate n-gram fraction: 1 − |distinct grams| / |grams| — the
    Gopher-style within-document repetition signal at n-gram (not just
    token) granularity. NULL when the doc has fewer than n tokens (no
    gram universe to measure)."""
    grams = word_ngrams(text, n)
    return F.when(
        F.size(grams) > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
    ).otherwise(F.lit(None).cast("double"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_col: str = "contaminated",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing ≥1 word n-gram with ANY benchmark doc
    (test-set leakage removal before training).

    Scale shape: both sides explode to (id, md5(gram)) — fixed-width
    hashes, never the gram strings, cross the wire; the benchmark side
    is distinct'd (eval sets are small → broadcast by default, making
    the contamination check a map-side semi-join with ZERO shuffle of
    the corpus). Contaminated doc_ids (a tiny set) then broadcast back
    onto the corpus, so document bodies never shuffle at any scale.
    Set ``broadcast_benchmark=False`` for corpus-vs-corpus runs; the
    semi-join then shuffles (id, hash) pairs only.
    """
    # explode_outer + post-filter instead of explode (opt r15): when
    # the gram array is materialized as a column with a computed
    # sibling (contamination_overlap's shape), the optimizer infers a
    # size()>0 filter from the Generate and pushes it below the
    # projection by SUBSTITUTING the column definition — re-running
    # the whole gram construction a second time per document (guide
    # §4.4's filter-duplication class). The inline-explode shape used
    # here never triggered the inference (before-plans verified), but
    # every site in this module takes the same rewrite so a future
    # column-materializing refactor cannot silently introduce it.
    # explode_outer infers nothing; the post-filter drops exactly the
    # empty-array rows explode dropped (md5 gram elements are never
    # NULL), reading the generated column only.
    c_grams = _spread(corpus).select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(
                F.transform(word_ngrams(text_col, ngram_n), F.md5)
            )
        ).alias("__gh__"),
    ).filter(F.col("__gh__").isNotNull())
    b_grams = benchmark.select(
        F.explode_outer(
            F.array_distinct(
                F.transform(word_ngrams(text_col, ngram_n), F.md5)
            )
        ).alias("__gh__")
    ).filter(F.col("__gh__").isNotNull()).distinct()
    if broadcast_benchmark:
        b_grams = F.broadcast(b_grams)
    hits = (
        c_grams.join(b_grams, "__gh__", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit__", F.lit(True))
    )
    flagged = corpus.join(F.broadcast(hits), id_col, "left")
    return flagged.withColumn(
        flag_col, F.coalesce(F.col("__hit__"), F.lit(False))
    ).drop("__hit__")


def _distinct_gram_hashes(
    df: DataFrame, ngram_n: int, text_col: str
) -> DataFrame:
    """One column ``__gh__``: the distinct md5 n-gram hashes of a
    corpus — the frame both the bloom build and the exact verify
    consume (compute once, persist across the two)."""
    return (
        df.select(
            F.explode_outer(
                F.array_distinct(
                    F.transform(word_ngrams(text_col, ngram_n), F.md5)
                )
            ).alias("__gh__")
        )
        .filter(F.col("__gh__").isNotNull())  # the r15 explode rewrite
        .distinct()
    )


def build_ngram_bloom(
    benchmark: DataFrame,
    ngram_n: int = 3,
    n_bits: int = 1 << 18,
    n_hashes: int = 3,
    text_col: str = "text",
    grams: DataFrame | None = None,
) -> list[int]:
    """Bloom filter over the benchmark's md5 n-gram hashes, as a
    ``n_bits/64``-long bitmap the caller broadcasts.

    Built DISTRIBUTEDLY: gram hashes explode to their ``n_hashes`` bit
    positions (md5 hex slices mod ``n_bits`` — deterministic, no RNG),
    positions group to 64-bit words with a ``bit_or`` of shifted ones,
    and only the words (≤ ``n_bits/64`` rows — bounded by CONFIG, not
    data) are collected. At 100 TB the benchmark never funnels through
    the driver; the driver holds ``n_bits/8`` bytes regardless of
    benchmark size — the whole point vs broadcasting the exact hash
    set (a 1 B-gram benchmark is ~32 GB of md5s; a 2^30-bit bloom is
    128 MB at ~1% FP for that load).

    ``grams``: optionally a precomputed distinct gram-hash frame
    (column ``__gh__``) — :func:`decontaminate_bloom` passes its
    persisted verify-side frame so the benchmark is scanned once.
    """
    if n_hashes < 1 or n_hashes > 4:
        raise ValueError("n_hashes must be 1-4 (md5 yields four 32-bit slices)")
    if n_bits < 64 or n_bits & (n_bits - 1):
        raise ValueError(
            f"n_bits must be a power of two >= 64 (whole 64-bit words), "
            f"got {n_bits}"
        )
    if grams is None:
        grams = _distinct_gram_hashes(benchmark, ngram_n, text_col)
    positions = grams.select(
        F.explode(
            F.array(
                *[
                    (
                        F.conv(F.substring("__gh__", 1 + 8 * i, 8), 16, 10)
                        .cast("long")
                        % n_bits
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("__p__")
    )
    # the python shiftleft() wrapper demands a literal shift count; the
    # SQL function takes a column — go through expr
    words = positions.groupBy(
        (F.col("__p__") / 64).cast("long").alias("__w__")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(__p__ % 64 as int))")
        ).alias("__bits__")
    )
    bitmap = [0] * (n_bits // 64)
    for r in words.collect():  # bounded: <= n_bits/64 rows (config)
        bitmap[r["__w__"]] = r["__bits__"]
    return bitmap


def _bloom_gate(
    hash_col: str, bloom_col: str, n_bits: int, n_hashes: int
):
    """Boolean column: every one of the hash's bit positions is set in
    the bitmap array column. All codegen-side; shift counts are
    data-dependent, so the shifts go through SQL expr (the python
    shiftright wrapper only takes literal counts). `>> b & 1` is
    sign-safe: arithmetic shift sign-extends, the mask keeps bit 0."""
    gate = None
    for i in range(n_hashes):
        p = (
            f"(cast(conv(substring({hash_col}, {1 + 8 * i}, 8), 16, 10) "
            f"as bigint) % {n_bits})"
        )
        bit = F.expr(
            f"(shiftright(element_at({bloom_col}, "
            f"cast({p} / 64 as int) + 1), cast({p} % 64 as int)) & 1) = 1"
        )
        gate = bit if gate is None else gate & bit
    return gate


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_col: str = "contaminated",
    n_bits: int | None = None,
    n_hashes: int = 3,
) -> DataFrame:
    """:func:`decontaminate` for benchmarks too big to broadcast as an
    exact hash set: a two-phase gate whose OUTPUT IS STILL EXACT.

    Phase 1 (map-only): every corpus gram hash probes a Bloom filter
    over the benchmark grams — ``n_bits/8`` bytes broadcast as a
    single-row frame, tested with ``element_at``/``shiftright``/``&``
    expressions inside codegen. Phase 2: only the Bloom SURVIVORS
    (true hits + the FP rate's worth of noise) enter the exact
    semi-join against the benchmark gram hashes, so the corpus-side
    shuffle shrinks from ALL grams to ~|hits|. False positives are
    eliminated by the exact verify — the result equals
    :func:`decontaminate` bit for bit (the identity a test pins), so
    the same SQL oracle covers both paths.

    When to use which (measured — results/LATE_R9_NOTES.md): the gate
    pays a bitmap-build scan plus 3 hex-slice probes per corpus gram,
    so with a SMALL benchmark (exact gram set in the low millions of
    rows) plain :func:`decontaminate` wins — broadcast or shuffle.
    This path earns its keep when the exact hash set is too big to
    broadcast (corpus-vs-corpus decontamination, GB-scale gram sets)
    while the bitmap still fits in n_bits/8 bytes at ANY benchmark
    size.

    The benchmark's distinct gram-hash frame feeds TWO consumers (the
    bitmap build's collect and the verify join) — persisted so the
    benchmark is tokenized/exploded/distinct'd once, not twice; the
    returned frame carries the cache handle (release_cache frees it,
    same discipline as the dedup family).

    ``n_bits=None`` (default) auto-sizes the filter from the
    benchmark's measured distinct gram count at ~10 bits/gram
    (≈1.7% FP with 3 hashes), clamped to [2^18, 2^30] — a fixed small
    bitmap saturates (FP→1) at exactly the GB-scale gram sets this
    operator exists for. Pass an explicit power of two to pin it
    (tests exercising FP pressure do).
    """
    from mrt_data_integration_spark.cache_registry import (
        attach_cache,
        track_cache,
    )

    b_grams = track_cache(
        _distinct_gram_hashes(benchmark, ngram_n, text_col).persist()
    )
    if n_bits is None:
        # Auto-size from the benchmark's ACTUAL distinct gram count
        # (the frame is persisted and feeds the bitmap build and the
        # exact verify anyway, so the count is one cheap action over
        # it): ~10 bits per gram ≈ 1.7% FP at 3 hashes. A fixed small
        # default saturates at the operator's motivating scale — FP→1,
        # the gate passes everything, and the path is strictly slower
        # than plain decontaminate while output stays exact (ADVICE
        # r9). Floor 2^18 (32 KB) keeps tiny benchmarks cheap; cap
        # 2^30 (128 MB broadcast — the docstring's own motivating
        # size) bounds the driver and broadcast: past ~100M grams the
        # FP rate degrades gracefully and the exact verify still makes
        # the OUTPUT exact, only the prune ratio suffers.
        n_grams = b_grams.count()
        n_bits = 1 << max(18, min(30, (10 * max(n_grams, 1) - 1).bit_length()))
    bitmap = build_ngram_bloom(
        benchmark, ngram_n, n_bits, n_hashes, text_col, grams=b_grams
    )
    spark = corpus.sparkSession
    bloom_df = spark.createDataFrame([(bitmap,)], "__bloom__ array<bigint>")
    c_grams = _spread(corpus).select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(
                F.transform(word_ngrams(text_col, ngram_n), F.md5)
            )
        ).alias("__gh__"),
    ).filter(F.col("__gh__").isNotNull())  # the r15 explode rewrite
    gate = _bloom_gate("__gh__", "__bloom__", n_bits, n_hashes)
    survivors = (
        c_grams.join(F.broadcast(bloom_df))  # 1 row: map-side constant
        .filter(gate)
        .select(id_col, "__gh__")
    )
    hits = (
        survivors.join(b_grams, "__gh__", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit__", F.lit(True))
    )
    flagged = corpus.join(F.broadcast(hits), id_col, "left")
    out = flagged.withColumn(
        flag_col, F.coalesce(F.col("__hit__"), F.lit(False))
    ).drop("__hit__")
    return attach_cache(out, [b_grams])


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_col: str = "contaminated",
    min_overlap: float = 0.0,
    broadcast_benchmark: bool = True,
    broadcast_hits: bool = True,
) -> DataFrame:
    """GRADED decontamination: per-doc contamination fraction, not just
    a binary hit — |distinct doc grams ∩ benchmark grams| / |distinct
    doc grams| — with the flag raised when the fraction exceeds
    ``min_overlap``.

    The binary rule (:func:`decontaminate`, GPT-3 appendix C) drops a
    10k-token document over one unlucky 8-gram; production pipelines
    (The Pile, Llama reports) instead threshold the OVERLAP FRACTION so
    incidental collisions survive while real test-set copies (high
    fraction) drop. ``min_overlap=0.0`` reproduces the binary rule
    exactly (any hit ⇒ fraction > 0), the identity a test pins.

    Scale shape = :func:`decontaminate`'s with one extra map-side
    column: the per-doc distinct-gram count rides the exploded gram
    rows (computed once per doc before the explode), the semi-join
    against the (broadcast) benchmark grams counts hits per doc, and
    the tiny hit-count frame broadcasts back onto the corpus — bodies
    never shuffle. Docs shorter than ``ngram_n`` tokens have no gram
    universe: ``overlap_frac`` is NULL and the flag false (the
    ``ngram_repetition`` NULL convention).

    Unlike the binary path — where the hit frame holds only
    CONTAMINATED ids — the graded hit frame carries a row for EVERY
    doc with at least one incidental gram collision, which on a
    heavily-overlapping corpus approaches corpus size. ``broadcast_
    hits=True`` (the default, right for benchmark-sized collision
    sets) force-broadcasts that frame for the join-back; set it False
    on large/overlapping corpora to take a plain (id)-keyed shuffle
    join instead of an OOM-risking driver broadcast.

    Returns corpus + ``overlap_frac`` (double) + ``flag_col``.
    """
    doc_grams = (
        _spread(corpus.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.array_distinct(
                F.transform(word_ngrams(text_col, ngram_n), F.md5)
            ).alias("__gs__"),
        )
        .withColumn("__n__", F.size("__gs__"))
    )
    c_grams = doc_grams.select(
        id_col, "__n__", F.explode_outer("__gs__").alias("__gh__")
    ).filter(F.col("__gh__").isNotNull())  # the r15 explode rewrite
    b_grams = benchmark.select(
        F.explode_outer(
            F.array_distinct(
                F.transform(word_ngrams(text_col, ngram_n), F.md5)
            )
        ).alias("__gh__")
    ).filter(F.col("__gh__").isNotNull()).distinct()  # r15 explode rewrite
    if broadcast_benchmark:
        b_grams = F.broadcast(b_grams)
    hits = (
        c_grams.join(b_grams, "__gh__", "left_semi")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__hits__"),
            F.first("__n__").alias("__n__"),
        )
        .select(
            id_col,
            (F.col("__hits__") / F.col("__n__")).alias("__frac__"),
        )
    )
    flagged = corpus.join(
        F.broadcast(hits) if broadcast_hits else hits, id_col, "left"
    )
    # distinguish "no hits" (fraction 0) from "no gram universe" (NULL):
    # the doc-length gate is recomputed map-side on the corpus row
    has_grams = F.size(tokens(text_col)) >= ngram_n
    frac = F.when(
        has_grams, F.coalesce(F.col("__frac__"), F.lit(0.0))
    ).otherwise(F.lit(None).cast("double"))
    return (
        flagged.withColumn("overlap_frac", frac)
        .withColumn(
            flag_col,
            F.coalesce(
                F.col("overlap_frac") > F.lit(float(min_overlap)),
                F.lit(False),
            ),
        )
        .drop("__frac__")
    )


def semantic_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """EMBEDDING-space decontamination — the semantic complement of the
    n-gram overlap gates above (the contamination screens in GPT-4 /
    Llama-style reports that catch paraphrased eval leakage exact-match
    n-grams miss): every corpus vector's max cosine against the
    benchmark set, flagged at ``threshold``.

    Output grain: one row per corpus vector with a non-NULL embedding —
    (id_col, max_bench_sim rounded to 4, contaminated). An empty
    benchmark yields an empty frame (no rows to screen against).

    Scale shape: the benchmark is SMALL by construction (an eval set),
    so it ships broadcast into a corpus-scan pass whose per-row max
    collapses INSIDE the Arrow kernel (opt r14) — one map-side pass,
    no pair frame, no exchange at all; vectors never shuffle.
    ``broadcast_benchmark=False`` is the escape hatch for a benchmark
    too big to broadcast — it keeps the crossJoin + JVM-fold +
    partial-max-aggregate shape — and at that size use
    :func:`semantic_decontamination_ivf` (cell-bounded candidates)
    instead of an all-pairs crossJoin.

    Both paths' cosines are bit-identical to DuckDB's sequential
    list_dot_product (the exactness/speed trade the cosine family
    settled in r7): the JVM path folds zip_with/aggregate, the kernel
    accumulates column-sequentially (pinned in tests/test_similarity
    .py::test_broadcast_cosine_kernel_bit_identical_to_fold), so the
    DuckDB oracle replays this end-to-end either way. Output grain on
    the kernel path is one row per corpus ROW (ids are expected
    unique; the fold path's groupBy collapsed malformed duplicate ids
    — duplicates are out of contract on both).
    """
    from mrt_data_integration_spark.operators.similarity import (
        broadcast_max_cosine,
        dot,
        norm,
    )

    if broadcast_benchmark:
        # Arrow column-sequential kernel with the max folded inside
        # (opt r14, guide §4.2): cosines bit-identical to the
        # zip_with/aggregate fold below (pinned in
        # tests/test_similarity.py), max order-independent with
        # Spark-identical NaN propagation — and the per-row collapse
        # happens IN the kernel, so the pair frame and its partial-max
        # exchange are gone (plan: crossJoin + HashAggregate×2 +
        # Exchange → PythonMapInArrow + round/threshold Project).
        # The benchmark collects to the driver — the same envelope as
        # the F.broadcast hint this replaces.
        scored = broadcast_max_cosine(
            corpus.filter(F.col(vec_col).isNotNull()),
            benchmark.filter(F.col(vec_col).isNotNull()),
            id_col=id_col,
            vec_col=vec_col,
            score_col="__max__",
        )
        return scored.select(
            id_col,
            F.round(F.col("__max__"), 4).alias("max_bench_sim"),
        ).withColumn(
            "contaminated",
            F.col("max_bench_sim") >= F.lit(float(threshold)),
        )
    # norms precomputed BEFORE the crossJoin (the brute_force/margin
    # convention): the per-pair expression is ONE fold + a divide, not
    # three — a post-join cosine() recomputed both norms per pair AND
    # tripled the codegen unit (measured ~3.7 s/shot of recompile at
    # bench scale; ~0.7 s with the norms hoisted)
    b = benchmark.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).alias("__bvec__"),
        norm(vec_col).alias("__bn__"),
    )
    pairs = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(vec_col).alias("__cvec__"),
            norm(vec_col).alias("__cn__"),
        )
        .crossJoin(b)
    )
    cos = dot("__cvec__", "__bvec__") / (
        F.col("__cn__") * F.col("__bn__")
    )
    return (
        pairs.groupBy(id_col)
        .agg(F.round(F.max(cos), 4).alias("max_bench_sim"))
        .withColumn(
            "contaminated",
            F.col("max_bench_sim") >= F.lit(float(threshold)),
        )
    )


def semantic_decontamination_ivf(
    corpus_assigned: DataFrame,
    benchmark: DataFrame,
    centers: list[list[float]],
    threshold: float = 0.35,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """:func:`semantic_decontamination` through an IVF cell probe — the
    corpus-scale path when benchmark × corpus is too big even for the
    map-side collapse: the corpus carries a cell index (``cell_col`` +
    the matching ``centers``, any (assignments, centers) pair — the
    hard-negative family's train/probe split), each benchmark vector
    probes its ``n_probe`` nearest cells, and only corpus vectors in
    probed cells are scored.

    The approximation is ONE-SIDED: candidates are a subset of the
    brute pairs, so the flagged set is a subset of the brute flagged
    set (missed cells can only lower max_bench_sim — pinned by test),
    and ``n_probe == len(centers)`` reproduces the brute output
    exactly. Corpus vectors in cells no benchmark vector probes keep
    max_bench_sim NULL with ``contaminated = false`` (nothing probed
    them — the honest boundary, same convention as the margin family's
    backward hole).

    Plan shape (opt r15, guide §4.2 + §2.4): ONE map-side pass — the
    cell-restricted Arrow max-cosine kernel
    (similarity.broadcast_cell_max_cosine) folds probe selection, the
    per-cell candidate bound and the per-row max into the corpus scan,
    so the former cell equi-join (+ broadcast build), the per-id max
    aggregate's exchange and the left join-back (two exchanges + a
    sort-merge join + their AQE job barriers) no longer exist. Probe
    selection still runs the exact :func:`nearest_cells` expression;
    cosines are bit-identical to the dot/norm fold form (the kernel
    family's pinned contract); output grain is one row per corpus ROW
    with a non-NULL vector (ids are expected unique — the fold path's
    groupBy collapsed malformed duplicate ids; duplicates are out of
    contract on both, the broadcast_max_cosine precedent).
    """
    from mrt_data_integration_spark.operators.similarity import (
        broadcast_cell_max_cosine,
    )

    scored = broadcast_cell_max_cosine(
        corpus_assigned.filter(F.col(vec_col).isNotNull()),
        benchmark.filter(F.col(vec_col).isNotNull()),
        centers,
        n_probe,
        id_col=id_col,
        vec_col=vec_col,
        cell_col=cell_col,
        score_col="__max__",
    )
    return scored.select(
        id_col,
        F.round(F.col("__max__"), 4).alias("max_bench_sim"),
    ).withColumn(
        "contaminated",
        F.coalesce(
            F.col("max_bench_sim") >= F.lit(float(threshold)),
            F.lit(False),
        ),
    )
