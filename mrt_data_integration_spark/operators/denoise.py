"""Denoising-objective training-pair generation (SURVEY.md §2.9 E10+):
T5-style span corruption — every document rewritten into an
``(input, target)`` pair where contiguous token spans are replaced by
numbered sentinel tokens in the input and collected (sentinel-prefixed)
in the target (Raffel et al. JMLR 2020 §3.1.4; the UL2 denoiser family
of Tay et al. 2023 is this op at other (window, span) settings).

Determinism contract: T5 samples spans with an RNG; a data ENGINE must
produce the same pair for the same document on any cluster, any
partitioning, any day — so spans here are placed by hashed-position
arithmetic instead of an RNG stream. Each complete ``window``-token
block masks exactly one ``span``-token run whose offset within the
block is ``md5(salt:id:block) % (window - span + 1)`` — the masked
fraction is exactly ``span/window`` (T5's 15% at the 3/20 default),
spans never overlap, and the whole computation is a map-side array
expression: one scan, no shuffle, no UDF, SQL-replayable (the same
md5-bucket arithmetic the CDC chunker hash-proofed).

Scale shape: pure map — the only cost is the tokenize + O(n_windows)
md5 calls per document; doc bodies never shuffle and the operator
composes with the shard sink for direct training-set materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def span_corruption_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    span: int = 3,
    salt: str = "t5",
) -> DataFrame:
    """Rewrite each document into a T5 span-corruption training pair.

    Every complete ``window``-token block contributes one masked
    ``span``-token run at a hashed offset; the input keeps the
    unmasked tokens with ``<extra_id_k>`` at the k-th span's position,
    the target is ``<extra_id_0> span0 <extra_id_1> span1 ...`` closed
    by a final ``<extra_id_n>`` terminator (T5's convention). The
    sub-``window`` tail of a document is never masked (and a document
    shorter than one window passes through unmasked with the bare
    terminator target) — the short-tail rule of the span-dedup family.

    De-corruption identity (pinned by test): substituting each
    ``<extra_id_k>`` in the input with the k-th target span
    reproduces the document byte-exactly.

    ``id_col`` must be unique per document (it seeds the span
    offsets). Sentinels are literal ``<extra_id_k>`` tokens (real T5
    reserves vocabulary IDs for them); a document whose own tokens
    collide with that surface form would make the pair ambiguous to
    decode — acceptable for corpus text, reserve-and-escape upstream
    if your corpus can contain them. Returns one row per non-empty
    input doc: (id, input_text, target_text, n_tokens, n_masked).
    """
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    if window <= span:
        # window == span would mask entire blocks back-to-back — the
        # degenerate "delete everything" objective, never the intent
        raise ValueError(
            f"window must exceed span, got window={window} span={span}"
        )
    n_offsets = window - span + 1

    text = F.coalesce(F.col(text_col), F.lit(""))
    # two-step projection: the token array is referenced by every
    # window lambda below — its own select keeps the tokenizer
    # materialized once per row (the r11 HOF-capture discipline)
    with_toks = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text) > 0))
        .select(
            F.col(id_col),
            F.split(F.col(text_col), " ", -1).alias("__toks__"),
        )
    )
    toks = F.col("__toks__")
    n = F.size(toks)
    n_win = F.floor(n / F.lit(window)).cast("long")
    wins = F.when(
        n_win >= 1, F.sequence(F.lit(0).cast("long"), n_win - 1)
    ).otherwise(F.array().cast("array<long>"))

    def _off(i: Column) -> Column:
        """Hashed span offset within block i — md5 of salt:id:block,
        first 4 hex chars, mod the legal offset count (the CDC
        anchor arithmetic, DuckDB-exact)."""
        h = F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.col(id_col).cast("string"),
                i.cast("string"),
            )
        )
        return (
            F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
            % n_offsets
        )

    def _sentinel(i: Column) -> Column:
        return F.concat(F.lit("<extra_id_"), i.cast("string"), F.lit(">"))

    def _input_block(i: Column) -> Column:
        base = (i * window).cast("int")
        off = _off(i)
        return F.concat(
            F.slice(toks, base + 1, off),
            F.array(_sentinel(i)),
            F.slice(toks, base + off + span + 1, window - span - off),
        )

    def _target_block(i: Column) -> Column:
        base = (i * window).cast("int")
        off = _off(i)
        return F.concat(
            F.array(_sentinel(i)), F.slice(toks, base + off + 1, span)
        )

    tail = F.slice(
        toks, (n_win * window + 1).cast("int"), (n - n_win * window).cast("int")
    )
    input_toks = F.concat(F.flatten(F.transform(wins, _input_block)), tail)
    target_toks = F.concat(
        F.flatten(F.transform(wins, _target_block)),
        F.array(_sentinel(n_win)),
    )
    return with_toks.select(
        F.col(id_col),
        F.array_join(input_toks, " ").alias("input_text"),
        F.array_join(target_toks, " ").alias("target_text"),
        n.cast("long").alias("n_tokens"),
        (n_win * span).cast("long").alias("n_masked"),
    )
