"""Per-document token-diversity profile — the lexical-health signals
quality pipelines threshold on (low-entropy / low-TTR documents are
keyword stuffing, boilerplate, or generation loops; the signals
complement the n-gram repetition filter, which sees REPEATED SPANS,
where these see a COLLAPSED DISTRIBUTION even when no span repeats):

- ``n_tokens`` / ``n_types``: token and distinct-token counts;
- ``ttr``: type-token ratio (n_types / n_tokens);
- ``top_frac``: most frequent token's share (mode collapse signal);
- ``entropy``: Shannon entropy of the unigram distribution in nats,
  computed as ln(n) − (Σ c·ln c)/n — the integer-count form that
  needs exactly ONE float summation;
- ``simpson``: Gini–Simpson diversity 1 − Σc²/n² — all-integer sums
  until one final division (exact across engines by construction).

Scale + determinism design: a PURE MAP — zero shuffles (the
winnow_profile class). Each document's counts come from a sequential
fold over its SORTED token array (run-length encoding in one
``aggregate`` pass), so the one float sum (Σ c·ln c) accumulates in
sorted-token order — a fixed, engine-replayable order. A groupBy
formulation would shuffle (doc, token) pairs AND make the float sum
order depend on shuffle fetch order, i.e. run-nondeterministic — the
exact failure mode the cosine family's sequential-fold convention
exists to prevent. The fold lambdas touch only the materialized
sorted-array column and the accumulator (the materialize-then-lambda
HOF discipline; the token split never enters a lambda).

Rows with NULL text are excluded (a distribution over no tokens has
no profile — and the SQL replay's unnest would silently drop them,
so the exclusion keeps both engines at the same grain by contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.text import tokens


def _step(acc: Column, t: Column) -> Column:
    """RLE fold step over sorted tokens: extend the current run or
    flush it into the running aggregates and start a new one."""
    same = acc["prev"].isNotNull() & (t == acc["prev"])
    flush = ~same & (acc["c"] > 0)
    cd = acc["c"].cast("double")
    return F.struct(
        t.alias("prev"),
        F.when(same, acc["c"] + 1)
        .otherwise(F.lit(1).cast("long"))
        .alias("c"),
        (acc["types"] + F.when(flush, 1).otherwise(0))
        .cast("long")
        .alias("types"),
        F.when(flush & (acc["c"] > acc["maxc"]), acc["c"])
        .otherwise(acc["maxc"])
        .alias("maxc"),
        (acc["sumc2"] + F.when(flush, acc["c"] * acc["c"]).otherwise(0))
        .cast("long")
        .alias("sumc2"),
        (acc["slnc"] + F.when(flush, cd * F.log(cd)).otherwise(0.0))
        .alias("slnc"),
    )


def _finish(acc: Column) -> Column:
    """Flush the final run."""
    has = acc["c"] > 0
    cd = acc["c"].cast("double")
    return F.struct(
        (acc["types"] + F.when(has, 1).otherwise(0))
        .cast("long")
        .alias("types"),
        F.when(has & (acc["c"] > acc["maxc"]), acc["c"])
        .otherwise(acc["maxc"])
        .alias("maxc"),
        (acc["sumc2"] + F.when(has, acc["c"] * acc["c"]).otherwise(0))
        .cast("long")
        .alias("sumc2"),
        (acc["slnc"] + F.when(has, cd * F.log(cd)).otherwise(0.0))
        .alias("slnc"),
    )


def token_diversity_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_tokens, n_types, ttr, top_frac, entropy, simpson)
    per document with non-NULL text; ratios/entropy rounded to 6 (the
    float-combination discipline)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("c"),
        F.lit(0).cast("long").alias("types"),
        F.lit(0).cast("long").alias("maxc"),
        F.lit(0).cast("long").alias("sumc2"),
        F.lit(0.0).alias("slnc"),
    )
    srt = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(text_col).alias("__ts__"))
        .select(
            F.col(id_col),
            F.size("__ts__").cast("long").alias("n_tokens"),
            F.sort_array("__ts__").alias("__st__"),
        )
    )
    folded = srt.select(
        id_col,
        "n_tokens",
        F.aggregate(F.col("__st__"), init, _step, _finish).alias("__r__"),
    )
    n = F.col("n_tokens").cast("double")
    return folded.select(
        id_col,
        "n_tokens",
        F.col("__r__.types").alias("n_types"),
        F.round(F.col("__r__.types").cast("double") / n, 6).alias("ttr"),
        F.round(F.col("__r__.maxc").cast("double") / n, 6).alias(
            "top_frac"
        ),
        F.round(F.log(n) - F.col("__r__.slnc") / n, 6).alias("entropy"),
        F.round(
            F.lit(1.0) - F.col("__r__.sumc2").cast("double") / (n * n), 6
        ).alias("simpson"),
    )
