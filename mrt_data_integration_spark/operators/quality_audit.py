"""Declarative data-quality constraint auditing (SURVEY.md §2,
pipeline-QA extension — the Deequ/Great-Expectations shape re-expressed
Spark-first).

A constraint suite compiles to the MINIMUM number of passes the
constraint classes allow — the design point that separates this from
metric-at-a-time checking (one scan per metric, the naive shape, is
a non-starter at 100 TB):

- ALL row-level predicates on a table fold into ONE aggregate scan
  (`row_checks`): each constraint is a `sum(when(violation, 1))`
  column of the same agg, unpivoted to constraint-grain rows by an
  array-explode of the 1-row result (map-side, trivial).
- Uniqueness (`uniqueness_check`) is a two-level partial aggregate
  (key-grain count → sum of excess) — never a count-distinct expand
  over the scan.
- Referential integrity (`referential_check`) is ONE left join against
  the deduplicated parent key set with a hit marker + conditional
  count — violations and the checked-row total come out of the same
  pass; AQE broadcasts the parent side when it is small (no hint —
  the parent key set is unbounded in principle, the tfidf_top_terms
  gating argument).
- Cross-table consistency (`join_violation_check`) is ONE inner join
  + conditional count.

Every helper emits the same constraint-grain schema
(check_name, table_name, n_rows, n_violations, violation_rate, passed)
so suites compose by `unionByName` — output is bounded by the number
of constraints, never by the data.

Contracts: a NULL child key never matches a parent (SQL join
semantics) and therefore counts as a referential violation —
completeness of the key itself belongs in a row_checks NULL predicate
if wanted separately; an empty checked set yields violation_rate NULL
with passed = true (vacuously satisfied — the honest-NULL convention
of the drift family).

Reference parity: the reference engine has no constraint-audit
surface (eastonhuch/mrt-data-integration is the MRT estimator suite);
this family belongs to the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA_COLS = (
    "check_name",
    "table_name",
    "n_rows",
    "n_violations",
    "violation_rate",
    "passed",
)


def _finalize(df: DataFrame) -> DataFrame:
    rate = F.when(
        F.col("n_rows") > 0,
        F.round(F.col("n_violations").cast("double") / F.col("n_rows"), 6),
    )
    return df.select(
        "check_name",
        "table_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        rate.alias("violation_rate"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def row_check_counts(
    df: DataFrame,
    table_name: str,
    checks: list[tuple[str, Column]],
) -> DataFrame:
    """The mergeable sufficient statistic of :func:`row_checks`:
    constraint-grain (check_name, table_name, n_rows, n_violations)
    rows — counts add, so partial statistics from disjoint slices (or
    micro-batches; see streaming/audit.py) union-sum to the corpus
    statistic. ONE aggregate scan for all checks."""
    aggs = [F.count(F.lit(1)).alias("__n__")] + [
        F.coalesce(
            F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)),
            F.lit(0),  # empty set: zero violations (vacuously passed)
        ).alias(f"__v{i}__")
        for i, (_, cond) in enumerate(checks)
    ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"__v{i}__").alias("n_violations"),
            )
            for i, (name, _) in enumerate(checks)
        ]
    )
    return (
        one.select(F.col("__n__").alias("n_rows"), F.explode(rows).alias("c"))
        .select(
            F.col("c.check_name").alias("check_name"),
            F.lit(table_name).alias("table_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("c.n_violations").cast("long").alias("n_violations"),
        )
    )


def merge_check_counts(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Union-sum two constraint-grain count frames (counts add — the
    merge the streaming drain applies per micro-batch)."""
    return (
        prev.unionByName(cur)
        .groupBy("check_name", "table_name")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_violations").cast("long").alias("n_violations"),
        )
    )


def audit_from_counts(counts: DataFrame) -> DataFrame:
    """Finalize constraint-grain counts into the audit schema — shared
    VERBATIM between the batch path and the streaming drain (so
    stream == batch exactly, the drift-family convention)."""
    return _finalize(counts)


def row_checks(
    df: DataFrame,
    table_name: str,
    checks: list[tuple[str, Column]],
) -> DataFrame:
    """ALL row-level constraints on one table in ONE aggregate scan.

    ``checks`` is a list of (constraint_name, violation_predicate) —
    the predicate marks VIOLATING rows; a NULL predicate result counts
    as a violation (checks must decide NULL explicitly or inherit
    this conservative default). Predicates should be built from
    ``F.col`` (not bound to a specific frame) so the same spec drives
    the streaming drain.
    """
    return audit_from_counts(row_check_counts(df, table_name, checks))


def uniqueness_check(
    df: DataFrame, table_name: str, constraint: str, keys: list[str]
) -> DataFrame:
    """Key uniqueness as a two-level partial aggregate: violations =
    Σ (group count − 1) over duplicated key groups (the number of rows
    that would have to be dropped to restore uniqueness)."""
    grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt__"))
    out = grouped.agg(
        F.sum("__cnt__").alias("n_rows"),
        F.coalesce(
            F.sum(
                F.when(F.col("__cnt__") > 1, F.col("__cnt__") - 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_violations"),
    ).select(
        F.lit(constraint).alias("check_name"),
        F.lit(table_name).alias("table_name"),
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        "n_violations",
    )
    return _finalize(out)


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    table_name: str,
    constraint: str,
    child_keys: list[str],
    parent_keys: list[str],
) -> DataFrame:
    """FK ⊆ PK as ONE left join + conditional count: child keys join
    the deduplicated parent key set carrying a hit marker; violations
    and the total come from the same pass. NULL child keys never match
    and count as violations (documented contract)."""
    pk = (
        parent.select(
            *[F.col(p).alias(c) for c, p in zip(child_keys, parent_keys)]
        )
        .dropDuplicates(child_keys)
        .withColumn("__hit__", F.lit(1))
    )
    joined = child.select(*child_keys).join(pk, child_keys, "left")
    out = joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("__hit__").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("n_violations"),
    ).select(
        F.lit(constraint).alias("check_name"),
        F.lit(table_name).alias("table_name"),
        "n_rows",
        "n_violations",
    )
    return _finalize(out)


def join_violation_check(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    table_name: str,
    constraint: str,
    violation: Column,
) -> DataFrame:
    """Cross-table row consistency over the INNER join of two tables
    (e.g. every lineitem must ship on/after its order's date):
    one equi-join + conditional count; ``n_rows`` is the joined rows
    examined. A NULL predicate result counts as a violation."""
    cond = None
    for lc, rc in on:
        c = left[lc] == right[rc]
        cond = c if cond is None else (cond & c)
    joined = left.join(right, cond)
    out = joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.coalesce(violation, F.lit(True)), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_violations"),
    ).select(
        F.lit(constraint).alias("check_name"),
        F.lit(table_name).alias("table_name"),
        "n_rows",
        "n_violations",
    )
    return _finalize(out)


def combine_audit(*frames: DataFrame) -> DataFrame:
    """Union constraint-grain audit frames into one suite result."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(*_SCHEMA_COLS)
