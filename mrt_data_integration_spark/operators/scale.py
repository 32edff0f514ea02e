"""Scale-hardening operators: skew-salted aggregation/joins and
bucketed co-located joins (SURVEY.md §2.9 E1 scale path).

These are the knobs a 100 TB deployment reaches for when AQE alone
isn't enough:

- **Salting** decomposes a skewed-key aggregation into
  (key, salt)-partial → key-final (two shuffles, each balanced), and a
  skewed join into a salt-exploded broadcast-ish join.
- **Bucketing** pre-shuffles a fact table ONCE at write time into
  hash buckets on the join/agg key; subsequent joins between tables
  bucketed the same way run with no exchange at all (verified by plan
  in tests/test_scale_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_sum(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof grouped sum: rows scatter across
    ``n_salts`` sub-keys (partial agg shards hot keys across tasks),
    then partials re-aggregate by the true key. Only SUM/COUNT-like
    (commutative, re-aggregatable) expressions are valid here.
    """
    salt = (F.rand(seed=7) * n_salts).cast("int")
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*key_cols, "__salt__")
        .agg(*[e.alias(n) for n, e in agg_exprs.items()])
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(n).alias(n) for n in agg_exprs]
    )


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed equi-join: fact rows take a random salt; the (small) dim
    side replicates across all salts, so a hot key's rows spread over
    ``n_salts`` tasks instead of one straggler. Use when the dim side
    is too big to broadcast outright but small enough to replicate
    ``n_salts``× across the shuffle."""
    f = fact.withColumn("__salt__", (F.rand(seed=11) * n_salts).cast("int"))
    d = dim.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, (F.col(fact_key) == F.col(dim_key)) & (f["__salt__"] == d["__salt__"])).drop(
        "__salt__"
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on the
    join key — the one-time shuffle that makes every later equi-join or
    grouped agg on that key exchange-free."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a previously-failed run can leave the managed location behind
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{table_name}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables: Catalyst sees compatible output
    partitioning on both sides and plans a sort-merge join WITHOUT
    shuffle exchanges. The merge hint keeps small test tables off the
    broadcast path so the exchange-free property is observable."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key)
