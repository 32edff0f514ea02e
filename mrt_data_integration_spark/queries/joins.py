"""Join / set-operation queries (SURVEY.md §2.3 J5 / §2.9 E1) — the
relational extension surface the reference lacks (its model is single-
table; pooling = union + filter).

Join strategy notes (100 TB): region/nation/supplier/part/customer are
dimensions → broadcast (hinted explicitly; AQE would also convert).
lineitem⋈orders is the only fact-fact join → sort-merge on the shuffled
key, which AQE re-plans if skewed. No join here shuffles the fact table
more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.sources import load_table


@query(
    "star_join_revenue",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('AMERICA', 'ASIA')
    GROUP BY n_name
    """,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: star-schema revenue rollup (TPC-H-Q5-shaped).

    All three dimension joins are broadcasts — the fact table streams
    through one codegen stage and shuffles only for the final groupBy.
    The region filter prunes before the nation/supplier broadcast is
    built, so the broadcast side is pre-filtered.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    dim = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "fact_fact_join",
    oracle="""
    SELECT o_orderpriority,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: the one genuine fact-fact join (orders⋈lineitem). The status
    filter lands on the orders scan (pushed down); at 100 TB both sides
    shuffle once on orderkey and AQE handles skew/coalesce."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: left-semi join (EXISTS) — customers with at least one big
    order. Semi joins never duplicate the left side, so no post-join
    distinct is needed."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "anti_join_dormant_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_dormant,
           round(avg(c_acctbal), 4) AS avg_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    GROUP BY c_mktsegment
    """,
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: left-anti join (NOT EXISTS) — customers with no orders,
    rolled up by segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@query(
    "brand_part_rollup",
    oracle="""
    SELECT p_brand,
           round(sum(l_quantity), 2) AS total_qty,
           round(avg(p_retailprice), 4) AS avg_retail,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
)
def brand_part_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: broadcast dimension join + rollup with a pushed-down dimension
    filter (p_size) that prunes the broadcast side before it is built."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_retail"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


@query(
    "scd2_priority_history",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS k, o_orderpriority AS p,
             o_orderdate AS d, o_orderkey AS ok
      FROM orders WHERE o_custkey % 10 = 0
    ),
    s AS (
      SELECT *, lag(p) OVER (PARTITION BY k ORDER BY d, ok) AS pp FROM c
    ),
    r AS (SELECT k, p, d, ok FROM s WHERE pp IS NULL OR pp <> p),
    h AS (
      SELECT k, p, d,
             lead(d) OVER (PARTITION BY k ORDER BY d, ok) AS vt,
             row_number() OVER (PARTITION BY k ORDER BY d, ok) AS v
      FROM r
    )
    SELECT k AS custkey, p AS priority,
           strftime(d, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(v AS INTEGER) AS version,
           (vt IS NULL) AS is_current
    FROM h
    """,
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (r8, operators/scd.py): each customer's order stream read
    as a changelog of their order priority, collapsed into effective-
    dated version rows — consecutive same-priority orders extend a
    version, a priority change closes it and opens the next. One
    window shuffle keyed by the dimension key; the oracle replays the
    identical lag/lead/row_number collapse."""
    from mrt_data_integration_spark.operators.scd import changelog_to_scd2

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    hist = changelog_to_scd2(
        orders.select(
            "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
        ),
        key_cols=["o_custkey"],
        tracked_cols=["o_orderpriority"],
        seq_cols=["o_orderdate", "o_orderkey"],
        ts_col="o_orderdate",
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "version",
        "is_current",
    )


@query(
    "lineitem_priority_regime",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS k, o_orderpriority AS p,
             o_orderdate AS d, o_orderkey AS ok
      FROM orders WHERE o_custkey % 10 = 0
    ),
    s AS (
      SELECT *, lag(p) OVER (PARTITION BY k ORDER BY d, ok) AS pp FROM c
    ),
    r AS (SELECT k, p, d, ok FROM s WHERE pp IS NULL OR pp <> p),
    h AS (
      SELECT k, p, d AS vf,
             lead(d) OVER (PARTITION BY k ORDER BY d, ok) AS vt
      FROM r
    ),
    f AS (
      SELECT o.o_custkey AS k, l.l_shipdate AS ts, l.l_quantity AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey % 10 = 0
    )
    SELECT h.p AS priority,
           count(*) AS n_items,
           CAST(sum(f.qty) AS DOUBLE) AS total_qty,
           strftime(min(f.ts), '%Y-%m-%d') AS first_ship,
           strftime(max(f.ts), '%Y-%m-%d') AS last_ship
    FROM f JOIN h ON f.k = h.k
               AND f.ts >= h.vf AND (h.vt IS NULL OR f.ts < h.vt)
    GROUP BY 1
    """,
)
def lineitem_priority_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (r8, operators/scd.py): every lineitem
    shipment joined to the priority REGIME its customer was in at ship
    time — the SCD2 history built by `scd2_priority_history`'s collapse,
    probed with the temporal join (equi key drives the distribution,
    interval bounds are residual filters; never a banded explode or
    nested loop). total_qty sums integer-valued doubles — exact at any
    summation order, so the oracle needs no float proofing."""
    from mrt_data_integration_spark.operators.scd import (
        changelog_to_scd2,
        point_in_time_join,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    hist = changelog_to_scd2(
        orders.select(
            "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
        ),
        key_cols=["o_custkey"],
        tracked_cols=["o_orderpriority"],
        seq_cols=["o_orderdate", "o_orderkey"],
        ts_col="o_orderdate",
    ).select("o_custkey", "o_orderpriority", "valid_from", "valid_to")
    lineitem = load_table(spark, sf_dir, "lineitem")
    facts = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
    ).select("o_custkey", "l_shipdate", "l_quantity")
    joined = point_in_time_join(
        facts,
        hist,
        key_cols=["o_custkey"],
        ts_col="l_shipdate",
        broadcast_history=True,
    )
    return joined.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("total_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


@query(
    "streaming_scd2_history",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS k, o_orderpriority AS p,
             o_orderdate AS d, o_orderkey AS ok
      FROM orders WHERE o_custkey % 10 = 0
    ),
    s AS (
      SELECT *, lag(p) OVER (PARTITION BY k ORDER BY d, ok) AS pp FROM c
    ),
    r AS (SELECT k, p, d, ok FROM s WHERE pp IS NULL OR pp <> p),
    h AS (
      SELECT k, p, d,
             lead(d) OVER (PARTITION BY k ORDER BY d, ok) AS vt,
             row_number() OVER (PARTITION BY k ORDER BY d, ok) AS v
      FROM r
    )
    SELECT k AS custkey, p AS priority,
           strftime(d, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(v AS INTEGER) AS version,
           (vt IS NULL) AS is_current
    FROM h
    """,
)
def streaming_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6+ (r8, streaming/scd.py): the SAME SCD2 history as
    `scd2_priority_history`, maintained BY THE STREAMING PATH — the
    orders changelog drained in three time-ordered micro-batches
    through `merge_scd2_updates_bucketed` (batch 0 builds via
    changelog_to_scd2, batches 1-2 fold via scd2_merge into the
    BUCKET-PARTITIONED versioned state table — the r9 evolution that
    rewrites only touched buckets), then read back with the production
    `read_scd2_history_bucketed` reader. The
    oracle is the IDENTICAL one-shot collapse SQL — a hash match proves
    stream == batch == SQL end-to-end (the funnel precedent,
    `streaming_funnel_conversion`).

    Ordering contract: the merge requires each batch strictly later by
    (o_orderdate, o_orderkey) than the history; the stage splits at
    fixed DATE boundaries, so it holds by construction, and the staged
    files carry strictly increasing mtimes (file-stream delivery
    order). The returned frame is a LAZY read over the drained state
    (no O(result) driver collect); the state dir is private per
    invocation and removed at process exit, not at return, because the
    caller collects after we return.
    """
    import atexit
    import os
    import shutil
    import tempfile

    from mrt_data_integration_spark.queries.timeseries import (
        _drain_stream,
        _staged_stream_dir,
    )
    from mrt_data_integration_spark.streaming.scd import (
        merge_scd2_updates_bucketed,
        read_scd2_history_bucketed,
    )

    from mrt_data_integration_spark.streaming.scd import (
        stage_ordered_changelog,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    log = orders.select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    cuts = ["1997-01-01", "1999-01-01"]

    def build(p: str) -> None:
        stage_ordered_changelog(log, p, "o_orderdate", cuts)
        open(os.path.join(p, "_SUCCESS"), "w").close()

    src = _staged_stream_dir(sf_dir, "sscd2_orders3", build, src_table="orders")
    state_dir = tempfile.mkdtemp(prefix="graft_sscd2_state_")
    atexit.register(shutil.rmtree, state_dir, ignore_errors=True)
    _drain_stream(
        spark.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part*")),
        lambda df, bid: merge_scd2_updates_bucketed(
            df,
            bid,
            state_dir,
            key_cols=["o_custkey"],
            tracked_cols=["o_orderpriority"],
            seq_cols=["o_orderdate", "o_orderkey"],
            ts_col="o_orderdate",
            n_buckets=16,
        ),
        mode="append",
        state_partitions=8,
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return read_scd2_history_bucketed(spark, state_dir).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "version",
        F.col("is_current"),
    )


@query(
    "cdc_current_snapshot",
    # One-shot collapse of the full change log: the latest event per
    # key (by o_orderdate, o_orderkey) determines the final state —
    # present iff it is not a delete. The engine folds the SAME log in
    # three sequential date-split batches through apply_cdc_changes,
    # so the hash match proves sequential fold == one-shot collapse ==
    # SQL (the streaming-SCD2 oracle pattern, type-1 edition).
    oracle="""
    WITH ev AS (
      SELECT o_custkey, o_orderpriority, o_orderdate,
             CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
                  THEN 'D' ELSE 'U' END AS op,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m-%d') AS last_change
    FROM ev WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_current_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type 1 (r10, operators/scd.apply_cdc_changes): the orders
    stream read as a CDC log of each customer's current priority —
    upserts plus deterministic deletes (finalized orders with key ≡ 0
    mod 7) — applied in three sequential date-split batches onto a
    current-row snapshot. Untouched keys never shuffle (broadcast
    anti prune); each batch collapses to its per-key latest event
    map-side before applying. The oracle is the one-shot latest-event
    collapse of the concatenated log."""
    from mrt_data_integration_spark.operators.scd import apply_cdc_changes

    orders = load_table(spark, sf_dir, "orders")
    log = orders.select(
        "o_custkey",
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 7 == 0),
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    snap = None
    bounds = ("1900-01-01", "1997-01-01", "1999-01-01", "2100-01-01")
    for lo, hi in zip(bounds, bounds[1:]):
        batch = log.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        )
        snap = apply_cdc_changes(
            snap,
            batch,
            key_cols=["o_custkey"],
            seq_cols=["o_orderdate", "o_orderkey"],
            op_col="op",
        )
    return snap.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_change"),
    )
