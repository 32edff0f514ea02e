"""Aggregation queries (SURVEY.md §2.4 A1-A15, §2.8 W1-W6) with oracles.

Includes the engine's signature two-level cluster "meat" aggregation and
the weighted gram — the Spark-native replacement for the reference's Rcpp
kernel (extras/fast-meat.cpp) — expressed as plain SQL-checkable sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mrt_data_integration_spark.queries.derived import _PANEL_SQL, _panelized
from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.sources import load_table


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregation (A9/A10 scaled up).

    Low-cardinality grouping → partial (map-side) aggregation collapses
    each input split to <=6 rows before the shuffle; the plan is scan →
    partial hash agg → tiny exchange → final hash agg at any data size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "cluster_score_meat",
    oracle=f"""
    WITH panel AS ({_PANEL_SQL}),
    scores AS (
      SELECT user_id,
             (a - p_h) * 1.0   AS s0,
             (a - p_h) * value AS s1
      FROM panel
    ),
    per_user AS (
      SELECT user_id, sum(s0) AS u0, sum(s1) AS u1
      FROM scores GROUP BY user_id
    )
    SELECT round(sum(u0 * u0), 4) AS m_0_0,
           round(sum(u0 * u1), 4) AS m_0_1,
           round(sum(u1 * u1), 4) AS m_1_1,
           count(*)               AS n_users
    FROM per_user
    """,
)
def cluster_score_meat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2: per-user score sums → meat matrix entries, the two-level
    aggregation replacing extras/helpers.R:17-22 / fast-meat.cpp:32-39.

    Level-1 shuffle is keyed on user_id (uniform, high-cardinality);
    level 2 reduces to a single row. This is the exact shape used by
    ``operators.aggregates.cluster_meat`` inside the estimators.
    """
    df = _panelized(spark, sf_dir)
    scores = df.select(
        "user_id",
        ((F.col("a") - F.col("p_h")) * F.lit(1.0)).alias("s0"),
        ((F.col("a") - F.col("p_h")) * F.col("value")).alias("s1"),
    )
    per_user = scores.groupBy("user_id").agg(
        F.sum("s0").alias("u0"), F.sum("s1").alias("u1")
    )
    return per_user.agg(
        F.round(F.sum(F.col("u0") * F.col("u0")), 4).alias("m_0_0"),
        F.round(F.sum(F.col("u0") * F.col("u1")), 4).alias("m_0_1"),
        F.round(F.sum(F.col("u1") * F.col("u1")), 4).alias("m_1_1"),
        F.count(F.lit(1)).alias("n_users"),
    )


@query(
    "weighted_gram",
    oracle=f"""
    WITH panel AS ({_PANEL_SQL})
    SELECT round(sum(p_h * (1 - p_h) * 1.0 * 1.0), 4)     AS g_0_0,
           round(sum(p_h * (1 - p_h) * 1.0 * value), 4)   AS g_0_1,
           round(sum(p_h * (1 - p_h) * value * value), 4) AS g_1_1,
           round(sum(p_h * (1 - p_h) * 1.0 * value), 4)   AS xy_0,
           round(sum(p_h * (1 - p_h) * value * value), 4) AS xy_1
    FROM panel
    """,
)
def weighted_gram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4: weighted second-moment (gram) aggregation XᵀWX with the GLM
    IRLS weight p(1-p) (methods/wcls.R:55-57,83-85). Weight folds into
    the product expressions — single pass, no intermediate columns."""
    df = _panelized(spark, sf_dir)
    w = F.col("p_h") * (1 - F.col("p_h"))
    one, x = F.lit(1.0), F.col("value")
    return df.agg(
        F.round(F.sum(w * one * one), 4).alias("g_0_0"),
        F.round(F.sum(w * one * x), 4).alias("g_0_1"),
        F.round(F.sum(w * x * x), 4).alias("g_1_1"),
        F.round(F.sum(w * one * x), 4).alias("xy_0"),
        F.round(F.sum(w * x * x), 4).alias("xy_1"),
    )


@query(
    "group_moment_stats",
    oracle="""
    SELECT event_type,
           round(avg(value), 4)                          AS avg_value,
           round(sum(value), 4)                          AS sum_value,
           round(stddev_pop(value), 4)                   AS emp_se,
           round(sqrt(avg((value - 5.0) * (value - 5.0))), 4) AS rmse_vs_5,
           count(DISTINCT user_id)                       AS n_users,
           count(*)                                      AS n_rows
    FROM events
    GROUP BY event_type
    """,
)
def group_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A8+A9-A12: the Monte-Carlo summary family — mean, sum,
    population SD (empirical SE), RMSE vs truth, exact COUNT DISTINCT
    (simulation.R:124-136; wcls.R:105)."""
    ev = load_table(spark, sf_dir, "events")
    dev = F.col("value") - F.lit(5.0)
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.stddev_pop("value"), 4).alias("emp_se"),
        F.round(F.sqrt(F.avg(dev * dev)), 4).alias("rmse_vs_5"),
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "colsums_single_row",
    oracle="""
    SELECT round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_discount), 4)      AS sum_disc,
           round(sum(l_tax), 4)           AS sum_tax,
           round(avg(CAST(l_linenumber AS DOUBLE)), 6) AS mean_linenumber,
           count(*)                       AS n
    FROM lineitem
    """,
)
def colsums_single_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7: global colSums / column mean (drwcls.R:123-128; wcls.R:62)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
        F.round(F.sum("l_tax"), 4).alias("sum_tax"),
        F.round(F.avg(F.col("l_linenumber").cast("double")), 6).alias("mean_linenumber"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "relative_efficiency",
    oracle="""
    WITH per_method AS (
      SELECT event_type AS method, stddev_pop(value) AS se
      FROM events GROUP BY event_type
    )
    SELECT method,
           round(se, 4) AS se,
           round(se / (SELECT se FROM per_method WHERE method = 'click'), 4)
             AS rel_efficiency
    FROM per_method
    """,
)
def relative_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+A13: normalize every group's SE by a reference group's SE
    (simulation.R:132,134). Implemented as a broadcast join of the
    1-row reference aggregate against the per-method aggregate — no
    window over a global partition, no driver round-trip."""
    ev = load_table(spark, sf_dir, "events")
    per_method = ev.groupBy(F.col("event_type").alias("method")).agg(
        F.stddev_pop("value").alias("se_raw")
    )
    ref = per_method.filter(F.col("method") == "click").select(
        F.col("se_raw").alias("ref_se")
    )
    return per_method.crossJoin(F.broadcast(ref)).select(
        "method",
        F.round(F.col("se_raw"), 4).alias("se"),
        F.round(F.col("se_raw") / F.col("ref_se"), 4).alias("rel_efficiency"),
    )


@query(
    "group_best_highlight",
    oracle="""
    SELECT l_returnflag, l_linestatus, avg_disc,
           (avg_disc = min_disc) AS is_best
    FROM (
      SELECT l_returnflag, l_linestatus,
             round(avg(l_discount), 6) AS avg_disc,
             min(round(avg(l_discount), 6))
               OVER (PARTITION BY l_returnflag) AS min_disc
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
    )
    """,
)
def group_best_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: group-wise best-value highlighting via a window over an
    aggregate (simulation.R:485-499)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.avg("l_discount"), 6).alias("avg_disc")
    )
    w = Window.partitionBy("l_returnflag")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "avg_disc",
        (F.col("avg_disc") == F.min("avg_disc").over(w)).alias("is_best"),
    )


@query(
    "pivot_method_by_coef",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_method_by_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: long→wide pivot (example-analysis.R:51-57). Spark-side uses
    the native pivot with an explicit value list (avoids the extra
    distinct-values job — mandatory at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select(
        "l_returnflag", F.col("F").alias("qty_F"), F.col("O").alias("qty_O")
    )


@query(
    "unpivot_long",
    oracle="""
    SELECT c_custkey, metric, round(val, 4) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
      FROM customer
    )
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: wide→long unpivot via stack() (generate_data.R:77-91 flatten)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "val_raw"),
    ).select("c_custkey", "metric", F.round("val_raw", 4).alias("val"))


@query(
    "rollup_hierarchy",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (grouping-sets family) — one
    pass, partial-aggregated like a plain groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gset,
           count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations via CUBE, with grouping() flags
    disambiguating natural NULLs from subtotal rows — completes the
    grouping-sets family next to ROLLUP. One pass, partial-aggregated;
    CUBE multiplies output rows (2^k sets), never input scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (
            F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
        ).alias("gset"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@query(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). The scale path swaps in
    ``approx_percentile`` with a documented error bound — exact
    percentiles need a per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING
           ), 2) AS running_spend,
           row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_seq
    FROM orders
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (cumulative window, unique tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "distinct_exact",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber
    FROM lineitem
    """,
)
def distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (exact dedup of a projection): SELECT DISTINCT — hash
    aggregation with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_linenumber").distinct()


@query(
    "argmax_per_group",
    oracle="""
    SELECT o_orderpriority,
           max(o_totalprice)                            AS max_price,
           arg_max(o_orderkey,
                   printf('%018.4f|%012d', o_totalprice, o_orderkey)) AS best_orderkey
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: which.max as an aggregation — max_by over a zero-padded
    (value, unique key) string so ties resolve identically in any
    engine (struct comparators aren't portable to the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    comparator = F.format_string("%018.4f|%012d", F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_orderpriority").agg(
        F.max("o_totalprice").alias("max_price"),
        F.max_by("o_orderkey", comparator).alias("best_orderkey"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/W4: grouped top-k via ranking window with a unique tiebreaker
    (orderkey) so results are total-ordered and engine-independent."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_rank_features",
    oracle="""
    WITH spend AS (
      SELECT user_id, count(*) AS n_events,
             round(sum(value), 4) AS total_value
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, total_value,
           ntile(4) OVER w                       AS spend_quartile,
           round(percent_rank() OVER w, 6)       AS pct_rank,
           round(cume_dist() OVER w, 6)          AS cume,
           CAST(rank() OVER w AS BIGINT)         AS rnk,
           CAST(dense_rank() OVER w AS BIGINT)   AS drnk
    FROM spend
    WINDOW w AS (ORDER BY total_value, user_id)
    """,
)
def window_rank_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/E2: the distribution-ranking window family — ntile quartiles,
    percent_rank, cume_dist, rank, dense_rank over per-user spend, with
    a (value, user_id) total order so every rank is deterministic and
    hash-comparable across engines. The per-user agg reduces the corpus
    before any window runs; the single global window then ranks one row
    per user — the standard two-phase shape for global ranking at scale
    (rank the AGGREGATE, never the raw events; for corpora where even
    the per-user frame overflows one reducer, the bounded two-stage
    ranking of similarity.bounded_topk is the k-limited alternative)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    spend = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    w = Window.orderBy("total_value", "user_id")
    return spend.select(
        "user_id",
        "n_events",
        "total_value",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )
