"""Projection / filter / derived-column queries (SURVEY.md §2.2 P1-P16,
§2.3 J1, §2.8 W7-W9) with DuckDB oracles.

The events table plays the MRT-panel role (FIXTURES.md §B mapping):
``a`` = membership of event_type in {click, purchase}; ``p_h`` = logistic
in value; ``is_internal`` = user_id parity. Every derivation is the exact
column algebra of methods/wcls.R:125-150 re-expressed on this stand-in.

Float outputs are rounded to 4 decimals on BOTH sides (registry contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.functions import derive
from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.sources import load_table
from mrt_data_integration_spark.sources.sinks import ephemeral_dir


def _panelized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → MRT-panel stand-in with (a, p_h, p_h_a, is_internal)."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("event_type").isin("click", "purchase").cast("double")
    p_h = derive.logistic(F.col("value") / F.lit(100.0))
    return (
        ev.withColumn("a", a)
        .withColumn("is_internal", (F.col("user_id") % 2 == 0).cast("boolean"))
        .withColumn("p_h", p_h)
        .withColumn("p_h_a", derive.observed_arm_prob("a", "p_h"))
    )


_PANEL_SQL = """
    SELECT *,
           CAST(event_type IN ('click','purchase') AS DOUBLE) AS a,
           (user_id % 2 = 0) AS is_internal,
           1.0/(1.0+exp(-(value/100.0))) AS p_h,
           CAST(event_type IN ('click','purchase') AS DOUBLE) * (1.0/(1.0+exp(-(value/100.0))))
             + (1.0 - CAST(event_type IN ('click','purchase') AS DOUBLE))
               * (1.0 - 1.0/(1.0+exp(-(value/100.0)))) AS p_h_a
    FROM events
"""


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 25
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2: boolean row filter + column projection.

    Both the predicate and the 5-column projection reach the parquet scan
    (PushedFilters / ReadSchema) — at 100 TB this is the difference
    between scanning 5 columns of matching row groups and the full table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


@query(
    "derive_weight_chain",
    oracle=f"""
    WITH panel AS ({_PANEL_SQL})
    SELECT event_id,
           round(a - p_h, 4)                            AS a_centered,
           round(p_h_a, 4)                              AS p_h_a_r,
           round(0.5 / p_h_a, 4)                        AS w,
           round(CASE WHEN is_internal THEN 1.0
                      ELSE exp(0.005 * value - 0.1) END, 4) AS tilt_ratios,
           round((0.5 / p_h_a) * CASE WHEN is_internal THEN 1.0
                      ELSE exp(0.005 * value - 0.1) END, 4) AS w_and_tilt
    FROM panel
    """,
)
def derive_weight_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P8: the full WCLS weight-derivation chain (wcls.R:125-150).

    a_centered → observed-arm prob → IPW weight (target prob 0.5) →
    exponential-tilt ratio (offset as log-odds) → combined weight.
    One fused codegen stage; zero shuffles.
    """
    df = _panelized(spark, sf_dir)
    w = derive.ipw_weight(F.lit(0.5), F.col("p_h_a"))
    tilt = derive.tilt_ratio("is_internal", F.lit(0.005) * F.col("value"), F.lit(0.1))
    return df.select(
        "event_id",
        F.round(derive.centered_treatment("a", "p_h"), 4).alias("a_centered"),
        F.round(F.col("p_h_a"), 4).alias("p_h_a_r"),
        F.round(w, 4).alias("w"),
        F.round(tilt, 4).alias("tilt_ratios"),
        F.round(derive.combined_weight(w, tilt), 4).alias("w_and_tilt"),
    )


@query(
    "counterfactual_pseudo_outcome",
    oracle=f"""
    WITH panel AS ({_PANEL_SQL})
    SELECT event_id,
           round(2.0 + 0.3 * value + 1.5 * a, 4)  AS f_h_a,
           round(2.0 + 0.3 * value + 1.5, 4)      AS f_h_1,
           round(2.0 + 0.3 * value, 4)            AS f_h_0,
           round((value - (2.0 + 0.3 * value + 1.5 * a)) / (a - (1.0 - p_h))
                 + (2.0 + 0.3 * value + 1.5) - (2.0 + 0.3 * value), 4) AS y_tilde
    FROM panel
    """,
)
def counterfactual_pseudo_outcome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11+P12: counterfactual scoring and DR pseudo-outcome
    (methods/drwcls.R:161-176).

    The reference clones the table twice with a:=1 / a:=0; here the
    counterfactual predictions are just three expressions over one scan —
    no data duplication at any scale.
    """
    df = _panelized(spark, sf_dir)
    beta = [2.0, 0.3, 1.5]  # literal "fitted" coefs: intercept, value, a
    f_h_a = derive.linear_predictor(beta, [F.lit(1.0), F.col("value"), F.col("a")])
    f_h_1 = derive.linear_predictor(beta, [F.lit(1.0), F.col("value"), F.lit(1.0)])
    f_h_0 = derive.linear_predictor(beta, [F.lit(1.0), F.col("value"), F.lit(0.0)])
    y_tilde = (F.col("value") - f_h_a) / (F.col("a") - (F.lit(1.0) - F.col("p_h"))) + (
        f_h_1 - f_h_0
    )
    return df.select(
        "event_id",
        F.round(f_h_a, 4).alias("f_h_a"),
        F.round(f_h_1, 4).alias("f_h_1"),
        F.round(f_h_0, 4).alias("f_h_0"),
        F.round(y_tilde, 4).alias("y_tilde"),
    )


@query(
    "ci_coverage_flags",
    oracle="""
    SELECT o_orderkey,
           (o_totalprice BETWEEN 1000.0 - 1.96 * 500.0 AND 1000.0 + 1.96 * 500.0)
             AS covered,
           CASE WHEN o_orderstatus = 'F' THEN 'N/A' ELSE o_orderpriority END
             AS priority_shown,
           CAST(o_orderstatus = 'O' AS DOUBLE) * o_totalprice AS open_price
    FROM orders
    """,
)
def ci_coverage_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13-P16: CI-coverage boolean (simulation.R:40-42), conditional
    overwrite (simulation.R:472-473), indicator cast × interaction."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        derive.ci_covered(F.col("o_totalprice"), F.lit(1000.0), F.lit(500.0), 1.96).alias(
            "covered"
        ),
        F.when(F.col("o_orderstatus") == "F", F.lit("N/A"))
        .otherwise(F.col("o_orderpriority"))
        .alias("priority_shown"),
        ((F.col("o_orderstatus") == "O").cast("double") * F.col("o_totalprice")).alias(
            "open_price"
        ),
    )


@query(
    "union_pooled_studies",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'URGENT' AS cohort
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'LOW' AS cohort
    FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def union_pooled_studies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: UNION ALL of two filtered scans with a provenance tag — the
    reference's rbind pooling of per-config result tables
    (simulation.R:217-221)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("URGENT").alias("cohort")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_orderkey", "o_totalprice", F.lit("LOW").alias("cohort")
    )
    return urgent.unionByName(low)


@query(
    "csv_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*)                  AS n,
           round(sum(round(l_extendedprice, 2)), 2) AS sum_price,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty
    FROM lineitem
    WHERE l_linenumber = 1
    GROUP BY l_returnflag
    """,
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2: CSV sink + source round-trip (write.csv → read.csv of the
    reference, simulation.R:250-254): write a projected subset to a
    temp CSV directory with headers, read it back with schema
    inference, aggregate — the oracle aggregates the original rows
    directly, so the round-trip must be value-preserving."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    subset = li.select(
        "l_returnflag", F.round("l_extendedprice", 2).alias("price"), "l_quantity"
    )
    out_dir = ephemeral_dir("mrt_csv_roundtrip_")
    subset.write.mode("overwrite").option("header", True).csv(out_dir)
    back = spark.read.csv(out_dir, header=True, inferSchema=True)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("price"), 2).alias("sum_price"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


@query(
    "string_report_format",
    oracle="""
    SELECT p_partkey,
           printf('%.2f (%s)', round(p_retailprice, 2), p_brand) AS label,
           regexp_replace(p_name, '[aeiou]', '_', 'g')           AS consonant_name,
           round(p_retailprice / 100.0, 3)                       AS price_hundreds
    FROM part
    """,
)
def string_report_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7-W9: printf-style formatting, regex replace, rounding — the
    reference's reporting strings (example-analysis.R:53, simulation.R:565-571)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.format_string("%.2f (%s)", F.round("p_retailprice", 2), F.col("p_brand")).alias(
            "label"
        ),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("consonant_name"),
        F.round(F.col("p_retailprice") / 100.0, 3).alias("price_hundreds"),
    )


@query(
    "jsonl_roundtrip",
    oracle="""
    SELECT lang,
           count(*)                                  AS n_docs,
           CAST(sum(n_chars) AS BIGINT)              AS total_chars,
           count(DISTINCT md5(text))                 AS n_distinct_texts,
           CAST(sum(length(text)) AS BIGINT)         AS sum_text_len
    FROM documents
    GROUP BY lang
    """,
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2 (late r7): JSON-lines sink + source round-trip — the
    interchange format of LLM training corpora (one JSON object per
    line; the reference's CSV round-trip, extended with the NESTING
    that CSV cannot carry). Write doc rows with a nested ``meta``
    struct, read back with an EXPLICIT schema (inference on a corpus
    scan is an extra pass and can widen types), aggregate with per-lang
    content checksums (distinct md5, total text length) — the oracle
    aggregates the original rows, so the hash match proves the
    round-trip preserved every byte of every document and the nested
    fields."""
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        "doc_id",
        "text",
        F.struct("lang", "source", "n_chars").alias("meta"),
    )
    out_dir = ephemeral_dir("mrt_jsonl_roundtrip_")
    rows.write.mode("overwrite").json(out_dir)
    schema = (
        "doc_id long, text string, "
        "meta struct<lang:string,source:string,n_chars:long>"
    )
    back = spark.read.schema(schema).json(out_dir)
    return back.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("meta.n_chars").alias("total_chars"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct_texts"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )


@query(
    "orc_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                   AS n,
           round(sum(round(o_totalprice, 2)), 2)      AS sum_price,
           min(strftime(o_orderdate, '%Y-%m-%d'))     AS first_date,
           max(strftime(o_orderdate, '%Y-%m-%d'))     AS last_date
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2 (mid-r14 continuation): ORC sink + source round-trip —
    the third columnar interchange codec next to parquet and the text
    codecs (CSV/JSONL). Spark ships the ORC reader/writer natively;
    unlike the CSV path there is no schema inference step — ORC
    carries exact types (DECIMAL-free doubles, DATE), so the
    round-trip must be bit-value-preserving. The oracle aggregates
    the ORIGINAL rows directly; equality IS the preservation claim.
    Born CI-tier (see the ledger note in queries/__init__.py): the
    roundtrip family's window seats already pin the write-then-read
    identity shape; a third codec adds no new physical plan."""
    orders = load_table(spark, sf_dir, "orders")
    subset = orders.select(
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
        "o_orderdate",
    )
    out_dir = ephemeral_dir("mrt_orc_roundtrip_")
    subset.write.mode("overwrite").orc(out_dir)
    back = spark.read.orc(out_dir)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("price"), 2).alias("sum_price"),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_date"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_date"),
    )
