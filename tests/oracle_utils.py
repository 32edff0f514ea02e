"""Local replica of the driver's DuckDB-oracle comparison: row count,
column-name schema, and order-insensitive value comparison."""

from __future__ import annotations

import math
import os

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = []
    for rec in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm_cell(v) for v in rec))
    return sorted(rows, key=repr)


def compare_frames(spark_pdf, oracle_pdf) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        extra_s = [r for r in s_rows[:2000] if r not in set(o_rows[:2000])][:3] if len(s_rows) != len(o_rows) else []
        problems.append(f"values differ; first aligned diffs={diffs} extra_spark={extra_s}")
    return problems
