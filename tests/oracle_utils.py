"""Local replica of the driver's DuckDB-oracle comparison: row count,
column-name schema, and order-insensitive value comparison.

Representation-faithful (round 4): the driver's value-hash distinguishes
int64 ``1`` from float64 ``1.0`` (the round-3 ``sessionization`` red row:
DuckDB HUGEINT window-sum -> pandas float64 vs Spark int64, numerically
identical). So this comparator must too:

- per-column pandas dtype *classes* (int/float/bool/datetime/object) are
  compared between the Spark and oracle frames, and
- canonical row cells carry a type tag so ``1`` (int) != ``1.0`` (float)
  even inside object columns.

A frame pair that differs only in integer-vs-float representation now
FAILS locally, exactly as the driver's hash would.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np

_KIND_CLASS = {
    "i": "int",
    "u": "int",
    "f": "float",
    "b": "bool",
    "M": "datetime",
    "m": "timedelta",
    "O": "object",
}


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchdf()


def dtype_classes(pdf) -> dict[str, str]:
    return {
        c: _KIND_CLASS.get(pdf[c].dtype.kind, pdf[c].dtype.kind)
        for c in pdf.columns
    }


def _norm_cell(v):
    """Tagged canonical form: the tag keeps int/float/bool/str distinct the
    way a stringified hash would (``1`` vs ``1.0`` vs ``True``)."""
    if v is None:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):  # before int: bool is an int subclass
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0:  # -0.0 -> 0.0
            return ("f", 0.0)
        return ("f", v)
    if isinstance(v, str):
        return ("s", v)
    # datetimes, NaT, arrays, Decimals: fall back to repr, which is stable
    # for bit-identical values and still distinguishes types
    return ("r", repr(v))


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
    s_cls, o_cls = dtype_classes(spark_pdf), dtype_classes(oracle_pdf)
    bad_dtypes = {
        c: (s_cls[c], o_cls[c]) for c in s_cls if s_cls[c] != o_cls[c]
    }
    if bad_dtypes:
        problems.append(
            "dtype class mismatch (driver hash is representation-sensitive): "
            f"{bad_dtypes}"
        )
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
