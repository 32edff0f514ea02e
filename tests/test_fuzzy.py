"""Approximate string-match join (operators/fuzzy.py): the PassJoin
candidate generation must be LOSSLESS — output identical to the
brute-force all-pairs Levenshtein filter, on adversarial mixes of
short strings, repetitive segments, and near-misses."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.fuzzy import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            if sa is None or sb is None:
                continue
            d = _lev(sa, sb)
            if d <= k:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                out.add((a, b, d))
    return out


def _spark_pairs(spark, rows, k):
    df = spark.createDataFrame(rows, "id long, s string")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, k, id_col="id", str_col="s").collect()
    }


def test_known_pairs(spark):
    rows = [
        (1, "spark streaming"),
        (2, "spark streamin"),   # dist 1 to #1
        (3, "spark streaming!"),  # dist 1 to #1, 2 to #2
        (4, "flink batch"),
        (5, "flink batch"),      # dist 0 to #4
        (6, None),               # never pairs
    ]
    got = _spark_pairs(spark, rows, k=2)
    assert got == _brute(rows, 2)
    assert (4, 5, 0) in got and (1, 2, 1) in got and (1, 3, 1) in got


def test_short_strings_and_cross_band(spark):
    """Strings too short to carry k+1 non-empty segments (len <= k)
    route through the banded short path, including short-vs-longer
    pairs; boundary lengths around m = k+1 exercise 1-char segments."""
    rows = [
        (1, "ab"), (2, "ba"),          # dist 2, len == k: short path
        (3, "abcdefgh"), (4, "abcdefghij"),  # len 8 vs 10: segment path
        (5, "xyzxyzxyz"), (6, "xyzxyzxyz"),  # identical
        (7, ""), (8, "a"),             # empty string edge
        (9, "abc"), (10, "a"),         # len 3 (segment side) vs 1 (short side)
    ]
    got = _spark_pairs(spark, rows, k=2)
    assert got == _brute(rows, 2)
    assert (1, 2, 2) in got and (7, 8, 1) in got and (9, 10, 2) in got


def test_repetitive_strings(spark):
    """Degenerate repeated-pattern strings: every segment content is
    identical across many strings — the verify must still produce the
    exact brute-force set (candidates inflate, results don't)."""
    rows = [
        (1, "aaaaaaaaaaaa"),
        (2, "aaaaaaaaaaab"),  # dist 1, every gram identical
        (3, "abababababab"),
        (4, "babababababa"),  # dist 2 (insert 'b' front, delete back)
    ]
    got = _spark_pairs(spark, rows, k=2)
    assert got == _brute(rows, 2)


def test_randomized_identity_with_brute_force(spark):
    """Seeded fuzz: small alphabet (forces gram collisions and
    duplicate grams), mixed lengths straddling the short cutoff, edits
    of every kind. Output must equal brute force exactly."""
    rng = random.Random(20260815)
    alpha = "abc"
    rows = []
    rid = 0
    for _ in range(30):
        n = rng.randint(0, 14)
        s = "".join(rng.choice(alpha) for _ in range(n))
        rows.append((rid, s))
        rid += 1
        if rng.random() < 0.5 and s:
            # a planted near-dup: one random edit
            t = list(s)
            op = rng.choice(["sub", "ins", "del"])
            i = rng.randrange(len(t))
            if op == "sub":
                t[i] = rng.choice(alpha)
            elif op == "ins":
                t.insert(i, rng.choice(alpha))
            else:
                del t[i]
            rows.append((rid, "".join(t)))
            rid += 1
    for k in (1, 2):
        assert _spark_pairs(spark, rows, k) == _brute(rows, k), f"k={k}"


def test_no_cartesian_in_plan(spark):
    """Both candidate paths are keyed joins — the plan must never fall
    back to a cartesian product (the scale contract every pair join in
    this engine carries)."""
    df = spark.createDataFrame(
        [(i, f"string number {i}") for i in range(50)], "id long, s string"
    )
    plan = (
        edit_distance_pairs(df, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
