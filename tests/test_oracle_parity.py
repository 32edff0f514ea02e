"""Differential test: every registered query vs its DuckDB oracle —
the local replica of the driver's CORRECTNESS gate (sf0.01)."""

from __future__ import annotations

import pytest

from mrt_data_integration_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import compare_frames, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


def test_all_queries_have_impl():
    for name in ORACLES:
        assert name in QUERIES


# Registry-wide broadcast-hint budget (r12 — the lint form of the r11
# verdict's ungated-vocabulary-broadcast finding, the HOF-lint
# pattern): every hard F.broadcast hint in a registered query's
# ANALYZED plan is enumerated here with its boundedness class. A hint
# is legitimate only when the hinted frame is bounded by CONFIG or
# CONSTRUCTION, never by data volume:
#   [1row]  single-row stats aggregate (crossJoin-broadcast pattern)
#   [model] fixed-width hashed model / codebook / centroid table
#           (width is a config constant — DSIR/ngram_lm/PQ class)
#   [batch] a declared-small query/anchor/benchmark batch (an eval
#           set, a probe batch — small by construction, with the
#           cross-corpus callers gated off per the r12 margin fix)
#   [dim]   a star-schema dimension / dimension-history (the classic
#           broadcast-join usage; AQE would pick it unhinted at bench
#           scale, the hint pins the plan for the test suite)
#   [prune] micro-batch-sized affected-key semi/anti prune frames
#   [gate]  threshold-pruned frequent/hit sets WITH a documented
#           broadcast=False escape hatch
# A query absent from this table must carry ZERO hints — a new hint
# fails CI until it is audited into a class here (the discipline that
# would have caught the two r11 vocabulary hints at registration).
_HINT_BUDGET = {
    "benchmark_decontamination": 2,  # [batch] benchmark gram sets
    "bloom_decontamination": 2,      # [model] bloom words + [batch] verify
    "bm25_doc_search": 4,            # [batch] query vocab + [1row] stats
    "boilerplate_span_removal": 1,   # [gate] frequent-span set
    "brand_part_rollup": 1,          # [dim] filtered part dimension
    "cdc_current_snapshot": 2,       # [prune] affected keys x2
    "char_trigram_lm_filter": 2,     # [model] trigram tables
    "cosine_topk": 1,                # [batch] 5-vector query batch
    "dsir_selected_sample": 3,       # [model] x2 + [1row] totals
    "hard_negative_ivf_probe": 1,    # [batch] anchor probe batch
    "hard_negative_mining": 1,       # [batch] anchor batch
    # [1row] x5: checkpoint bounds hinted under both cumulation arms,
    # REPEATED inside the fit's copy of the points subtree (analyzed
    # plans count the pts tree twice), + the 1-row fit itself (r14)
    "heaps_vocab_growth": 5,
    "heavy_hitters": 1,              # [1row] total
    "ivf_topk": 1,                   # [batch] query batch
    "ivfpq_appended_index_topk": 3,  # [model] centroids/codebooks + [batch]
    "ivfpq_index_topk": 3,           # [model] + [batch]
    "ivfpq_topk": 3,                 # [model] + [batch]
    # [1row] x8: the doc-count broadcast inside the idf weight frame,
    # repeated through the analyzed-plan copies of the vec subtree
    # (the norms fold + both norm-attached join sides each carry
    # vec + its nested norms copy, then the pair-grain symmetrize
    # union doubles the dots subtree) — the ppmi_word_similarity class
    "idf_shingle_neighbors": 8,
    "lang_agreement_kappa": 1,       # [1row] N/diag/pe-fold totals
    "lang_category_drift": 1,        # [1row] slice totals (r13)
    "leakage_safe_split": 1,         # [1row] spanning-clusters count
    "length_drift_ks": 1,            # [1row] slice totals
    "lineitem_priority_regime": 1,   # [dim] custkey-slice history
    "lm_perplexity_filter": 4,       # [model] x3 + [1row] token total
    # margin_mined_pairs: 0 since r14-opt — the scored frame's two
    # F.broadcast hints became a Spark broadcast VARIABLE inside the
    # mapInArrow cosine kernel (same driver envelope, no join hint).
    "mc_simulation_grid": 1,         # [batch] scenario grid
    "phrase_search_occurrences": 1,  # [batch] unrolled phrase frame
    "pmi_collocations": 2,           # [1row] totals x2
    # [1row] x4: the PPMI total broadcast, repeated through the vec
    # subtree's analyzed-plan copies (norms + both join sides + dots)
    "ppmi_word_similarity": 4,
    "pq_topk": 3,                    # [model] codebooks + [batch]
    "relative_efficiency": 1,        # [1row] reference row
    # semantic_decontamination: 0 since r14-opt — benchmark ships as a
    # broadcast variable in broadcast_max_cosine (crossJoin hint gone).
    # (semantic_decontamination_ivf's [batch] probe hint removed r15:
    # the cell-restricted Arrow kernel replaced the probe join — the
    # collected side is bounded by the kernels' loud collect guard,
    # the enforced successor of the hint budget for that path)
    "sensitivity_scenarios": 3,      # [batch] scenario grids
    "sequence_packing": 1,           # [1row] pack-boundary frame
    "source_js_divergence": 1,       # [dim] source-domain pair frame (r14)
    "star_join_revenue": 3,          # [dim] region/nation/customer
    "tfidf_top_terms": 1,            # [1row] n_docs (r12 gating fix)
    "training_mix_rebalance": 1,     # [model] per-source mix table
    "weighted_minhash_signatures": 1,  # [1row] n_docs (r12 gating fix)
    "winnowing_decontamination": 1,  # [batch] benchmark fp frame
    "zipf_lexical_profile": 2,       # [1row] stats + [1row] slope fit (r13)
}


# r14 generalization of the HOF-capture lint (the chunker finding, opt
# round 1): the r13 rule only sees EXPENSIVE SCALAR calls over
# scalar-invariant arguments. The split_content_chunks regression it
# missed was an ARRAY captured as an expression: the lambda read the
# anchors array via `element_at(<whole filter(sequence...md5...) tree>,
# i)` — every nested call's direct args contained SOME lambda variable
# (the INNER anchor-bucket lambda's), so the scalar rule passed it, yet
# the captured collection subtree referenced no variable of any
# ENCLOSING lambda and was re-computed per element (O(tokens × anchors)
# per doc; measured 3.8× on the boundary stage). General rule: inside a
# lambda body, a collection-consuming call whose collection operand is
# a COMPUTED subtree (not a bare attribute) that references no lambda
# variable once its OWN nested lambdas are stripped is loop-invariant —
# it must be projected as a concrete column and captured by reference.
# Module-level so the broken-shape regression pin below exercises the
# same detector the registry sweep runs.
import re as _re_mod

_COLLECTION = _re_mod.compile(
    r"\b(element_at|transform|filter|aggregate|reduce|exists"
    r"|forall|zip_with|slice|array_sort|sort_array|array_position"
    r"|array_contains|arrays_zip)\(",
)


def _balanced_span(plan: str, start: int) -> str:
    """The balanced-paren span beginning at plan[start] (which must
    point at the character just past an opening paren)."""
    i, depth = start, 1
    while i < len(plan) and depth:
        depth += {"(": 1, ")": -1}.get(plan[i], 0)
        i += 1
    return plan[start:i]


def _strip_nested_lambdas(s: str) -> str:
    out, pos = [], 0
    while True:
        i = s.find("lambdafunction(", pos)
        if i < 0:
            out.append(s[pos:])
            return "".join(out)
        out.append(s[pos:i])
        span = _balanced_span(s, i + len("lambdafunction("))
        pos = i + len("lambdafunction(") + len(span)


def _toplevel_args(args: str) -> list[str]:
    """Split a call's argument string at depth-0 commas, treating TYPE
    angle brackets like parens so commas inside type strings
    (``map<string,int>``) never split an argument (ADVICE r14).
    Comparison operators also print as ``<``/``>`` in plans but always
    space-separated (``(a < b)``); type brackets are space-free, which
    is how the two are told apart."""
    out, paren, angle, last = [], 0, 0, 0
    for j, ch in enumerate(args):
        if ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        elif (
            ch == "<"
            and 0 < j < len(args) - 1
            and args[j - 1] not in " <("
            and args[j + 1] not in " =>"
        ):
            angle += 1
        elif ch == ">" and angle > 0 and j > 0 and args[j - 1] != " ":
            angle -= 1
        elif ch == "," and paren == 0 and angle == 0:
            out.append(args[last:j])
            last = j + 1
    out.append(args[last:])
    return out


def _is_cheap_constant_collection(operand: str) -> bool:
    """Whitelist for the lint (ADVICE r14): a collection operand that
    is a literal array/map constructor (possibly cast-wrapped) is
    constant-folded or trivially re-evaluated — flagging it would be a
    false positive (e.g. ``exists(array(1, 2), ...)`` inside a
    lambda). "Literal" = no further calls inside the constructor."""
    s = operand.strip()
    m = _re_mod.match(r"cast\((.*) as [a-z][a-z0-9_<>, ]*\)$", s)
    if m:
        s = m.group(1).strip()
    m = _re_mod.match(r"(?:array|map)\((.*)\)$", s)
    return bool(m) and "(" not in m.group(1)


def _hof_invariant_collection(plan: str) -> bool:
    pos = 0
    while True:
        start = plan.find("lambdafunction(", pos)
        if start < 0:
            return False
        body = _balanced_span(plan, start + len("lambdafunction("))
        for m in _COLLECTION.finditer(body):
            args = _balanced_span(body, m.end())
            name = m.group(1)
            split = _toplevel_args(args)
            # which operands are collections: both sides of zip_with,
            # every vararg of arrays_zip, the first everywhere else
            # (ADVICE r14 — the old rule checked only the first and
            # missed a captured second zip_with operand)
            if name == "zip_with":
                operands = split[:2]
            elif name == "arrays_zip":
                operands = split
            else:
                operands = split[:1]
            for operand in operands:
                if (
                    "(" in operand
                    and "lambda" not in _strip_nested_lambdas(operand)
                    and not _is_cheap_constant_collection(operand)
                ):
                    return True
        pos = start + len("lambdafunction(") + len(body)


def test_hof_invariant_collection_lint_catches_captured_array(spark):
    """Regression pin for the generalized lint: rebuild the EXACT
    pre-fix split_content_chunks shape (the kept-filter lambda reading
    the anchors EXPRESSION instead of a projected column) and assert
    the detector fires on it — and passes the fixed shape."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id int, text string"
    )
    toks = F.col("__toks__")
    n = F.size(toks)

    def _anchor_bucket(i):
        return (
            F.conv(
                F.substring(F.md5(F.element_at(toks, i)), 1, 4), 16, 10
            ).cast("int")
            % 8
            == 0
        )

    anchors = F.when(
        n >= 2, F.filter(F.sequence(F.lit(2), n), _anchor_bucket)
    ).otherwise(F.array().cast("array<int>"))

    def _kept(src):
        return F.filter(
            src,
            lambda x, i: x
            - F.when(i == 0, F.lit(1)).otherwise(
                F.element_at(src, F.greatest(i, F.lit(1)))
            )
            >= 4,
        )

    base = df.select(
        F.col("doc_id"), F.split(F.col("text"), " ", -1).alias("__toks__")
    )
    broken = base.select("doc_id", _kept(anchors).alias("kept"))
    fixed = base.select("doc_id", toks, anchors.alias("__anch__")).select(
        "doc_id", _kept(F.col("__anch__")).alias("kept")
    )
    plan_broken = broken._jdf.queryExecution().executedPlan().toString()
    plan_fixed = fixed._jdf.queryExecution().executedPlan().toString()
    assert _hof_invariant_collection(plan_broken)
    assert not _hof_invariant_collection(plan_fixed)
    # both shapes compute the same boundaries — the lint is about cost
    assert broken.collect() == fixed.collect()


def test_hof_lint_zip_with_second_operand_and_constant_whitelist(spark):
    """ADVICE r14 closes: (a) a loop-invariant COMPUTED collection in
    zip_with's SECOND operand must fire the lint (the old rule only
    read the first); (b) a literal-constant collection operand
    (``exists(array(1,2), ...)`` inside a lambda) must NOT fire — it is
    the whitelisted trivially-cheap constructor class."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    base = df.select(
        F.col("doc_id"), F.split(F.col("text"), " ", -1).alias("__toks__")
    )
    toks = F.col("__toks__")
    computed = F.sort_array(F.transform(toks, F.md5))
    # (a) zip_with second operand captures the computed collection
    # inside the OUTER transform's lambda body — loop-invariant
    broken2 = base.select(
        F.transform(
            toks,
            lambda x: F.size(F.zip_with(toks, computed, lambda a, b: a)),
        ).alias("z")
    )
    plan2 = broken2._jdf.queryExecution().executedPlan().toString()
    assert _hof_invariant_collection(plan2), plan2
    # (b) constant collection operand: whitelisted, no false positive
    ok = base.select(
        F.transform(
            toks,
            lambda x: F.exists(
                F.array(F.lit(1), F.lit(2)), lambda y: y == F.length(x)
            ),
        ).alias("e")
    )
    plan_ok = ok._jdf.queryExecution().executedPlan().toString()
    assert not _hof_invariant_collection(plan_ok), plan_ok
    # the type-string comma fix: splitting survives map<string,int>
    assert _toplevel_args("cast(a as map<string,int>), b") == [
        "cast(a as map<string,int>)",
        " b",
    ]


def test_bounded_key_groups_rejects_tree_fan(spark):
    """ADVICE r14: the two bounded_topk flags assert contradictory
    group-size proofs — passing both must fail loudly."""
    import pytest as _pytest

    from mrt_data_integration_spark.operators.similarity import bounded_topk

    df = spark.createDataFrame(
        [(1, 2, 0.5)], "query_id long, corpus_id long, s double"
    )
    with _pytest.raises(ValueError, match="bounded_key_groups"):
        bounded_topk(
            df, 1, "s", bounded_key_groups=True, tree_fan=4
        )


def test_queries_run_on_smoke(spark, sf_smoke):
    # Every registered query must at least execute at sf0.001 — and
    # every query's PHYSICAL PLAN must pass the registry-wide scale
    # lint (piggybacked on this sweep so it costs no extra execution):
    #   - no CartesianProduct — an unkeyed join anywhere is a 100 TB
    #     non-starter (1-row crossJoin broadcasts plan as
    #     BroadcastNestedLoopJoin over a single-row side, not as
    #     CartesianProduct, so the legitimate stats-broadcast pattern
    #     passes);
    #   - no BatchEvalPython — a row-at-a-time Python UDF in any plan
    #     contradicts the engine's Arrow-only Python contract
    #     (mapInPandas/ArrowEval nodes are the sanctioned path).
    #   - no tokenizer call captured INSIDE a HOF lambda body — an
    #     interpreted lambda re-evaluates captured sub-expressions per
    #     ELEMENT, so `transform(..., i -> ...split(text, ...)...)`
    #     re-runs the regex tokenizer O(n_elements) times per row (the
    #     r11 word_pairs/word_ngrams/word_shingles finding: a silent
    #     5-6× that the CartesianProduct/BatchEvalPython lints cannot
    #     see — it looks like WholeStageCodegen from outside). Zip the
    #     shifted slices instead, or materialize the array as a column
    #     and capture the attribute.
    import re as _re

    # r13 generalization (the r11/r12 carried observation): flag ANY
    # expensive call inside a lambda body whose argument subtree
    # contains NO lambda variable — such a subtree is loop-invariant
    # and re-evaluated per ELEMENT by interpreted HOFs, so it must be
    # hoisted into its own projection. An expensive call OVER the
    # lambda argument (md5(lambda x), split(lambda x)) is per-element
    # by design and legitimate.
    _EXPENSIVE = _re.compile(
        r"\b(split|regexp_replace|regexp_extract|md5|sha2|sha1|crc32"
        r"|xxhash64|sentences|conv|json_tuple|get_json_object"
        r"|from_json|to_json)\(",
    )

    def _balanced(plan: str, start: int) -> str:
        """The balanced-paren span beginning at plan[start] (which must
        point at the character just past an opening paren)."""
        i, depth = start, 1
        while i < len(plan) and depth:
            depth += {"(": 1, ")": -1}.get(plan[i], 0)
            i += 1
        return plan[start:i]

    def _hof_captured_tokenizer(plan: str) -> bool:
        pos = 0
        while True:
            start = plan.find("lambdafunction(", pos)
            if start < 0:
                return False
            body = _balanced(plan, start + len("lambdafunction("))
            for m in _EXPENSIVE.finditer(body):
                args = _balanced(body, m.end())
                if "lambda" not in args:
                    return True
            pos = start + len("lambdafunction(") + len(body)

    lint_hits = []
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_smoke)
        assert df.columns, name
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("CartesianProduct", "BatchEvalPython"):
            if marker in plan:
                lint_hits.append((name, marker))
        if _hof_captured_tokenizer(plan):
            lint_hits.append((name, "HOF-captured-tokenizer"))
        if _hof_invariant_collection(plan):
            lint_hits.append((name, "HOF-invariant-collection"))
        # broadcast-hint budget (r12): hints live in the ANALYZED
        # plan (the executed plan shows only the resulting join)
        n_hints = (
            df._jdf.queryExecution().analyzed().toString()
        ).count("ResolvedHint")
        if n_hints != _HINT_BUDGET.get(name, 0):
            lint_hits.append(
                (
                    name,
                    f"broadcast-hints {n_hints} != budget "
                    f"{_HINT_BUDGET.get(name, 0)} — audit the hinted "
                    "frame's boundedness class into _HINT_BUDGET",
                )
            )
        df.limit(5).collect()
    assert not lint_hits, f"plan lint violations: {lint_hits}"


def test_comparator_rejects_int_vs_float_representation():
    """Round-3 regression: DuckDB HUGEINT -> float64 vs Spark int64 passed
    the old numeric-equality comparator but failed the driver's
    representation-sensitive hash. The comparator must reject it."""
    import pandas as pd

    spark_pdf = pd.DataFrame({"k": ["a", "b"], "session_id": pd.array([1, 2], dtype="int64")})
    oracle_pdf = pd.DataFrame({"k": ["a", "b"], "session_id": pd.array([1.0, 2.0], dtype="float64")})
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert problems, "int64 vs float64 frames must not compare equal"
    assert any("dtype" in p or "values differ" in p for p in problems)

    # identical representations still pass
    assert not compare_frames(spark_pdf, spark_pdf.copy())


def test_driver_window_invariants():
    """The grading driver checks exactly the first 50 registered queries;
    pin the rotation policy's structural invariants so a registration
    mistake can't silently un-verify queries."""
    import importlib

    qinit = importlib.import_module("mrt_data_integration_spark.queries")

    window = qinit._WINDOW
    pools = (
        set(qinit._POOL_A),
        set(qinit._POOL_B),
        set(qinit._CORE),
        set(qinit._RETIRED),  # r7: CI-only tier, outside the rotation
    )
    assert len(window) == 50 == len(set(window))
    # tiers partition the registry exactly
    assert pools[0] | pools[1] | pools[2] | pools[3] == set(QUERIES)
    for i, a in enumerate(pools):
        for b in pools[i + 1:]:
            assert not (a & b)
    # registration order == window + remainder (driver reads order[:50])
    assert list(QUERIES)[:50] == window
    # every windowed query exists; every oracle key has an impl
    assert all(n in QUERIES for n in window)
