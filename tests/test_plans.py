"""Physical-plan regression tests (the 100 TB contract): predicates and
projections must reach the parquet scan, dimension joins must
broadcast, aggregations must have a map-side partial phase. A plan
regression here means a scale regression even if results stay correct.
"""

from __future__ import annotations

import re

import pytest

from mrt_data_integration_spark.queries import QUERIES


def _explain_df(spark, df, mode="formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def _explain(spark, name, sf_dir, mode="formatted") -> str:
    return _explain_df(spark, QUERIES[name](spark, sf_dir), mode)


def test_scan_pushdown_and_pruning(spark, sf_smoke):
    plan = _explain(spark, "filter_project", sf_smoke)
    assert "EqualTo(l_returnflag,R)" in plan, "filter not pushed to parquet"
    assert "GreaterThan(l_quantity,25.0)" in plan
    # column pruning: the scan schema must not include unused columns
    sched = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_shipdate" not in sched and "l_tax" not in sched


def test_star_join_broadcasts_dimensions(spark, sf_smoke):
    plan = _explain(spark, "star_join_revenue", sf_smoke, "simple")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_aggregation_is_partial(spark, sf_smoke):
    plan = _explain(spark, "pricing_summary", sf_smoke, "simple")
    # partial (map-side) + final hash aggregation
    assert plan.count("HashAggregate") >= 2


def test_no_python_udfs_in_relational_core(spark, sf_smoke):
    # The relational/text/vector core must stay JVM-side: no
    # BatchEvalPython / ArrowEvalPython stages in these plans.
    for name in [
        "pricing_summary",
        "derive_weight_chain",
        "doc_quality_stats",
        "minhash_signatures",
        "cosine_topk",
        "sessionization",
        "star_join_revenue",
    ]:
        plan = _explain(spark, name, sf_smoke, "simple")
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_semi_join_stays_semi(spark, sf_smoke):
    plan = _explain(spark, "semi_join_active_customers", sf_smoke, "simple")
    assert "LeftSemi" in plan


@pytest.mark.parametrize("name", ["cluster_score_meat", "weighted_gram"])
def test_meat_gram_single_exchange(spark, sf_smoke, name):
    plan = _explain(spark, name, sf_smoke, "simple")
    # level-1 exchange (by user) is the only wide dependency; the final
    # global agg coalesces to a single partition, no extra shuffle of
    # row data.
    assert plan.count("Exchange") <= 2

def test_lsh_banding_needs_no_cache_and_one_generate(spark, sf_smoke):
    """The band explode keeps banding map-side: no persisted signature
    frame (no InMemoryTableScan), banding appears as a Generate
    (explode) over one signature projection, and the only join is the
    band-key self-join."""
    plan = _explain(spark, "lsh_candidate_pairs", sf_smoke, "simple")
    assert "InMemoryTableScan" not in plan
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_jaccard_prefix_path_shape(spark, sf_smoke):
    """The PPJoin path must verify candidates with array_intersect on
    per-doc arrays (no pair-explosion aggregation) and keep every join
    keyed (no cartesian)."""
    plan = _explain(spark, "ngram_jaccard_pairs_prefix", sf_smoke, "simple")
    assert "array_intersect" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_cube_is_single_pass_partial_agg(spark, sf_smoke):
    """CUBE expands grouping sets in one Expand+aggregate pass — no
    union of repeated scans."""
    plan = _explain(spark, "cube_revenue", sf_smoke, "simple")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_decontamination_broadcasts_both_sides(spark, sf_smoke):
    """benchmark_decontamination (r4): the benchmark gram set and the
    contaminated-id set must both broadcast — document bodies never
    shuffle, no sort-merge join at any scale."""
    plan = _explain(spark, "benchmark_decontamination", sf_smoke, "simple")
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan


def test_repetition_filter_is_map_side_partial(spark, sf_smoke):
    """doc_repetition_filter (r4): map-only expressions + partial agg —
    exactly one exchange (the tiny per-lang final agg), no joins."""
    plan = _explain(spark, "doc_repetition_filter", sf_smoke, "simple")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # lang agg + _spread round-robin
    assert "partial" in plan.lower()


@pytest.mark.parametrize("name", ["cosine_topk", "pq_topk", "ivf_topk", "ivfpq_topk"])
def test_topk_ranking_is_two_stage_bounded(spark, sf_smoke, name):
    """The r4-verdict scale fix: per-query top-k must pre-select locally
    within (query, input-partition) before the global ranking window, so
    no single reducer ever sorts the whole corpus. The local stage shows
    up as a window keyed by (query_id, __pid__) over spark_partition_id;
    the global window then runs over the bounded survivors."""
    plan = _explain(spark, name, sf_smoke, "formatted")
    assert "SPARK_PARTITION_ID" in plan.upper() or "spark_partition_id" in plan, (
        f"{name}: no partition-local pre-selection stage"
    )
    assert "__pid__" in plan, f"{name}: local ranking not keyed by partition id"
    assert plan.count("Window") >= 2, f"{name}: expected local+global windows"


def test_pq_candidate_scan_carries_no_vectors(spark, sf_smoke):
    """pq_topk's ADC candidate windows must rank (query_id, corpus_id,
    score) triples only — embeddings and LUTs stay out of every ranking
    exchange (the re-rank fetches vectors via broadcast-join on the
    bounded candidate set instead)."""
    plan = _explain(spark, "pq_topk", sf_smoke, "formatted")
    lines = plan.splitlines()
    win_args = [
        ln for i, ln in enumerate(lines)
        if "Arguments" in ln and i > 0 and any(
            "Window" in prev for prev in lines[max(0, i - 3): i]
        )
    ]
    assert win_args, "no window nodes found in pq_topk plan"
    for ln in win_args:
        assert "__cvec__" not in ln and "__lut__" not in ln and "embedding" not in ln, (
            f"vectors/LUT leaked into a ranking window: {ln}"
        )


def test_substring_chunk_exchanges_carry_no_text(spark, sf_smoke):
    """The chunk self-join and pair aggregation must move only
    (id, hash) / (id, id) rows — document bodies stay at the scan."""
    plan = _explain(spark, "substring_chunk_pairs", sf_smoke)
    for ln in plan.splitlines():
        if ln.strip().startswith("Arguments: hashpartitioning") or (
            "BroadcastExchange" in ln
        ):
            assert "text#" not in ln, f"doc bodies entered an exchange: {ln}"
    assert "EvalPython" not in plan


def test_sequence_packing_windows_are_bucketed(spark, sf_smoke):
    """The running sum must decompose into (lang, bucket)-local windows
    plus a tiny per-bucket offset frame — a plain partitionBy(lang)
    window serializes each language through one task at corpus scale."""
    plan = _explain(spark, "sequence_packing", sf_smoke)
    assert "windowspecdefinition(lang" in plan
    # the doc-level window must be keyed by (lang, bucket), not lang alone
    assert any(
        "windowspecdefinition(lang" in ln and "bucket" in ln
        for ln in plan.splitlines()
    ), "doc-level cumsum window lost its bucket key"
    assert "BroadcastHashJoin" in plan, "bucket offsets must broadcast"


def test_pii_redact_is_pure_map(spark, sf_smoke):
    plan = _explain(spark, "pii_redact", sf_smoke, "simple")
    assert "Exchange" not in plan, "redaction must not shuffle"
    assert "EvalPython" not in plan


def test_stratified_sample_aggregates_map_side(spark, sf_smoke):
    plan = _explain(spark, "stratified_sample", sf_smoke, "simple")
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "EvalPython" not in plan


def test_map_only_queries_have_no_exchange(spark, sf_smoke):
    """The map-only scale claims: chunking and PII redaction are pure
    per-row transforms — ANY Exchange in their plans would mean an
    accidental shuffle of document bodies."""
    for name in ["document_chunking", "pii_redact"]:
        plan = _explain(spark, name, sf_smoke, "simple")
        assert "Exchange" not in plan, name


def test_lm_filter_model_joins_broadcast(spark, sf_smoke):
    """char_trigram_lm_filter: the trigram model and its total must
    reach the scoring join as broadcasts — a shuffle join there would
    move the exploded corpus grams twice."""
    plan = _explain(spark, "char_trigram_lm_filter", sf_smoke, "simple")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the single-row total
    assert "SortMergeJoin" not in plan


def test_funnel_single_user_shuffle(spark, sf_smoke):
    """funnel_conversion: one user-keyed exchange for the per-user fold
    (plus AQE's tiny final single-partition exchanges) — the 3-stage
    min-join formulation would show three user-keyed exchanges."""
    plan = _explain(spark, "funnel_conversion", sf_smoke, "simple")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_heavy_hitters_total_is_broadcast(spark, sf_smoke):
    plan = _explain(spark, "heavy_hitters", sf_smoke, "simple")
    # the counts->total attach must be a broadcast nested loop of a
    # single-row frame, never a cartesian of real data
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_prunes_text_and_ranks_two_stage(spark, sf_smoke):
    """The A-ES sampler must never read the text column (its keys come
    from doc_id/n_chars only) and must select via the two-stage bounded
    ranking — two window passes, not one global per-stratum sort."""
    plan = _explain(spark, "weighted_doc_sample", sf_smoke)
    sched = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in sched, "weighted sample reads document bodies"
    simple = _explain(spark, "weighted_doc_sample", sf_smoke, "simple")
    assert simple.count("RunningWindowFunction") >= 2 or simple.count("Window") >= 2
    assert "EvalPython" not in simple


def test_appended_index_query_still_prunes_partitions(spark, sf_smoke):
    """Appending batches must not break the cell-partitioned layout:
    the probe join over an appended index still plans dynamic partition
    pruning on the codes scan."""
    plan = _explain(spark, "ivfpq_appended_index_topk", sf_smoke)
    assert "dynamicpruning" in plan.lower() or "DynamicPruning" in plan, (
        "appended index lost DPP on the cell join"
    )


def test_ingest_pipeline_is_single_scan_single_shuffle(spark, sf_smoke):
    """corpus_ingest_pipeline: the four stage reports must come from ONE
    scan + ONE fingerprint-keyed shuffle (per-row stage flags + one
    conditional aggregation) — a union of per-stage aggregates would
    re-execute the window lineage once per branch."""
    plan = _explain(spark, "corpus_ingest_pipeline", sf_smoke, "simple")
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan


def test_snapshot_diff_exchanges_carry_fingerprints_not_bodies(spark, sf_smoke):
    """corpus_snapshot_diff's scale claim: the full-outer join moves
    (doc_id, fingerprint, n_chars) — md5 is computed in the Project
    BELOW the exchange, so document bodies never shuffle."""
    plan = _explain(spark, "corpus_snapshot_diff", sf_smoke)
    # Formatted mode splits each node into a "(N) Exchange" header and
    # an "Input [k]: [cols...]" detail line — the substring "Exchange
    # hashpartitioning" never occurs on ONE line here (that's simple
    # mode), so the check must pair headers with their Input lines.
    lines = plan.splitlines()
    n_checked = 0
    for i, ln in enumerate(lines):
        if re.match(r"^\(\d+\) Exchange", ln.strip()):
            for detail in lines[i + 1 : i + 6]:
                if detail.strip().startswith("Input"):
                    n_checked += 1
                    assert "text#" not in detail, (
                        f"doc bodies entered an exchange: {detail}"
                    )
                    break
    assert n_checked >= 1, "no Exchange node found — check is vacuous"
    assert "EvalPython" not in plan


def test_lsh_store_probe_never_reshingles_store(spark, sf_smoke):
    """lsh_store_ingest_candidates' scale claim: the stored corpus is
    probed AS WRITTEN — its band table scans as plain (ref_id, band_key,
    band_id) columns with NO shingle/minhash recomputation (exactly one
    Generate explode in the whole plan: the ingest batch's banding), and
    every join is keyed (no cartesian)."""
    plan = _explain(spark, "lsh_store_ingest_candidates", sf_smoke, "simple")
    assert plan.count("Generate explode") == 1, (
        "store side re-shingled — the store's point is probing as-written"
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_bpe_round_is_map_plus_partial_agg(spark, sf_smoke):
    """One BPE merge round = map-only replace + partially-aggregated
    pair count. The merge must add NO exchange on top of the word
    table (a per-round shuffle would make n_merges rounds n_merges
    shuffles of the vocabulary), and the pair count must combine
    map-side before its single exchange."""
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.operators.tokenizer import (
        _apply_merge,
        _initial_symbols,
        _pair_counts,
        word_frequencies,
    )
    from mrt_data_integration_spark.sources import load_table

    words = word_frequencies(load_table(spark, sf_smoke, "documents")).select(
        _initial_symbols(F.col("word")).alias("s"), "cnt"
    )

    def simple(df):
        return _explain_df(spark, df, "simple")

    base, merged = simple(words), simple(_apply_merge(words, "e", "r"))
    assert merged.count("Exchange") == base.count("Exchange"), (
        "merge application must be map-only — no new shuffle per round"
    )
    agg = simple(_pair_counts(words))
    assert re.search(r"partial_sum|HashAggregate.*partial", agg, re.I), (
        "pair counting must combine map-side"
    )
    assert agg.count("Exchange") == base.count("Exchange") + 1, (
        "pair counting must add exactly ONE exchange (the pair-key agg)"
    )


@pytest.mark.parametrize(
    "name", ["tfidf_top_terms", "weighted_minhash_signatures"]
)
def test_vocabulary_join_carries_no_unconditional_broadcast(
    spark, sf_smoke, name
):
    """The r11 verdict's broadcast-gating item: the corpus-wide
    distinct-term df table grows with the corpus (Zipf-bounded but
    unbounded in principle), so the idf join must NOT carry a hard
    broadcast hint — AQE decides from measured sizes. The ONLY
    broadcast hint in either query's analyzed plan is the 1-row
    n_docs aggregate (the DSIR/BM25 in-plan count pattern), pinned by
    checking the hinted subtree is that single-row count."""
    df = QUERIES[name](spark, sf_smoke)
    lines = (
        df._jdf.queryExecution().analyzed().toString().splitlines()
    )
    idxs = [i for i, ln in enumerate(lines) if "ResolvedHint" in ln]
    assert len(idxs) == 1, (
        f"{name}: expected exactly one broadcast hint (the 1-row "
        f"n_docs frame), found {len(idxs)}"
    )
    # the hint's child (next tree line) must be the global count(1)
    # aggregate — not the vocabulary df aggregate
    child = lines[idxs[0] + 1]
    assert "count(1)" in child and "__n_docs__" in child, (
        f"{name}: the sole broadcast hint must wrap the 1-row n_docs "
        f"aggregate, got: {child}"
    )
    # and n_docs is in-plan: no separate .count() action means the
    # analyzed plan itself references the aggregate, which the above
    # already proves; finally the df statistic must still exist
    # unhinted — since opt r14 it is a term-keyed count(1) over the
    # (doc, term)-distinct tf frame (an Aggregate in wminhash, a
    # term-partitioned Window in tfidf), value-identical to the old
    # count(DISTINCT doc_id) re-derivation it replaced
    assert any(
        "count(1) AS df" in ln
        or ("count(1) windowspecdefinition(term" in ln and "AS df" in ln)
        for ln in lines
    ), (
        f"{name}: vocabulary df aggregate missing from the plan"
    )
