"""Driver-contract query registry.

Every operator family from SURVEY.md §2 surfaces here as a named query
(a ``(spark, sf_dir) -> DataFrame`` callable) plus, where SQL-expressible,
a DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports this
registry to the driver.

Importing this package registers all query modules.
"""

from mrt_data_integration_spark.queries.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# Import for side effect: each module registers its queries.
from mrt_data_integration_spark.queries import (  # noqa: F401, E402
    aggregates,
    derived,
    estimators,
    joins,
    pipeline,
    profiling,
    simulation,
    text_dedup,
    timeseries,
    vectors,
)

# --- Explicit registration order -------------------------------------------
# The grading driver records correctness rows for the FIRST 50 queries in
# registration order only (verified: CORRECTNESS_r01/r02/r03 key sets equal
# order[:50]).  Import order is therefore load-bearing, and appending new
# queries at the end silently un-verifies them.
#
# ROTATION POLICY (round 4+): the registry (103 queries as of r6) is split
# into a CORE of 32 queries (one per physical shape — scan/agg, joins,
# windows, pivots, dedup, text — always in the window) and two pools
# (POOL_A: 37, POOL_B: 34) that ALTERNATE rounds, so no query goes more
# than two rounds without a driver row:
#   - POOL_A (E4 vectors, E6/E7 timeseries, r2 text additions): driver rows
#     in r3 (CORRECTNESS_r03) and r5, scheduled again for r7, ...
#   - POOL_B (scalar/derive oracle queries + no_oracle estimator fits):
#     driver rows in r1/r2/r4, scheduled for r6, ...
# Exception rules, applied in order:
#   1. any query whose latest driver row was red is force-included next round
#      regardless of pool (r4: `sessionization` — its r3 hash-fail was an
#      oracle-side HUGEINT cast, confirmed green in r4);
#   2. any query with ZERO driver-row history is force-included in its first
#      eligible round (r4: `doc_repetition_filter` + `benchmark_decontamination`
#      — the other two r4 additions, `training_mix_rebalance` + `pq_topk`,
#      missed the r4 freeze and are in POOL_A's r5 turn below; r5:
#      `petwcls_fit`, the IVFADC pair, and the four E10 pipeline queries,
#      force-included from POOL_B / POOL_A).
# CORE members with the longest green history sit out to make room when the
# forced set pushes the window past 50; their physical shapes must stay
# covered by an in-window query (noted per round at _WINDOW).
# Every rotated-out oracle query remains DuckDB-verified each CI run by
# tests/test_oracle_parity.py; rotated-out no_oracle fits keep their golden
# tests.
_POOL_A: list[str] = [
    "char_ngram_min_sketch",
    "simhash_buckets",
    "gopher_quality_flags",
    "deterministic_split",
    "training_data_prep",
    "events_hourly_rollup",
    "sessionization",
    "asof_latest_order",
    "json_props_extract",
    "user_activity_lag_features",
    "stateful_capped_sessions",
    "embedding_norm_stats",
    "cosine_topk",
    "label_centroids",
    "embedding_similar_pairs",
    "lsh_bucket_profile",
    "embedding_similar_pairs_lsh",
    "ivf_topk",
    # joined in r4 (first two got r4 driver rows; the last two get their
    # first rows in r5 with the rest of pool A)
    "doc_repetition_filter",
    "benchmark_decontamination",
    "training_mix_rebalance",
    "pq_topk",
    # r5 additions (E4 — IVFADC online + persisted-index variants; zero
    # driver history until r5, where exception rule 2 force-includes them)
    "ivfpq_topk",
    "ivfpq_index_topk",
    # r5 additions (E10 — training-pipeline post-processing: dup-cluster
    # resolution, stratified sampling, sequence packing, PII redaction;
    # zero driver history until r5, force-included per rule 2)
    "dedup_clusters",
    "stratified_sample",
    "sequence_packing",
    "pii_redact",
    # late-r5 additions (E10 — substring-chunk dedup, model-based corpus
    # filter); forced into the r5 window per rule 2, two more CORE
    # members sit out (see _R5_SIT_OUT)
    "substring_chunk_pairs",
    "lang_classifier_scores",
    # r6 additions (E10 — A-ES weighted sampling + composed ingest
    # pipeline + shard manifest; E4 — incremental index append; E3 — LSH store;
    # E3×E6 — streaming ingest dedup; E6 — streaming funnel): registered
    # after the r6 window froze, zero driver history; POOL_A's r7 turn
    # force-includes all seven per exception rule 2.
    "weighted_doc_sample",
    "ivfpq_appended_index_topk",
    "streaming_dedup_ingest",
    "lsh_store_ingest_candidates",
    "corpus_ingest_pipeline",
    "streaming_funnel_conversion",
    "training_shard_manifest",
]
_POOL_B: list[str] = [
    "filter_project",
    "derive_weight_chain",
    "counterfactual_pseudo_outcome",
    "ci_coverage_flags",
    "union_pooled_studies",
    "csv_roundtrip",
    "string_report_format",
    "colsums_single_row",
    "pwcls_fit",
    "etwcls_fit",
    "drwcls_fit",
    "awcls_fit",
    # r5 addition (M5 — the paper's headline method; zero driver history
    # until r5, where exception rule 2 force-includes it)
    "petwcls_fit",
    # late-r5 additions (E11 sketches, S7 partitioned sink, E3 semantic
    # dedup) — registered AFTER the r5 window froze, so they sit in
    # POOL_B with zero driver history and MUST be force-included in the
    # r6 window per exception rule 2 (first driver rows in r6).
    "heavy_hitters",
    "hll_daily_distinct",
    "approx_distinct_quantiles",
    "partitioned_parquet_roundtrip",
    "semantic_dedup_summary",
    "funnel_conversion",
    "value_histogram",
    "campaign_event_attribution",
    "incremental_rollup_merge",
    "stratified_fixed_k_sample",
    "document_chunking",
    "corpus_snapshot_diff",
    "char_trigram_lm_filter",
    "streaming_rollup_merge",
    "window_rank_features",
    "estimator_report_pivot",
    "synthetic_panel_stats",
    "multimodal_features",
    "wcls_large_panel",
    "sensitivity_scenarios",
    "mc_simulation_grid",
]
_CORE: list[str] = [
    "pricing_summary",
    "cluster_score_meat",
    "weighted_gram",
    "group_moment_stats",
    "relative_efficiency",
    "group_best_highlight",
    "pivot_method_by_coef",
    "unpivot_long",
    "rollup_hierarchy",
    "cube_revenue",
    "exact_percentiles",
    "running_total",
    "distinct_exact",
    "argmax_per_group",
    "topk_per_group",
    "regr_by_group",
    "wls_normal_equations",
    "wcls_cluster_robust",
    "star_join_revenue",
    "fact_fact_join",
    "semi_join_active_customers",
    "anti_join_dormant_customers",
    "brand_part_rollup",
    "doc_quality_stats",
    "doc_lang_id",
    "doc_fingerprint_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "tfidf_top_terms",
    "bpe_ish_token_counts",
]
# Round 6 window: POOL_B's turn (34 queries, including the FIFTEEN late-r5
# additions with zero driver history — the E11 sketch family
# (`heavy_hitters`, `hll_daily_distinct`, `approx_distinct_quantiles`,
# `incremental_rollup_merge`, `streaming_rollup_merge`, `value_histogram`),
# the S7 partitioned sink (`partitioned_parquet_roundtrip`),
# `semantic_dedup_summary`, `funnel_conversion`,
# `campaign_event_attribution`, `stratified_fixed_k_sample`,
# `document_chunking`, `corpus_snapshot_diff`, `char_trigram_lm_filter`,
# `window_rank_features` — all force-included per exception rule 2; this
# is the r5 verdict's promised rotation). No r5 row was red, so rule 1
# forces nothing. 34 + CORE(32) = 66 → SIXTEEN CORE members sit out.
# The thirteen r5 sit-outs RETURN (they last had rows in r4; sitting out
# again would break the no-query-waits-more-than-two-rounds invariant);
# sixteen CORE members with fresh green r5 rows sit out instead — shapes
# stay covered:
# `group_moment_stats` (scan + grouped agg) by `exact_percentiles` +
#   `colsums_single_row` + `pricing_summary` (returning); bench-tracked,
# `cluster_score_meat` (two-level cluster agg) by `weighted_gram` (grouped
#   gram) + `wcls_large_panel` (same meat path inside the fit);
#   bench-tracked,
# `group_best_highlight` by `argmax_per_group` (returning),
# `unpivot_long` by `pivot_method_by_coef` (reshape, returning) +
#   `estimator_report_pivot`,
# `cube_revenue` by `rollup_hierarchy` (grouping sets, returning),
# `topk_per_group` (ranking window) by `tfidf_top_terms` (returning) +
#   `window_rank_features`; bench-tracked,
# `wls_normal_equations` by `regr_by_group` (returning) + `weighted_gram`,
# `wcls_cluster_robust` (full fit) by `pwcls_fit`/`etwcls_fit`/... in
#   POOL_B + `wcls_large_panel`; bench-tracked,
# `fact_fact_join` (shuffle join) by `star_join_revenue` (returning) +
#   `campaign_event_attribution`; bench-tracked,
# `semi_join_active_customers` by `anti_join_dormant_customers`
#   (returning — same semi/anti family),
# `brand_part_rollup` by `star_join_revenue` + `rollup_hierarchy`,
# `doc_quality_stats` (map-only text exprs) by `doc_lang_id` (returning) +
#   `gopher`-style flags inside `char_trigram_lm_filter`; bench-tracked,
# `minhash_signatures` (shingle-explode-agg) by `tfidf_top_terms` +
#   `document_chunking` (explode); bench-tracked,
# `lsh_candidate_pairs` (band self-join) by `ngram_jaccard_pairs_prefix`
#   (returning pair join) + `semantic_dedup_summary`; bench-tracked,
# `ngram_jaccard_pairs` by `ngram_jaccard_pairs_prefix` (returning — same
#   join, prefix-filtered); bench-tracked,
# `bpe_ish_token_counts` (tokenizer exprs, fresh r5 row) by
#   `tfidf_top_terms` (returning) + `document_chunking`.
# Staying in despite fresh r5 rows: `relative_efficiency` (reference-row
# normalization has no other in-window representative), `distinct_exact` +
# `doc_fingerprint_dedup` (exact-dedup shape — none of the returning
# thirteen covers it). ALL thirteen r5 sit-outs return, pricing_summary
# included — the no-query-waits-more-than-two-rounds invariant holds with
# no exceptions (test_window_policy.py pins it).
_R6_SIT_OUT = (
    "bpe_ish_token_counts",
    "cluster_score_meat",
    "group_moment_stats",
    "group_best_highlight",
    "unpivot_long",
    "cube_revenue",
    "topk_per_group",
    "wls_normal_equations",
    "wcls_cluster_robust",
    "fact_fact_join",
    "semi_join_active_customers",
    "brand_part_rollup",
    "doc_quality_stats",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
)
_WINDOW: list[str] = (
    _POOL_B
    + [n for n in _CORE if n not in _R6_SIT_OUT]
)
# r7 plan: POOL_A's turn (36, including the SEVEN r6 additions with zero
# driver history — `weighted_doc_sample`, `ivfpq_appended_index_topk`,
# `streaming_dedup_ingest`, `lsh_store_ingest_candidates`,
# `corpus_ingest_pipeline`, `streaming_funnel_conversion`,
# `training_shard_manifest` — forced per rule 2) + CORE(32) = 68 →
# EIGHTEEN CORE members sit out; the sixteen r6 sit-outs return first
# (every one of them has only an r5 row by then), so the two extra
# sit-outs come from the sixteen CORE members holding fresh r6 rows.
# Any r6 red row is force-included per rule 1. Queries added in r7 are
# forced into their first eligible window per rule 2 —
# test_window_policy.py enforces the bookkeeping either way.


def _apply_window() -> None:
    missing = [n for n in _WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"window references unregistered queries: {missing}")
    # The driver records exactly the first 50 — a shorter window wastes
    # verification slots, a longer one silently un-verifies the overflow
    # (the r4 slip ADVICE.md flagged: two "force-included" queries were
    # actually past position 50).
    if len(_WINDOW) != 50:
        raise RuntimeError(
            f"driver window must be exactly 50 queries, got {len(_WINDOW)}"
        )
    if len(set(_WINDOW)) != len(_WINDOW):
        dupes = sorted({n for n in _WINDOW if _WINDOW.count(n) > 1})
        raise RuntimeError(f"driver window has duplicates: {dupes}")
    ordered = _WINDOW + [n for n in QUERIES if n not in set(_WINDOW)]
    for registry in (QUERIES, ORACLES):
        reordered = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(reordered)


_apply_window()
