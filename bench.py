"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line with per-query wall-clock seconds.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3; the two
stateful streaming drains run reps+2 — they are the suite's noisiest
queries) and the recorded number is the PER-QUERY MEDIAN — single-shot
numbers on a noisy box moved +/-15% round-over-round
(wcls_large_panel, r2->r3), which made regressions indistinguishable
from noise. "value" is the sum of medians; the diagnostics line's
"shots" map records the actual per-query shot count alongside the
min/max spread so a tightened median is never mistaken for a behavior
change.

Headline set covers every physical shape the engine exercises: scan+agg,
star broadcast join, fact-fact shuffle join, ranking window,
sessionization windows, two-level cluster meat, JSON extraction, text
shingle join, vector top-k, and the full distributed WCLS fit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from mrt_data_integration_spark.queries import QUERIES  # noqa: E402
from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.sources import load_table  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "star_join_revenue",
    "fact_fact_join",
    "topk_per_group",
    "group_moment_stats",
    "cluster_score_meat",
    "sessionization",
    "json_props_extract",
    "derive_weight_chain",
    "doc_quality_stats",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "lsh_candidate_pairs",
    "simhash_buckets",
    "cosine_topk",
    "embedding_similar_pairs",
    "embedding_similar_pairs_lsh",
    "training_data_prep",
    "wcls_cluster_robust",
    "wcls_large_panel",
    # round-4 additions — totals are not like-for-like with BENCH_r03 and
    # earlier; compare per-query medians (the "queries" map) across rounds
    "doc_repetition_filter",
    "benchmark_decontamination",
    "pwcls_fit",
    # round-5 additions: the ANN family is the most scale-sensitive
    # extension surface (r4 verdict #7) — track its wall-clock per round
    "ivf_topk",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_index_topk",
    # r5: iterative connected-components clustering (the one multi-round
    # shuffle loop in the engine) — track its wall-clock per round
    "dedup_clusters",
    # late-r5 additions: the per-user sorted-fold (funnel), the bucketed
    # range join, and the k-means + within-cell-join semantic dedup are
    # new physical shapes — track each per round
    "funnel_conversion",
    "campaign_event_attribution",
    "semantic_dedup_summary",
    # r6 additions: weighted per-stratum sampling (bounded_topk over
    # A-ES keys), the appended persisted index's query path, and the
    # watermark-stateful streaming dedup drain — three new physical
    # shapes, tracked per round from first registration
    "weighted_doc_sample",
    "ivfpq_appended_index_topk",
    "streaming_dedup_ingest",
    "lsh_store_ingest_candidates",
    "corpus_ingest_pipeline",
    "streaming_funnel_conversion",
    "training_shard_manifest",
    # late-r7 addition: iterative BPE tokenizer training — the second
    # multi-round driver loop (after dedup_clusters); per-round cost is
    # a small cached-table agg + O(1)-row collect, tracked per round
    "bpe_train_merges",
    # late-r7 addition: the watermarked stream-stream interval join —
    # a third stateful-streaming drain shape (two-sided join state vs
    # the dedup's keyed fingerprints and the funnel's per-user folds)
    "streaming_click_attribution",
    # r8 additions: three new operator families — the SCD2 window
    # collapse, the sequence()-explode gap-fill with two shared-sort
    # window fills, and BM25's pruned-postings join + per-query top-k
    "scd2_priority_history",
    "gap_filled_user_series",
    "bm25_doc_search",
    "lineitem_priority_regime",
    "leakage_safe_split",
    # r9 additions: hard-negative mining (label-filtered bounded cosine
    # top-k — the contrastive-training sampler), the streaming SCD2
    # drain (a fourth stateful-streaming shape: versioned dimension
    # state folded per micro-batch), the PassJoin edit-distance pair
    # join (segment-indexed equi-join + levenshtein verify), and the
    # Bloom-gated decontamination (two-phase exact)
    "hard_negative_mining",
    "streaming_scd2_history",
    "fuzzy_title_pairs",
    "bloom_decontamination",
    # late-r9: span-level duplicate removal — the corpus-rewrite shape
    # (r10: chunk-hash winner aggregate + join-back, persisted chunking)
    "dedup_spans_rewrite",
    # r10: deterministic Lloyd's k-means — the iterative
    # assign/re-estimate driver loop over the Arrow-batched numpy
    # kernel (a new physical shape: per-iteration barrier with k×(d+1)
    # partial shuffles)
    "embedding_kmeans_cells",
    # late-r10: DSIR importance-resampling selection — hashed-feature
    # explode + two bucket-model aggregates + broadcast-ratio join +
    # global TakeOrdered (the data-selection shape)
    "dsir_selected_sample",
    # r11: PMI collocation extraction — the term-term co-occurrence
    # shape (map-side windowed pair expression → pair/unigram hash
    # aggregates → Zipf-floor prune → two vocab joins)
    "pmi_collocations",
    # late-r11: weighted MinHash — tf-idf order-sampling signatures
    # (n_hashes map-side keys per (doc, term) → one max_by aggregate
    # per (doc, seed))
    "weighted_minhash_signatures",
    # late-r11: boilerplate removal — the corpus-frequency rewrite
    # shape (persisted chunking → two-phase distinct aggregate →
    # broadcast frequency join → doc-keyed reassembly)
    "boilerplate_span_removal",
    # late-r11: T5 span-corruption pairs — the pure map-side
    # training-pair shape (one scan, no shuffle, no UDF)
    "span_corruption_pairs",
    # late-r11: margin-based pair mining — the bidirectional
    # rank-and-normalize shape (one persisted scored frame, two
    # bounded rankings, stat joins)
    "margin_mined_pairs",
    # r12: CCNet perplexity filter — the bounded-model scoring shape
    # (two train hash-aggs, map-side bigram explode, three broadcast
    # model joins, one doc-grain collapse)
    "lm_perplexity_filter",
    # r12: semantic decontamination — the broadcast-benchmark
    # map-side-max shape (crossJoin collapsed by partial max before
    # one narrow exchange)
    "semantic_decontamination",
    # r12: winnowing fingerprint profile — the pure-map local
    # fingerprint selection (window minima over a materialized hash
    # array; one scan, zero shuffles)
    "winnowing_profile",
    # mid-r12: positional phrase search — the slot-vote shape
    # (posexplode postings × broadcast phrase frame → two partial-agg
    # shuffles on narrow int keys)
    "phrase_search_occurrences",
    # mid-r12: winnowing-gated substring decontamination — the
    # sparse-index contamination shape (two pure-map fingerprint
    # selections → distinct (doc, fp) longs → broadcast-benchmark
    # equi-join → pair counts)
    "winnowing_decontamination",
    # late-r12: quality-ranked canonical selection — the CC loop plus
    # a per-component struct-max argmax + unhinted component join-back
    "quality_canonical_dedup",
    # late-r12: two-sample KS drift profile — the value-grain-collapse
    # + bounded-global-window shape
    "length_drift_ks",
    # r13: categorical drift (PSI + chi-square) — the category-grain
    # collapse + 1-row-totals broadcast shape (no window at all)
    "lang_category_drift",
    # r13: token-budget selection — the per-group ranked prefix fill
    # (one group-keyed shuffle, two running expressions on one sort)
    "token_budget_selection",
    # r13: token-diversity profile — the sorted-array RLE sequential
    # fold (pure map, zero shuffles; order-pinned float accumulation)
    "token_diversity_stats",
    # r13: containment pairs — the asymmetric overlap-coefficient
    # variant of the shingle-keyed pair join (no size-ratio prune, so
    # the df cap is the fan-out control)
    "containment_dedup_pairs",
    # r13: corpus rank-frequency diagnostics — token-grain shuffle +
    # two-phase bounded top-k + rank-ordered regression fold
    "zipf_lexical_profile",
    # r14: Heaps'-law vocabulary-growth curve — the bounded checkpoint
    # fan-out cumulation (no global window/sort) + ordered fit fold
    "heaps_vocab_growth",
    # r14: source-overlap duplication audit — the corpus-grain matrix
    # shape ((source, shingle) distinct → |S|-bounded source sets →
    # map-side pair expansion → pair-grain integer count)
    "source_overlap_audit",
    # r14: grouped robust median/MAD outlier flags — the domain-bounded
    # exact-order-statistic shape (two (group, value) count collapses +
    # bounded windows; no hot-language reducers)
    "robust_quality_outliers",
    # r14: PPMI word similarity — the inverted-index sparse matrix
    # product (context-keyed join + order-pinned dot/norm folds)
    "ppmi_word_similarity",
    # r14: the IVF semantic-decontamination production path promoted
    # to a driver seat — kmeans_lloyd train + cell-pruned probe +
    # map-side partial-max collapse (tracked per round from its first
    # driver registration, like every ANN-family member)
    "semantic_decontamination_ivf",
    # late-r14: source-pair Jensen–Shannon divergence — the all-pairs
    # distributional drift shape (top-V bucketing + bucket-keyed pair
    # join + three order-pinned folds + closed-form disjoint mass)
    "source_js_divergence",
    # mid-r14-continuation addition
    "idf_shingle_neighbors",
    "relational_quality_audit",
    "lang_agreement_kappa",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("mrt-bench")
    # Warm the JVM once so per-query numbers measure the queries, not
    # one-time machinery: codegen, the shuffle subsystem, the parquet
    # reader, and the Python/Arrow worker pool all initialize lazily on
    # first use.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    load_table(spark, sf_dir, "region").collect()
    spark.range(10_000).mapInPandas(
        lambda it: it, "id long"
    ).selectExpr("sum(id)").collect()
    # Arrow collect + CollectLimit machinery (the estimators' driver-side
    # sufficient-stats path) also initializes lazily.
    spark.range(10_000).groupBy((F.col("id") % 100).alias("k")).agg(
        F.sum("id").alias("s")
    ).limit(1_000).toPandas()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # The two stateful streaming drains are the suite's noisiest
    # queries (micro-batch scheduling + state-store commits swing well
    # beyond the batch queries' band — results/SCALING_CURVE.md late-r7
    # notes); extra shots tighten their reported median for ~15 s of
    # extra wall, which the headline number never sees.
    NOISY = {
        "streaming_funnel_conversion",
        "streaming_dedup_ingest",
        "streaming_click_attribution",
        "streaming_scd2_history",
        # r12: sub-second SCD collapse whose first shot carries the
        # window codegen; single tail draws kept reading as phantom
        # 1.5-1.8x movers (worktree-A/B'd clean twice this round) —
        # widen to 5 shots so the median sheds them
        "scd2_priority_history",
    }
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    n_shots: dict[str, int] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        shots: list[float] = []
        n_shots[name] = reps + 2 if name in NOISY else reps
        for _ in range(n_shots[name]):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            shots.append(time.perf_counter() - t0)
            _ = len(rows)
        shots.sort()
        # lower-middle median: identical for odd reps (the driver's 3),
        # but for even reps shots[n//2] is the UPPER middle — at reps=2
        # that reported the MAX of two shots, which read as a phantom
        # 1.7× regression in an r8 preview (results/LATE_R8_NOTES.md)
        times[name] = round(shots[(len(shots) - 1) // 2], 3)
        spread[name] = [round(shots[0], 3), round(shots[-1], 3)]

    total = round(sum(times.values()), 3)
    # Diagnostics (per-query medians + min/max spread) go on their OWN
    # earlier lines: the driver only keeps the tail of stdout and parses
    # the FINAL line as JSON — r5's single fat line (~2.6 KB with spread
    # included) outgrew that capture and the round's headline number was
    # lost (BENCH_r05.json "parsed": null), and by r12/r13 the "queries"
    # map alone (~69 entries) had re-grown the final line past the
    # driver's 2000-char capture, losing the headline two rounds running
    # (the r13 verdict's item 2). The final line is now a fixed handful
    # of scalar fields (~100 bytes) and can never outgrow the capture.
    print(json.dumps({"spread_min_max": spread, "shots": n_shots, "reps": reps}))
    print(json.dumps({"queries": times}))
    # Artifact transparency (r14 verdict item): the persisted-store
    # families (ANN indexes, LSH signature store, training shards,
    # streamable staging dirs) build /tmp artifacts keyed on
    # (corpus, mtime) through sources.sinks.build_and_publish; whether
    # a run PAID a cold build or reused a published artifact changes
    # how its medians should be read, so say which happened.
    from mrt_data_integration_spark.sources.sinks import BUILD_EVENTS

    # only the SHARED /tmp store families (mrt_* indexes/stores/shards,
    # graft_* staging dirs) — versioned-state steps inside per-run
    # private state dirs also route through build_and_publish but
    # rebuild by design every run and would drown the signal
    shared = [
        (os.path.basename(p), b)
        for p, b in BUILD_EVENTS
        if os.path.basename(p).startswith(("mrt_", "graft_"))
    ]
    built = sorted({n for n, b in shared if b})
    reused = sorted({n for n, b in shared if not b} - set(built))
    print(json.dumps({"artifacts_built": built, "artifacts_reused": reused}))
    sys.stdout.flush()
    # The per-query medians ALSO go out in compact 2-decimal chunks
    # immediately before the final line (r14 verdict item 1): the
    # driver keeps only the last ~2000 chars of stdout, and the full
    # 3-decimal map above is one ~2.5 KB line that lands truncated
    # mid-object there (r14: PERF per_query empty, judge-side tail
    # reconstruction). Chunking at <=600 bytes per line keeps each
    # line a complete JSON object, so the tail always carries the last
    # ~3 chunks (~60+ queries) parseable + the headline; the chunks
    # are emitted in HEADLINE order, so WHICH queries fall off the
    # front is stable round-over-round. The full-precision map above
    # stays authoritative for committed raw reads.
    chunk: dict[str, float] = {}
    chunks: list[dict[str, float]] = []
    for name, sec in times.items():
        trial = dict(chunk)
        trial[name] = round(sec, 2)
        line = json.dumps(
            {"queries_part": "99/99", "queries": trial},
            separators=(",", ":"),
        )
        if chunk and len(line) > 580:
            chunks.append(chunk)
            chunk = {}
        chunk[name] = round(sec, 2)
    if chunk:
        chunks.append(chunk)
    for i, part in enumerate(chunks):
        print(
            json.dumps(
                {"queries_part": f"{i + 1}/{len(chunks)}", "queries": part},
                separators=(",", ":"),
            )
        )
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "n_queries": len(times),
                "sf": sf,
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
