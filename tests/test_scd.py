"""SCD2 operators (operators/scd.py): changelog run-collapse semantics,
null-safe change detection, and the merge==rebuild identity that makes
the incremental path trustworthy."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.scd import (
    changelog_to_scd2,
    scd2_merge,
)


def _ts(d):
    return datetime(2024, 1, d)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, ts timestamp, rid long"
    )


def _hist(spark, log):
    return changelog_to_scd2(log, ["k"], ["attr"], ["ts", "rid"], "ts")


def test_run_collapse_and_versioning(spark):
    log = _log(
        spark,
        [
            (1, "A", _ts(1), 1),
            (1, "A", _ts(2), 2),  # no change — same run
            (1, "B", _ts(3), 3),  # new version
            (1, "B", _ts(4), 4),
            (1, "A", _ts(5), 5),  # back to A → THIRD version, not merged
            (2, "X", _ts(1), 6),
        ],
    )
    got = sorted(
        _hist(spark, log).collect(), key=lambda r: (r.k, r.version)
    )
    assert [(r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
            for r in got] == [
        (1, "A", _ts(1), _ts(3), 1, False),
        (1, "B", _ts(3), _ts(5), 2, False),
        (1, "A", _ts(5), None, 3, True),
        (2, "X", _ts(1), None, 1, True),
    ]


def test_null_transitions_open_versions(spark):
    """NULL→value and value→NULL are changes; NULL→NULL is not — a
    plain != would return NULL on every comparison with a NULL side and
    silently drop those version boundaries."""
    log = _log(
        spark,
        [
            (1, None, _ts(1), 1),
            (1, None, _ts(2), 2),  # NULL → NULL: same run
            (1, "A", _ts(3), 3),  # NULL → A: new version
            (1, None, _ts(4), 4),  # A → NULL: new version
        ],
    )
    got = sorted(_hist(spark, log).collect(), key=lambda r: r.version)
    assert [(r.attr, r.version) for r in got] == [
        (None, 1), ("A", 2), (None, 3)
    ]


def test_merge_equals_rebuild(spark):
    """Folding a later batch into an existing history must yield
    EXACTLY the history rebuilt from the concatenated log — versions,
    closed rows, untouched keys, brand-new keys, all of it."""
    early = [
        (1, "A", _ts(1), 1),
        (1, "B", _ts(3), 2),
        (2, "X", _ts(1), 3),
        (3, "Q", _ts(2), 4),  # untouched by the batch
    ]
    late = [
        (1, "B", _ts(5), 5),  # unchanged → extends no version
        (1, "C", _ts(6), 6),  # closes (1, B), opens v3
        (2, "Y", _ts(5), 7),  # closes (2, X)
        (9, "N", _ts(5), 8),  # brand-new key → version starts at 1
        (9, "M", _ts(6), 9),
    ]
    hist = _hist(spark, _log(spark, early))
    merged = scd2_merge(
        hist, _log(spark, late), ["k"], ["attr"], ["ts", "rid"], "ts"
    )
    rebuilt = _hist(spark, _log(spark, early + late))
    key = lambda r: (r.k, r.version)  # noqa: E731
    got = sorted(
        [(r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
         for r in merged.collect()]
    )
    want = sorted(
        [(r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
         for r in rebuilt.collect()]
    )
    assert got == want


def test_merge_untouched_keys_pass_through_unshuffled(spark):
    """Affected-key pruning: the anti/semi probes must broadcast (the
    batch key set is micro-batch sized), so closed history rows never
    enter a shuffle."""
    hist = _hist(
        spark,
        _log(spark, [(i, "A", _ts(1), i) for i in range(20)]),
    )
    batch = _log(spark, [(0, "B", _ts(9), 99)])
    merged = scd2_merge(hist, batch, ["k"], ["attr"], ["ts", "rid"], "ts")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {(r.k, r.version): r for r in merged.collect()}
    assert rows[(0, 1)].is_current is False
    assert rows[(0, 2)].attr == "B" and rows[(0, 2)].is_current
    assert rows[(5, 1)].is_current  # untouched


def test_point_in_time_join_version_selection(spark):
    """Each fact lands in the version interval containing its ts —
    half-open [valid_from, valid_to), NULL valid_to = current; facts
    before the first version survive only under how='left'."""
    from mrt_data_integration_spark.operators.scd import point_in_time_join

    hist = _hist(
        spark,
        _log(
            spark,
            [(1, "A", _ts(2), 1), (1, "B", _ts(5), 2), (2, "X", _ts(3), 3)],
        ),
    )
    facts = spark.createDataFrame(
        [
            (100, 1, _ts(1)),  # before first version → unmatched
            (101, 1, _ts(2)),  # boundary: valid_from inclusive → A
            (102, 1, _ts(4)),  # inside [2, 5) → A
            (103, 1, _ts(5)),  # boundary: valid_to exclusive → B
            (104, 1, _ts(9)),  # current version → B
            (105, 2, _ts(7)),  # key 2 current → X
        ],
        "fact_id long, k long, ts timestamp",
    )
    out = point_in_time_join(
        facts, hist, ["k"], "ts", how="left", broadcast_history=True
    )
    got = {r.fact_id: r.attr for r in out.collect()}
    assert got == {
        100: None, 101: "A", 102: "A", 103: "B", 104: "B", 105: "X"
    }
    # inner join drops the pre-history fact
    inner = point_in_time_join(facts, hist, ["k"], "ts")
    assert inner.count() == 5
    # equi key drives the join — never a nested loop / cartesian
    plan = inner._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_equals_rebuild_randomized(spark):
    """Seeded fuzz over adversarial change logs: few keys (dense
    collisions), few attribute values (long runs AND rapid flips),
    NULL attributes, same-ts tiebreaker collisions, batch keys that are
    new/unchanged/churning. Any ordered split point must satisfy
    merge == rebuild."""
    import random

    rng = random.Random(20260815)
    for trial in range(4):
        n = rng.randint(8, 24)
        rows = []
        t = 0
        for rid in range(n):
            t += rng.choice([0, 0, 1, 2])  # repeated ts exercise the
            # rid tiebreaker
            rows.append(
                (
                    rng.randint(1, 4),
                    rng.choice(["A", "B", None]),
                    _ts(1 + t),
                    rid,
                )
            )
        # the merge contract needs the batch strictly later by seq —
        # split at a ts boundary so no (key-agnostic) ts straddles it
        rows.sort(key=lambda r: (r[2], r[3]))
        cut = rng.randint(1, n - 1)
        while 0 < cut < n and rows[cut][2] == rows[cut - 1][2]:
            cut += 1
        early, late = rows[:cut], rows[cut:]
        if not early or not late:
            continue
        hist = _hist(spark, _log(spark, early))
        merged = scd2_merge(
            hist, _log(spark, late), ["k"], ["attr"], ["ts", "rid"], "ts"
        )
        rebuilt = _hist(spark, _log(spark, early + late))
        # None-safe sort key: attr/valid_to can be NULL, and Python
        # refuses to order str vs None — key by (k, version) which is
        # unique per history row, then compare the full tuples.
        key = lambda t: (t[0], t[4])  # noqa: E731
        got = sorted(
            (
                (r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
                for r in merged.collect()
            ),
            key=key,
        )
        want = sorted(
            (
                (r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
                for r in rebuilt.collect()
            ),
            key=key,
        )
        assert got == want, f"trial {trial} cut {cut}: {got} != {want}"


def test_point_in_time_join_rejects_right_joins(spark):
    """Right/full joins would silently lose unmatched history keys
    (the history key columns are dropped after the join) — rejected."""
    import pytest

    from mrt_data_integration_spark.operators.scd import point_in_time_join

    facts = spark.createDataFrame([(1, 5)], "k long, ts long")
    hist = spark.createDataFrame(
        [(1, "A", 0, None)], "k long, attr string, valid_from long, valid_to long"
    )
    with pytest.raises(ValueError, match="inner"):
        point_in_time_join(facts, hist, ["k"], "ts", how="right")
    with pytest.raises(ValueError, match="inner"):
        point_in_time_join(facts, hist, ["k"], "ts", how="full")


def test_point_in_time_join_randomized(spark):
    """Seeded fuzz vs a python twin: random change logs collapsed to
    histories, random fact timestamps (before/at/between/after version
    boundaries, same-ts collisions) — each fact must land in exactly
    the version whose half-open interval contains it, or survive with
    NULL dims only under how='left'."""
    import random

    from mrt_data_integration_spark.operators.scd import (
        changelog_to_scd2,
        point_in_time_join,
    )

    rng = random.Random(20260815)
    for trial in range(3):
        log = []
        rid = 0
        for key in range(1, 5):
            t = 0
            for _ in range(rng.randint(1, 6)):
                t += rng.randint(1, 3)
                log.append((key, rng.choice(["A", "B", "C"]), _ts(t), rid))
                rid += 1
        hist = changelog_to_scd2(
            _log(spark, log), ["k"], ["attr"], ["ts", "rid"], "ts"
        )
        # python twin of the collapse: first row per run of equal attr
        versions = {}  # key -> [(vf, vt, attr)]
        by_key = {}
        for k_, a, ts, r in sorted(log, key=lambda x: (x[0], x[2], x[3])):
            by_key.setdefault(k_, []).append((ts, a))
        for k_, seq in by_key.items():
            vs = []
            for ts, a in seq:
                if not vs or vs[-1][2] != a:
                    vs.append([ts, None, a])
            for i in range(len(vs) - 1):
                vs[i][1] = vs[i + 1][0]
            versions[k_] = vs
        facts = [
            (fid, rng.randint(1, 6), _ts(rng.randint(1, 20)))
            for fid in range(40)
        ]
        fdf = spark.createDataFrame(facts, "fact_id long, k long, ts timestamp")
        out = point_in_time_join(
            fdf, hist, ["k"], "ts", how="left"
        ).collect()
        got = {r.fact_id: r.attr for r in out}
        assert len(out) == len(facts), "left join must keep every fact"
        for fid, k_, ts in facts:
            want = None
            for vf, vt, a in versions.get(k_, []):
                if ts >= vf and (vt is None or ts < vt):
                    want = a
                    break
            assert got[fid] == want, (trial, fid, k_, ts, got[fid], want)


def _snap_tuples(df):
    return sorted(map(tuple, df.collect()))


def test_cdc_apply_basics(spark):
    """Upsert + delete + latest-wins within one batch, bootstrap from
    None, and untouched-key passthrough — hand-computed walk."""
    from mrt_data_integration_spark.operators.scd import apply_cdc_changes

    schema = "k long, attr string, seq long, op string"
    b0 = spark.createDataFrame(
        [(1, "A", 1, "U"), (2, "X", 2, "U"), (3, "Q", 3, "U")], schema
    )
    snap = apply_cdc_changes(
        None, b0, key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    assert _snap_tuples(snap) == [(1, "A", 1), (2, "X", 2), (3, "Q", 3)]
    # batch 1: k=1 updated twice (latest wins), k=2 deleted, k=3 absent
    b1 = spark.createDataFrame(
        [(1, "B", 4, "U"), (1, "C", 5, "U"), (2, "X", 6, "D")], schema
    )
    snap = apply_cdc_changes(
        snap, b1, key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    assert _snap_tuples(snap) == [(1, "C", 5), (3, "Q", 3)]
    # delete-then-revive INSIDE one batch: the latest event wins
    b2 = spark.createDataFrame(
        [(3, "Q", 7, "D"), (3, "R", 8, "U"), (1, "C", 9, "D")], schema
    )
    snap = apply_cdc_changes(
        snap, b2, key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    assert _snap_tuples(snap) == [(3, "R", 8)]


def test_cdc_fold_equals_one_shot_collapse_randomized(spark):
    """The sequential fold over ordered batches must equal the one-shot
    latest-event collapse of the concatenated log — the identity the
    driver oracle rides."""
    import random

    from mrt_data_integration_spark.operators.scd import apply_cdc_changes

    rng = random.Random(20260815)
    schema = "k long, attr string, seq long, op string"
    for trial in range(5):
        events = [
            (
                rng.randint(1, 12),
                rng.choice("ABCDE"),
                seq,
                "D" if rng.random() < 0.25 else "U",
            )
            for seq in range(60)
        ]
        # one-shot: latest event per key, kept iff not a delete
        latest = {}
        for k, a, s, op in events:
            latest[k] = (a, s, op)
        want = sorted(
            (k, a, s) for k, (a, s, op) in latest.items() if op != "D"
        )
        # fold in 4 seq-ordered batches
        snap = None
        for lo in range(0, 60, 15):
            b = spark.createDataFrame(
                [e for e in events if lo <= e[2] < lo + 15], schema
            )
            snap = apply_cdc_changes(
                snap, b, key_cols=["k"], seq_cols=["seq"], op_col="op"
            )
        assert _snap_tuples(snap) == want, trial


def test_cdc_without_op_col_is_pure_upsert(spark):
    from mrt_data_integration_spark.operators.scd import apply_cdc_changes

    schema = "k long, attr string, seq long"
    snap = spark.createDataFrame([(1, "A", 1), (2, "X", 2)], schema)
    b = spark.createDataFrame([(2, "Y", 3), (3, "Q", 4)], schema)
    out = apply_cdc_changes(snap, b, key_cols=["k"], seq_cols=["seq"])
    assert _snap_tuples(out) == [(1, "A", 1), (2, "Y", 3), (3, "Q", 4)]


def test_cdc_requires_full_rows_and_prunes_with_broadcast(spark):
    import pytest as _pytest

    from mrt_data_integration_spark.operators.scd import apply_cdc_changes

    snap = spark.createDataFrame(
        [(1, "A", 1)], "k long, attr string, seq long"
    )
    partial = spark.createDataFrame([(1, 2)], "k long, seq long")
    with _pytest.raises(ValueError, match="missing snapshot columns"):
        apply_cdc_changes(snap, partial, key_cols=["k"], seq_cols=["seq"])
    # untouched-key prune is a broadcast anti join (snapshot never
    # shuffles on the merge path)
    b = spark.createDataFrame(
        [(2, "X", 5)], "k long, attr string, seq long"
    )
    out = apply_cdc_changes(snap, b, key_cols=["k"], seq_cols=["seq"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_cdc_null_op_is_an_upsert_not_a_delete(spark):
    """A NULL op must upsert (CDC feeds that leave op unset for plain
    inserts): a bare `!=` would evaluate NULL, drop the row from the
    upsert set, and silently DELETE the key — the self-review finding
    this pins."""
    from mrt_data_integration_spark.operators.scd import apply_cdc_changes

    schema = "k long, attr string, seq long, op string"
    snap = spark.createDataFrame([(5, "A", 1, "U")], schema).drop("op")
    b = spark.createDataFrame([(5, "X", 9, None), (6, "Y", 10, None)], schema)
    out = apply_cdc_changes(
        snap, b, key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    assert _snap_tuples(out) == [(5, "X", 9), (6, "Y", 10)]


def test_cdc_op_col_colliding_with_snapshot_column_fails_fast(spark):
    """If the snapshot already carries a column named op_col, the
    payload struct would get duplicate field names and die later with
    an opaque ambiguity error — the contract check raises up front."""
    import pytest as _pytest

    from mrt_data_integration_spark.operators.scd import apply_cdc_changes

    snap = spark.createDataFrame(
        [(1, "A", 1)], "k long, op string, seq long"
    )
    b = spark.createDataFrame(
        [(1, "B", 2, "U")], "k long, op string, seq long, __op__ string"
    )
    with _pytest.raises(ValueError, match="collides with a snapshot column"):
        apply_cdc_changes(
            snap, b, key_cols=["k"], seq_cols=["seq"], op_col="op"
        )


def _dlog(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, ts timestamp, rid long, op string"
    )


def test_scd2_delete_tombstone_handwalk(spark):
    """insert → update → delete → re-insert (SAME value as pre-delete):
    the tombstone closes v2 at the delete ts and leaves no current row
    until the re-insert opens v3 — a NEW version despite equal tracked
    values (the delete is a hard boundary, not a value change), with
    numbering continuing across the gap."""
    log = _dlog(
        spark,
        [
            (1, "a", _ts(1), 1, "U"),
            (1, "b", _ts(3), 2, "U"),
            (1, None, _ts(5), 3, "D"),
            (1, "b", _ts(8), 4, "U"),
        ],
    )
    hist = changelog_to_scd2(
        log, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
    )
    rows = sorted(hist.collect(), key=lambda r: r.version)
    assert [(r.version, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in rows] == [
        (1, "a", _ts(1), _ts(3), False),
        (2, "b", _ts(3), _ts(5), False),   # closed BY the tombstone
        (3, "b", _ts(8), None, True),      # re-insert: new version
    ]


def test_scd2_delete_edge_cases(spark):
    """Consecutive tombstones collapse (the second is redundant, and
    the gap still closes at the FIRST delete's ts); a tombstone for a
    never-seen key yields nothing; a key ending in a tombstone has no
    current row; NULL op is an upsert (the type-1 contract)."""
    log = _dlog(
        spark,
        [
            (1, "a", _ts(1), 1, "U"),
            (1, None, _ts(2), 2, "D"),
            (1, None, _ts(3), 3, "D"),
            (2, None, _ts(1), 4, "D"),
            (3, "x", _ts(1), 5, None),     # NULL op = upsert
        ],
    )
    hist = changelog_to_scd2(
        log, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
    )
    rows = {r.k: r for r in hist.collect()}
    assert set(rows) == {1, 3}
    assert rows[1].valid_to == _ts(2) and not rows[1].is_current
    assert rows[3].is_current and rows[3].attr == "x"


def test_scd2_before_image_delete_closes_open_version(spark):
    """A tombstone carrying the PRIOR row's tracked values (Debezium-
    style before-image CDC deletes) must still close the open version —
    value equality is not 'no change' when the op flips to delete (the
    r11 ADVICE defect: the equal-valued tombstone failed every boundary
    disjunct and was silently dropped, leaving the key current)."""
    log = _dlog(
        spark,
        [
            (1, "a", _ts(1), 1, "U"),
            (1, "a", _ts(4), 2, "D"),      # before-image: same attr
            (2, None, _ts(1), 3, "U"),     # NULL-valued upsert...
            (2, None, _ts(3), 4, "D"),     # ...then NULL-carrying delete
        ],
    )
    hist = changelog_to_scd2(
        log, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
    )
    rows = {r.k: r for r in hist.collect()}
    assert set(rows) == {1, 2}, "each key keeps exactly its closed row"
    assert rows[1].valid_to == _ts(4) and not rows[1].is_current
    assert rows[2].valid_to == _ts(3) and not rows[2].is_current


def test_scd2_merge_before_image_delete_closes_current_row(spark):
    """The merge half of the same defect: a batch tombstone whose
    tracked values equal the history's current row must close it (the
    baseline observation re-enters the collapse with identical values,
    so without the is_del boundary the tombstone vanished and the key
    stayed current). Also pins merge == rebuild on this exact shape."""
    b0 = _dlog(spark, [(1, "a", _ts(1), 1, "U"), (2, "x", _ts(1), 2, "U")])
    b1 = _dlog(spark, [(1, "a", _ts(5), 3, "D")])
    hist = changelog_to_scd2(
        b0, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
    )
    merged = scd2_merge(
        hist, b1, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
    )
    want = sorted(
        map(
            tuple,
            changelog_to_scd2(
                b0.unionByName(b1), ["k"], ["attr"], ["ts", "rid"], "ts",
                op_col="op",
            ).collect(),
        )
    )
    got = sorted(map(tuple, merged.collect()))
    assert got == want
    rows = {r.k: r for r in merged.collect()}
    assert rows[1].valid_to == _ts(5) and not rows[1].is_current
    assert rows[2].is_current


def test_scd2_merge_equals_rebuild_with_deletes_randomized(spark):
    """merge == rebuild on logs WITH tombstones: random per-key
    observation streams (upserts + deletes — NULL-payload tombstones,
    BEFORE-IMAGE tombstones carrying the prior row's values (the r11
    ADVICE blind spot), NULL-valued upserts so NULL→NULL-delete runs
    arise, delete-then-reinsert, and batch boundaries landing ON
    tombstones), split into 1-4 sequential batches, folded by
    scd2_merge — identical row set to the one-shot changelog_to_scd2
    of the full log."""
    import random

    rng = random.Random(20260817)
    for trial in range(4):
        rows, rid = [], 0
        for k in range(1, 7):
            alive, last = False, None
            for d in sorted(rng.sample(range(1, 28), rng.randint(1, 9))):
                rid += 1
                if alive and rng.random() < 0.3:
                    # half the tombstones are before-image (carry the
                    # prior observation's value — possibly NULL)
                    payload = last if rng.random() < 0.5 else None
                    rows.append((k, payload, _ts(d), rid, "D"))
                    alive = False
                else:
                    last = rng.choice(["a", "b", "c", None])
                    rows.append((k, last, _ts(d), rid, "U"))
                    alive = True
        rows.sort(key=lambda r: (r[2], r[3]))
        log = _dlog(spark, rows)

        def _key(t):
            # None-safe total order (NULL attrs sort first)
            return tuple((v is not None, v) for v in t)

        want = sorted(
            map(
                tuple,
                changelog_to_scd2(
                    log, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
                ).collect(),
            ),
            key=_key,
        )
        cuts = sorted(rng.sample(range(1, 28), rng.randint(0, 3)))
        bounds = [1] + cuts + [28]
        hist = None
        for lo, hi in zip(bounds, bounds[1:]):
            b = log.filter(
                (F.col("ts") >= _ts(lo)) & (F.col("ts") < _ts(hi))
            )
            if hist is None:
                hist = changelog_to_scd2(
                    b, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
                )
            else:
                hist = scd2_merge(
                    hist, b, ["k"], ["attr"], ["ts", "rid"], "ts",
                    op_col="op",
                )
        got = sorted(map(tuple, hist.collect()), key=_key)
        assert got == want, (trial, got, want)


def test_point_in_time_join_over_tombstoned_history(spark):
    """PIT probes against a delete-terminated history: facts inside a
    version's interval match it, facts in the post-delete gap match
    NOTHING (half-open intervals make the tombstone a real coverage
    hole — no 'current row forever' leak), and facts after the
    re-insert match the new version."""
    from mrt_data_integration_spark.operators.scd import (
        point_in_time_join,
    )

    log = _dlog(
        spark,
        [
            (1, "a", _ts(1), 1, "U"),
            (1, None, _ts(5), 2, "D"),
            (1, "b", _ts(10), 3, "U"),
        ],
    )
    hist = changelog_to_scd2(
        log, ["k"], ["attr"], ["ts", "rid"], "ts", op_col="op"
    )
    facts = spark.createDataFrame(
        [(100, 1, _ts(2)), (101, 1, _ts(7)), (102, 1, _ts(12))],
        "fact_id long, k long, ts timestamp",
    )
    got = {
        r.fact_id: r.attr
        for r in point_in_time_join(
            facts, hist, ["k"], "ts", how="left"
        ).collect()
    }
    assert got == {100: "a", 101: None, 102: "b"}
