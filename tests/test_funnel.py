"""Funnel operator: first-touch anchoring, window gating, ordering."""

from __future__ import annotations

import datetime as dt

from mrt_data_integration_spark.operators.funnel import (
    funnel_conversion,
    funnel_stage_times,
)

STEPS = ["view", "click", "purchase"]


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), t) for u, m, t in rows],
        ["user_id", "ts", "event_type"],
    )


def test_full_funnel_in_order(spark):
    ev = _events(spark, [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")])
    r = funnel_stage_times(ev, STEPS, "1 hour").collect()[0]
    assert r["t1"] < r["t2"] < r["t3"]


def test_out_of_order_steps_do_not_count(spark):
    # click BEFORE the first view must not complete stage 2
    ev = _events(spark, [(1, 0, "click"), (1, 10, "view"), (1, 20, "purchase")])
    r = funnel_stage_times(ev, STEPS, "1 hour").collect()[0]
    assert r["t1"] is not None and r["t2"] is None and r["t3"] is None


def test_window_gates_each_stage(spark):
    # click 90 min after first view: outside a 1-hour window, inside 2-hour
    ev = _events(spark, [(1, 0, "view"), (1, 90, "click")])
    assert funnel_stage_times(ev, STEPS, "1 hour").collect()[0]["t2"] is None
    assert funnel_stage_times(ev, STEPS, "2 hours").collect()[0]["t2"] is not None


def test_first_touch_anchoring_is_not_best_path(spark):
    # a later view (min 100) would catch the click at 120 within 1 hour,
    # but first-touch anchors at min 0 — the click is out of window.
    # This pins the DEFINITION (stable under data growth), not a bug.
    ev = _events(spark, [(1, 0, "view"), (1, 100, "view"), (1, 120, "click")])
    assert funnel_stage_times(ev, STEPS, "1 hour").collect()[0]["t2"] is None


def test_earliest_qualifying_event_wins(spark):
    ev = _events(
        spark, [(1, 0, "view"), (1, 5, "click"), (1, 30, "click")]
    )
    r = funnel_stage_times(ev, STEPS, "1 hour").collect()[0]
    assert r["t2"] == dt.datetime(2024, 1, 1, 0, 5)


def test_conversion_report_counts(spark):
    ev = _events(
        spark,
        [
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            (2, 0, "view"), (2, 10, "click"),
            (3, 0, "view"),
            (4, 0, "click"),  # never views — not in the funnel at all
        ],
    )
    rows = {r["stage"]: r for r in funnel_conversion(ev, STEPS, "1 hour").collect()}
    assert [rows[s]["n_users"] for s in (1, 2, 3)] == [3, 2, 1]
    assert rows[1]["conversion"] == 1.0
    assert rows[2]["conversion"] == round(2 / 3, 6)
    assert rows[3]["conversion"] == 0.5


def test_funnel_empty_and_no_stage1_inputs(spark):
    # a user who never performs step 1 contributes all-null stage times;
    # an empty frame yields zero counts with NULL conversions (no ANSI
    # divide-by-zero), matching DuckDB's x/0 → NULL
    ev = _events(spark, [(1, 0, "click")])
    r = funnel_stage_times(ev, STEPS, "1 hour").collect()[0]
    assert r["t1"] is None and r["t2"] is None and r["t3"] is None
    empty = ev.filter("user_id < 0")
    rows = funnel_conversion(empty, STEPS, "1 hour").collect()
    assert [r["n_users"] for r in rows] == [0, 0, 0]
    assert all(r["conversion"] is None for r in rows)


def test_decomposed_matches_fold_on_unit_shapes(spark):
    """bounded_history=False (k-min-join, no per-user arrays) must equal
    the sorted fold on every tricky unit shape above."""
    shapes = [
        [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")],
        [(1, 0, "click"), (1, 10, "view"), (1, 20, "purchase")],
        [(1, 0, "view"), (1, 90, "click")],
        [(1, 0, "view"), (1, 100, "view"), (1, 120, "click")],
        [(1, 0, "view"), (1, 5, "click"), (1, 30, "click")],
        [(1, 0, "click")],
        [
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            (2, 0, "view"), (2, 10, "click"),
            (3, 0, "view"),
            (4, 0, "click"),
        ],
    ]
    for rows in shapes:
        ev = _events(spark, rows)
        fold = sorted(map(tuple, funnel_stage_times(ev, STEPS, "1 hour").collect()))
        dec = sorted(map(tuple, funnel_stage_times(
            ev, STEPS, "1 hour", bounded_history=False
        ).collect()))
        assert fold == dec, rows


def test_decomposed_matches_fold_on_events_table(spark, sf_smoke):
    """Differential at data scale: the full events table, both variants,
    identical per-user stage times AND identical conversion report."""
    from mrt_data_integration_spark.sources import load_table

    ev = load_table(spark, sf_smoke, "events")
    steps = ["view", "click", "purchase"]
    fold = sorted(map(tuple, funnel_stage_times(ev, steps, "12 hours").collect()))
    dec = sorted(map(tuple, funnel_stage_times(
        ev, steps, "12 hours", bounded_history=False
    ).collect()))
    assert fold == dec and len(fold) > 0
    conv_fold = funnel_conversion(ev, steps, "12 hours").collect()
    conv_dec = funnel_conversion(
        ev, steps, "12 hours", bounded_history=False
    ).collect()
    assert list(map(tuple, conv_fold)) == list(map(tuple, conv_dec))


def test_funnel_randomized_python_twin(spark):
    """Seeded fuzz vs a greedy-walk twin: random event soups (repeated
    steps, out-of-order arrival, window-boundary gaps, users missing
    middle steps) — both physical variants (sorted fold AND decomposed
    min-joins) must produce the twin's stage times exactly."""
    import datetime as dt
    import random

    from mrt_data_integration_spark.operators.funnel import (
        funnel_stage_times,
    )

    rng = random.Random(20260815)
    steps = ["view", "click", "purchase"]
    base = dt.datetime(2024, 5, 1)
    window = dt.timedelta(hours=12)
    rows = []
    for user in range(25):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (
                    user,
                    base + dt.timedelta(
                        hours=rng.randint(0, 72), minutes=rng.randint(0, 59)
                    ),
                    rng.choice(steps),
                )
            )
    rng.shuffle(rows)  # arrival order is not time order
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    # greedy twin: t1 = min(view); t_i = min ts of step i in (t_{i-1},
    # t_{i-1} + window]
    want = {}
    by_user = {}
    for u, ts, tp in rows:
        by_user.setdefault(u, []).append((ts, tp))
    for u, evs in by_user.items():
        t = [None, None, None]
        cand = [ts for ts, tp in evs if tp == "view"]
        if cand:
            t[0] = min(cand)
            for i in (1, 2):
                if t[i - 1] is None:
                    break
                cand = [
                    ts
                    for ts, tp in evs
                    if tp == steps[i]
                    and t[i - 1] < ts <= t[i - 1] + window
                ]
                if cand:
                    t[i] = min(cand)
        want[u] = tuple(t)

    for bounded in (True, False):
        got = {
            r.user_id: (r.t1, r.t2, r.t3)
            for r in funnel_stage_times(
                df, steps, "12 hours", bounded_history=bounded
            ).collect()
        }
        for u, w in want.items():
            g = got.get(u, (None, None, None))
            if w == (None, None, None):
                # users with no view never emit a row in either variant
                assert g == (None, None, None), (bounded, u, g, w)
            else:
                assert g == w, (bounded, u, g, w)
