"""Slowly-changing-dimension (type 2) operators — changelog → history.

The reference materializes analysis frames as point-in-time snapshots
(simulation.R's per-run result frames); a 100 TB warehouse instead
tracks attribute CHANGES and needs the standard SCD2 reshape: an
ordered change log per key collapsed into effective-dated version rows
(valid_from/valid_to/is_current), plus the incremental MERGE that
folds a new change batch into an existing history without rebuilding
it.

Spark-first shape: both operators are pure window/join compositions —
one shuffle keyed by the dimension key for the run-collapse windows
(lag/lead/row_number share a single Window spec → a single Exchange +
Sort, pinned in tests/test_plans.py), and the merge touches only the
PARTITIONS holding changed keys (broadcast semi-join pruning when the
batch is small). No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def changelog_to_scd2(
    changes: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    seq_cols: list[str],
    ts_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Collapse an ordered change log into SCD2 version rows.

    ``changes`` has one row per OBSERVATION of a key's tracked
    attributes; consecutive observations (ordered by ``seq_cols``,
    which must be a total order within a key — include a tiebreaker
    like the source row id) with identical ``tracked_cols`` collapse
    into one version row:

        key_cols…, tracked_cols…,
        valid_from  = ts_col of the run's first observation,
        valid_to    = next run's valid_from (NULL for the current run),
        version     = 1-based run index per key,
        is_current  = valid_to IS NULL

    Change detection is null-safe (``eqNullSafe`` on the tracked
    struct): NULL → value and value → NULL transitions open new
    versions, NULL → NULL does not — a plain ``!=`` would silently
    treat every NULL row as "no change".

    ``op_col`` (late r11 — the type-2 half of the CDC delete contract
    `apply_cdc_changes` already has): a ``delete_op`` observation is a
    TOMBSTONE — it closes the key's open version at the delete's
    ``ts_col`` and emits NO version row, so a deleted key has no
    current row (the null-safe rule of the type-1 path: a NULL op is
    an upsert, never a delete). A later re-insert opens a NEW version
    even when its tracked values equal the pre-delete values — the
    delete is a hard boundary, not a value change — and version
    numbers keep counting across the gap. Consecutive tombstones
    collapse; a tombstone for a never-seen key yields nothing. The
    default (None) is byte-identical to the pre-delete behavior.

    One hash shuffle on ``key_cols``; the detect window and the
    run-collapse windows share the same (partitionBy, orderBy) spec so
    Catalyst plans a single Exchange + Sort for all of them.
    """
    kt = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*kt).orderBy(*[F.col(c) for c in seq_cols])
    cur = F.struct(*[F.col(c) for c in tracked_cols])
    if op_col is None:
        is_del = F.lit(False)
    else:
        is_del = F.col(op_col).eqNullSafe(delete_op)
    prev_del = F.coalesce(F.lag(is_del).over(w), F.lit(False))
    # boundaries: first observation, value change, anything following
    # a tombstone (re-inserts never collapse across the gap), and the
    # first tombstone of a tombstone run. `is_del` is a boundary in its
    # OWN right: a before-image tombstone (Debezium-style CDC deletes
    # carry the prior row's values, so tracked_cols equal the previous
    # observation's) must still close the open version — without the
    # disjunct it fails every other boundary test and is silently
    # dropped, leaving the deleted key CURRENT (the r11 ADVICE defect).
    is_new = (
        F.lag(cur).over(w).isNull()
        | ~F.lag(cur).over(w).eqNullSafe(cur)
        | prev_del
        | is_del
    ) & ~(is_del & prev_del)
    runs = (
        changes.withColumn("__del__", is_del)
        .withColumn("__new__", is_new)
        .filter("__new__")
    )
    # versions count NON-tombstone runs only, but tombstones stay in
    # the frame long enough to bound the previous run's valid_to
    w_runs = Window.partitionBy(*kt).orderBy(*[F.col(c) for c in seq_cols])
    w_cum = w_runs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        runs.withColumn("valid_to", F.lead(F.col(ts_col)).over(w_runs))
        .withColumn(
            "version",
            # cast: count() is LongType, but the merge path unions with
            # this history and carries row_number()-IntegerType versions
            F.count(F.when(~F.col("__del__"), F.lit(1)))
            .over(w_cum)
            .cast("int"),
        )
        .filter(~F.col("__del__"))
        .select(
            *key_cols,
            *tracked_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            "version",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    seq_cols: list[str],
    ts_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Fold a NEW change batch into an existing SCD2 ``history``.

    Contract: every batch observation is strictly later (by
    ``seq_cols``) than the history's current rows — the standard
    incremental-load shape. The merge is exactly equivalent to
    rebuilding from the full concatenated change log
    (``changelog_to_scd2``), pinned by the merge==rebuild identity
    test, but touches only the affected keys:

    - keys absent from the batch pass through UNCHANGED (no shuffle of
      the untouched history beyond the anti-join probe);
    - for affected keys, the CURRENT row (when one exists — a
      delete-terminated key has none and its batch collapses fresh)
      re-enters the collapse as the baseline observation, so an
      unchanged attribute batch extends no version and a changed one
      closes the current row at the first differing observation.

    ``op_col`` (late r11): batch tombstones (``delete_op``) close the
    open version at the delete's ``ts_col`` and leave the key with no
    current row — `changelog_to_scd2`'s delete semantics, so
    merge == rebuild still holds on logs WITH deletes (fuzz-pinned).
    Version numbers resume from the key's CLOSED row count — for a
    never-deleted key that equals the old current-version carry
    (versions 1..n with n current ⇒ n−1 closed), so the default path
    is byte-identical; for a delete-terminated key it correctly
    resumes past the tombstone gap.

    At 100 TB the history side is the big one: affected keys are a
    broadcast semi/anti-join prune (micro-batch sized), so the closed
    (immutable) version rows never move.
    """
    affected = batch.select(*key_cols).distinct()
    untouched = history.join(F.broadcast(affected), key_cols, "left_anti")
    closed = history.filter(~F.col("is_current")).join(
        F.broadcast(affected), key_cols, "left_semi"
    )
    # version numbering resumes from the per-key CLOSED row count (see
    # docstring); one tiny aggregate over the affected keys' history
    n_closed = closed.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("int").alias("__nc__")
    )
    # current rows re-enter the collapse as the baseline observation.
    # seq tiebreaker columns (seq_cols minus ts_col) ride along from
    # the batch; the baseline fills them with typed NULLs — NULLS FIRST
    # sorts the baseline before any batch row that ties on ts (the
    # contract says batch seq is strictly later anyway).
    tiebreak = [c for c in seq_cols if c != ts_col]
    batch_types = dict(batch.dtypes)
    base = (
        history.filter(F.col("is_current"))
        .join(F.broadcast(affected), key_cols, "left_semi")
        .select(
            *key_cols,
            *tracked_cols,
            F.col("valid_from").alias(ts_col),
            *[F.lit(None).cast(batch_types[c]).alias(c) for c in tiebreak],
            F.lit(False).alias("__del__"),
        )
    )
    if op_col is None:
        batch_del = F.lit(False)
    else:
        # null-safe: a NULL op is an upsert, never a delete (the
        # type-1 path's contract, apply_cdc_changes)
        batch_del = F.col(op_col).eqNullSafe(delete_op)
    batch_obs = batch.select(
        *key_cols,
        *tracked_cols,
        ts_col,
        *tiebreak,
        batch_del.alias("__del__"),
    )
    merged_log = base.unionByName(batch_obs, allowMissingColumns=False)
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak]
    )
    cur = F.struct(*[F.col(c) for c in tracked_cols])
    is_del = F.col("__del__")
    prev_del = F.coalesce(F.lag(is_del).over(w), F.lit(False))
    # the changelog collapse's boundary rules verbatim (value change,
    # post-tombstone re-insert, first tombstone of a tombstone run, and
    # any non-tombstone→tombstone transition — before-image deletes
    # carrying the prior row's values must still close the open version)
    is_new = (
        F.lag(cur).over(w).isNull()
        | ~F.lag(cur).over(w).eqNullSafe(cur)
        | prev_del
        | is_del
    ) & ~(is_del & prev_del)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rebuilt = (
        merged_log.withColumn("__new__", is_new)
        .filter("__new__")
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
        .withColumn(
            "__rn__",
            F.count(F.when(~is_del, F.lit(1))).over(w_cum).cast("int"),
        )
        .filter(~is_del)
        .join(F.broadcast(n_closed), key_cols, "left")
        .withColumn(
            "version",
            (F.col("__rn__") + F.coalesce(F.col("__nc__"), F.lit(0))).cast(
                "int"
            ),  # IntegerType so merge output unions cleanly with
            # changelog_to_scd2's history
        )
        .select(
            *key_cols,
            *tracked_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            "version",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
    return untouched.unionByName(closed).unionByName(rebuilt)


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
    broadcast_history: bool = False,
) -> DataFrame:
    """Join facts to the SCD2 version that was valid AT each fact's
    timestamp — the temporal/point-in-time join every SCD2 history
    exists to answer ("which plan was this user on when the event
    fired").

    Version-interval semantics match :func:`changelog_to_scd2`:
    half-open ``[valid_from, valid_to)``, NULL ``valid_to`` = current.
    A fact earlier than the key's first version matches nothing
    (``how="left"`` keeps it with NULL dimension columns).

    Scale shape: the EQUALITY key is in the join condition, so Catalyst
    plans a hash/sort-merge join keyed on it with the two interval
    bounds as residual join filters — never a banded explode or a
    nested-loop (that machinery, operators/rangejoin.py, exists for
    PURE range joins with no equi key; here versions-per-key is small
    and the equi key does the distribution). ``broadcast_history=True``
    hints the usual case of a dimension history that fits in memory;
    left at False, AQE still converts when sizes allow.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # Under right/full joins, unmatched HISTORY rows carry NULL
        # fact-side keys; dropping the history key columns below would
        # silently lose their key values. Reverse the join (facts on
        # the right) if that shape is ever needed.
        raise ValueError(
            f"point_in_time_join supports how='inner'/'left', got {how!r}"
        )
    h = history
    if broadcast_history:
        h = F.broadcast(h)
    cond = None
    for c in key_cols:
        eq = facts[c] == history[c]
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (facts[ts_col] >= history[valid_from])
        & (
            history[valid_to].isNull()
            | (facts[ts_col] < history[valid_to])
        )
    )
    joined = facts.join(h, cond, how)
    # drop the history's duplicate key columns — the fact side's values
    # are identical (equi condition) and a doubled name poisons every
    # downstream select
    for c in key_cols:
        joined = joined.drop(history[c])
    return joined


def apply_cdc_changes(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Fold a CDC change batch into a CURRENT-ROW snapshot — SCD
    type 1, the other half of the warehouse merge story (this module's
    SCD2 operators keep HISTORY; many integration targets only keep
    the latest row per key, with upserts and DELETES applied in
    order).

    ``changes`` carries one row per change event: the snapshot's
    columns plus optionally ``op_col`` (``delete_op`` ⇒ the key is
    removed; anything else upserts). Multiple events per key collapse
    to the LATEST by ``seq_cols`` (a total order within a key — null-
    safe ``max_by`` on the seq struct) before applying, so a batch is
    applied atomically at its final state. Keys absent from the batch
    pass through untouched.

    Batch contract (the same as :func:`scd2_merge`): batches apply in
    non-decreasing ``seq_cols`` order per key — an upsert in batch N
    REPLACES the key's row even if a misordered earlier batch carried
    a later seq. Under that contract the sequential fold equals the
    one-shot collapse of the concatenated change log (latest non-delete
    event per key), the identity the differential tests and the
    driver query's oracle pin.

    At 100 TB the snapshot side is the big one: the batch's distinct
    keys prune it with a broadcast anti-join (micro-batch sized), so
    untouched rows never shuffle; the batch-side latest-wins collapse
    is a hash aggregate on the key (partial map-side). ``snapshot``
    may be None (bootstrap from an empty state).
    """
    out_cols = (
        snapshot.columns
        if snapshot is not None
        else [c for c in changes.columns if c != op_col]
    )
    if op_col and op_col in out_cols:
        # the payload struct below would carry op_col TWICE (once as a
        # snapshot column, once as the op marker) — duplicate struct
        # field names make select('__r__.*') / drop(op_col) fail with
        # an opaque ambiguity error deep in the plan; fail fast instead
        raise ValueError(
            f"op_col {op_col!r} collides with a snapshot column — rename "
            "the CDC op marker (it is metadata, not part of the row)"
        )
    missing = [c for c in out_cols if c not in changes.columns]
    if missing:
        raise ValueError(
            f"changes is missing snapshot columns {missing}: a CDC event "
            "must carry the full row it upserts"
        )
    seq = F.struct(*[F.col(c) for c in seq_cols])
    payload = F.struct(
        *[F.col(c) for c in out_cols],
        *([F.col(op_col)] if op_col else []),
    )
    latest = (
        changes.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.max_by(payload, seq).alias("__r__"))
        .select("__r__.*")
    )
    if op_col:
        # null-safe: a NULL op is NOT a delete (CDC feeds that leave op
        # unset for plain inserts must upsert, not silently drop the
        # key — `!=` would evaluate NULL and filter the row out while
        # its key still anti-joins the snapshot)
        upserts = latest.filter(
            ~F.col(op_col).eqNullSafe(delete_op)
        ).drop(op_col)
    else:
        upserts = latest
    upserts = upserts.select(*out_cols)
    if snapshot is None:
        return upserts
    affected = latest.select(*key_cols)
    untouched = snapshot.join(F.broadcast(affected), key_cols, "left_anti")
    return untouched.unionByName(upserts)
