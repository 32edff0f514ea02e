"""Event-stream batch queries (SURVEY.md §2.9 E6-E7): tumbling windows,
sessionization, as-of join, JSON extraction — all with DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.asof import asof_join
from mrt_data_integration_spark.operators.sessionize import sessionize
from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.sources import load_table


def _stable_key(sf_dir: str) -> str:
    """Process-stable digest for reusable staging-dir names. Python's
    hash() is salted per process (PYTHONHASHSEED), so a hash()-derived
    name never actually reuses the directory — every run writes a fresh
    copy and the old ones accumulate in /tmp forever."""
    import hashlib
    import os

    return hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]


def _drain_stream(
    updates,
    sink,
    mode: str = "update",
    state_partitions: int | None = None,
    no_data_batches: bool = True,
) -> None:
    """Drain an availableNow stream through a foreachBatch ``sink`` —
    every batch is processed EXECUTOR-side (aggregated or appended to
    parquet by the cluster), so nothing streams through driver memory.
    The previous ``format("memory")`` sinks materialized the whole
    output on the driver — O(stream) rows for the dedup survivors,
    O(users) for the funnel — exactly the shape that cannot exist at
    corpus scale. The checkpoint is private per drain and removed HERE,
    success or failure (finally) — a failing micro-batch must not
    strand graft_drain_ck_* debris in /tmp on every retry.

    ``state_partitions`` right-sizes the STATEFUL shuffle for this
    stream: a streaming query pins its state-store partition count to
    ``spark.sql.shuffle.partitions`` at first start, and each micro-
    batch then pays per-partition fixed costs (state-store commit,
    Arrow python-runner setup) regardless of rows. The session default
    (32, sized for batch analytics over the whole table) is 4× too
    many for a micro-batch of ~30k rows — measured on the funnel
    drain: 32 partitions ≈ 1.6-2.4 s/batch, 8 ≈ 1.0-1.2 s/batch, and
    2 is WORSE (2.4-3.1 s: the per-group python iteration serializes).
    This is the streaming analogue of sizing shuffle partitions to
    input volume — on a real cluster ingesting the firehose you would
    set it to O(cores), here O(batch rows / 4k). The conf is set
    around query START (that's when the count is read) and restored in
    the same ``finally`` as the checkpoint cleanup; drains in this
    engine are sequential per session, so the temporary session-wide
    setting cannot leak into a concurrent query's plan.

    ``no_data_batches=False`` (opt r15, guide §1/§5) disables the
    trailing NO-DATA micro-batch Spark schedules after the last data
    batch of a stateful availableNow drain (to advance the watermark
    and evict state). A caller may pass False ONLY with an emission
    argument: every output row must be emitted by the DATA batches
    themselves, so the no-data batch can only evict state the drain's
    termination discards anyway (true for arrival-emitting operators:
    stream-stream INNER joins, dropDuplicates*, update-mode stateful
    maps WITHOUT event-time timeouts — and provably false for
    append-mode windowed aggregations and timeout-emitting maps, whose
    FINAL results arrive exactly on that watermark advance; leave the
    default for those). Data micro-batch counts are untouched — the
    cross-batch state maintenance the drains demonstrate runs
    identically; measured on the bench box the skipped batch was
    ~1-2.5 s of pure state-store commit for the interval-join drain."""
    import shutil
    import tempfile

    spark = updates.sparkSession
    orig = (
        spark.conf.get("spark.sql.shuffle.partitions")
        if state_partitions
        else None
    )
    _NDB = "spark.sql.streaming.noDataMicroBatches.enabled"
    orig_ndb = spark.conf.get(_NDB) if not no_data_batches else None
    ck = tempfile.mkdtemp(prefix="graft_drain_ck_")
    try:
        if state_partitions:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(state_partitions)
            )
        if not no_data_batches:
            spark.conf.set(_NDB, "false")
        q = (
            updates.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if orig is not None:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
        if orig_ndb is not None:
            spark.conf.set(_NDB, orig_ndb)
        shutil.rmtree(ck, ignore_errors=True)


_MAX_DRAIN_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_MAX_STATE_PARTITIONS", "8")
)


def _sized_state_partitions(
    spark, src: str, n_batches: int, cap: int | None = None
) -> int:
    """Size a drain's stateful-shuffle partition count to its per-batch
    row volume: ceil(rows_per_batch / 4000), floored at 8 and capped at
    the session default AND at ``cap`` (default
    ``_MAX_DRAIN_STATE_PARTITIONS``). The count is pinned per stream at
    first start, so it must be chosen up front — an availableNow drain
    over a staged directory CAN be, because the corpus is known:
    parquet row counts come from file footers (metadata-only job, no
    data scan). Measured basis at sf0.1 (30k rows/batch): 8 partitions
    ≈ 1.0-1.2 s/batch vs 1.6-2.4 s at the session's 32 — per-partition
    fixed costs (state-store commit, Arrow runner setup) dominate
    small batches. At 10× volume a FIXED 8 saturates (super-linear
    slope measured in scripts/scaling_curve.py), which is why the
    volume term scales back up toward the session default.

    The ``_MAX_DRAIN_STATE_PARTITIONS`` ceiling (opt r15, guide §1/§5;
    env-overridable for clusters): per-STORE commit cost on the bench
    box grows super-linearly with the number of concurrent state
    stores — the dedup drain measured 2.2 s wall at 2 stores / ~90 ms
    summed commit, 3.0-3.5 s at 8 / ~1 s, and 6.7-13 s at the volume
    formula's un-capped 25 / 12-19 s summed commit, with the
    stream-stream join (FOUR stores per partition) blowing up at 8
    partitions (17-41 s summed commit) vs 3.5 s wall at 4
    (scripts/stream_state_ab.py). On a cluster ingesting firehose
    batches the per-store fixed cost amortizes and the right ceiling
    is O(cores) — raise SPARK_GRAFT_MAX_STATE_PARTITIONS there; the
    volume term then governs up to cluster width. Callers whose
    operator multiplies stores per partition (the interval join's 4)
    pass a proportionally lower ``cap``. The count is cached per
    staged dir (they are immutable once published — _staged_stream_dir)
    so repeat invocations skip even the footer job."""
    import math

    if src not in _STAGED_ROW_COUNTS:
        _STAGED_ROW_COUNTS[src] = spark.read.parquet(src).count()
    total = _STAGED_ROW_COUNTS[src]
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if cap is None:
        cap = _MAX_DRAIN_STATE_PARTITIONS
    # caps OUTERMOST: on a session whose default is below the floor
    # (e.g. a 4-core box), the default wins — the floor exists to keep
    # per-group python iteration parallel, never to exceed the
    # session's own parallelism ceiling (and never the store-count
    # ceiling above)
    return min(cap, default, max(8, math.ceil(total / n_batches / 4000)))


_STAGED_ROW_COUNTS: dict[str, int] = {}


def _batch_count_sink(agg_out: str, group_col: str):
    """foreachBatch sink that reduces each micro-batch to per-group
    partial counts EXECUTOR-side and appends them to ``agg_out`` tagged
    with the batch id. foreachBatch is at-least-once: a replayed batch
    appends a SECOND identical set of rows, which a plain sum would
    double-count — ``_sum_batch_counts`` is the matching read side that
    collapses replays on (bid, group) first. Kept as named module
    functions (not inline lambdas) so the replay contract is testable:
    tests/test_streaming.py calls the sink twice with the same bid and
    asserts the summed counts are unchanged."""

    def sink(df, bid):
        (
            df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("bid", F.lit(bid))
            .write.mode("append")
            .parquet(agg_out)
        )

    return sink


def _sum_batch_counts(spark, agg_out: str, group_col: str):
    """Read side of ``_batch_count_sink``: replay-safe total per group.
    Dedupe on (bid, group) — max(n) over identical replayed rows — then
    sum across batches."""
    return (
        spark.read.parquet(agg_out)
        .groupBy("bid", group_col)
        .agg(F.max("n").alias("n"))
        .groupBy(group_col)
        .agg(F.sum("n").alias("n_unique"))
    )


def _staged_stream_dir(sf_dir: str, tag: str, build, src_table: str = "events") -> str:
    """Shared streamable-staging protocol for every stream-twin query:
    the content stamp (SOURCE table mtime — pass ``src_table`` when the
    stage derives from something other than events, or a source-table
    rewrite would serve a stale stage) lives in the DIRECTORY NAME
    and publication is sources.sinks.publish_build's
    build-private-then-rename. Consequences: (a) a named build is
    immutable once its _SUCCESS exists, so a rebuild can never touch a
    directory a concurrent stream is draining (the bench + parity-test
    race ADVICE r6 flagged); (b) repeat invocations skip the write
    entirely — the staging cost is paid once per (sf_dir, mtime), not
    per bench rep. ``build(tmp_path)`` writes the dataset (Spark's
    parquet commit creates the _SUCCESS marker)."""
    import os
    import tempfile

    from mrt_data_integration_spark.sources.sinks import build_and_publish

    ev_src = os.path.join(sf_dir, f"{src_table}.parquet")
    mtime = int(os.path.getmtime(ev_src)) if os.path.exists(ev_src) else 0
    src = os.path.join(
        tempfile.gettempdir(), f"graft_{tag}_{_stable_key(sf_dir)}_{mtime}"
    )
    return build_and_publish(src, "_SUCCESS", build)


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_key,
           event_type,
           count(*)                 AS n_events,
           round(sum(value), 4)     AS sum_value,
           count(DISTINCT user_id)  AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: tumbling 1-hour window aggregation. Batch form of
    ``groupBy(window(ts, '1 hour'))`` — emitted as a string key so the
    oracle compare is timezone-representation-proof. Streaming twin:
    ``streaming.windows.hourly_counts``."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour_key"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "sessionization",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts, event_id, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM lagged
    ),
    sess AS (
      SELECT user_id, value,
             -- CAST: DuckDB's integer window-sum returns HUGEINT, which
             -- pandas materializes as float64 and the driver hash sees as
             -- `1.0` vs Spark's int64 `1` (round-3 red row). BIGINT keeps
             -- the representation identical.
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*)             AS n_events,
           round(sum(value), 4) AS session_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def sessionization_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: gap-based sessionization (30-min inactivity) + per-session
    rollup, via ``operators.sessionize`` (one per-user shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, gap_seconds=1800)
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@query(
    "asof_latest_order",
    oracle="""
    WITH latest AS (
      SELECT o_custkey, o_orderdate, max_by(o_orderkey, o_orderkey) AS o_orderkey,
             max_by(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders
      GROUP BY o_custkey, o_orderdate
    ),
    ev AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 20 = 0)
    SELECT e.event_id, e.user_id,
           l.o_orderkey AS last_orderkey,
           round(l.o_totalprice, 2) AS last_totalprice
    FROM ev e
    ASOF LEFT JOIN latest l
      ON e.user_id = l.o_custkey AND e.ts >= l.o_orderdate
    """,
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: as-of join — each sampled event picks up the most recent order
    of the same key. Right side deduped per (key, time) by greatest
    orderkey first (ASOF tie-breaks are otherwise undefined).

    Spark side uses ``operators.asof.asof_join`` (union + window: one
    shuffle, no pair explosion)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 20 == 0)
        .select("event_id", "user_id", "ts")
    )
    orders = load_table(spark, sf_dir, "orders")
    latest = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max_by("o_orderkey", "o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    joined = asof_join(
        ev,
        latest,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round("o_totalprice", 2).alias("last_totalprice"),
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))          AS max_k,
           count(*)                                                         AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: JSON field extraction from the props column + rollup.
    ``get_json_object`` stays JVM-side (Jackson) — no Python in the path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
        F.max(k.cast("int")).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "user_activity_lag_features",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 4)          AS value_delta,
           date_diff('second', lag(ts) OVER w, ts)      AS secs_since_prev,
           row_number() OVER w                          AS event_seq
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def user_activity_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: per-user lag features (delta, inter-arrival seconds, ordinal)
    — the feature-engineering shape of a training-data pipeline. One
    shuffle, three windows sharing the same frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "secs_since_prev"
        ),
        F.row_number().over(w).alias("event_seq"),
    )


@query(
    "stateful_capped_sessions",
    # The cap rule is sequential per user (each session's cut depends
    # on the running session START, which the cut itself resets), so
    # plain SQL windows cannot express it — but a RECURSIVE CTE can:
    # one step per event ordinal carries (ordinal, session_start)
    # exactly like the operator's per-key state, and the per-user
    # event counts bound the recursion depth (<= 99 at every test SF).
    # This upgraded the query from rows-only to a full hash oracle
    # (r10): the leakage_safe_split precedent for recursive closures.
    # Thresholds are the stream's defaults: gap 1800 s, cap 4 h, in
    # epoch MICROseconds with strict '>' — the operator's exact
    # comparisons (streaming/stateful.py _capped_session_fn).
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, epoch_us(ts) AS tus, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ),
    walk AS (
      SELECT user_id, rn, tus, value,
             CAST(1 AS BIGINT) AS ordinal, tus AS start_us
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, e.tus, e.value,
             CASE WHEN (e.tus - w.tus) > CAST(1800 AS BIGINT) * 1000000
                    OR (e.tus - w.start_us) > CAST(14400 AS BIGINT) * 1000000
                  THEN w.ordinal + 1 ELSE w.ordinal END,
             CASE WHEN (e.tus - w.tus) > CAST(1800 AS BIGINT) * 1000000
                    OR (e.tus - w.start_us) > CAST(14400 AS BIGINT) * 1000000
                  THEN e.tus ELSE w.start_us END
      FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    sess AS (
      SELECT user_id, ordinal, count(*) AS n_events,
             round(sum(value), 4) AS session_value
      FROM walk GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           round(sum(session_value), 2) AS total_value
    FROM sess
    """,
)
def stateful_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: drives the applyInPandasWithState gap+cap sessionizer
    (streaming/stateful.py) end-to-end — events re-materialized as a
    streamable directory, drained with availableNow, final per-session
    aggregates summarized. The oracle replays the sequential cap rule
    as a RECURSIVE CTE (one step per event ordinal, carrying the same
    (ordinal, session_start) state the operator keeps per key), so the
    hash match proves the stateful streaming pass == the sequential
    definition — on top of the local-reference pin in
    tests/test_streaming.py.
    """
    import shutil
    import tempfile

    from mrt_data_integration_spark.streaming.stateful import (
        capped_sessionize_stream,
    )
    from mrt_data_integration_spark.streaming.windows import read_event_stream

    events = load_table(spark, sf_dir, "events")
    d = _staged_stream_dir(
        sf_dir,
        "events4",
        lambda p: events.repartition(4).write.parquet(p),
    )
    out = tempfile.mkdtemp(prefix="graft_capped_out_")
    try:
        _drain_stream(
            capped_sessionize_stream(read_event_stream(spark, d)),
            lambda df, bid: df.write.mode("append").parquet(out),
            # no maxFilesPerTrigger on this source → one batch
            state_partitions=_sized_state_partitions(spark, d, 1),
        )
        final = (
            spark.read.parquet(out)
            .groupBy("user_id", "session_ordinal")
            .agg(
                F.max("n_events").alias("n_events"),
                # the FINAL snapshot is the one with the most events —
                # max(session_value) would be wrong if event values can
                # be negative (an intermediate snapshot could exceed
                # the final)
                F.max_by("session_value", "n_events").alias("session_value"),
            )
        )
        row = final.agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("n_events").alias("total_events"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("session_value"), 2).alias("total_value"),
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [tuple(row)],
        "n_sessions bigint, n_users bigint, total_events bigint, "
        "max_session_events bigint, total_value double",
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > t1.t AND e.ts <= t1.t + INTERVAL '12 hours'
      GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > t2.t AND e.ts <= t2.t + INTERVAL '12 hours'
      GROUP BY 1
    ),
    c AS (SELECT (SELECT count(*) FROM t1) AS n1,
                 (SELECT count(*) FROM t2) AS n2,
                 (SELECT count(*) FROM t3) AS n3)
    SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
           CAST(n1 AS BIGINT) AS n_users, round(n1 / n1, 6) AS conversion
    FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', CAST(n2 AS BIGINT),
           round(n2 / n1, 6) FROM c
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', CAST(n3 AS BIGINT),
           round(n3 / n2, 6) FROM c
    ORDER BY stage
    """,
)
def funnel_conversion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: first-touch funnel view → click → purchase with a 12-hour
    per-stage conversion window (operators.funnel.funnel_conversion:
    one user-keyed shuffle, per-user sorted-array fold — each stage set
    once by the first qualifying event, which on sorted input IS the
    min the first-touch definition asks for). The oracle is the
    3-level min-join formulation — agreement proves the greedy fold
    computes the same anchored mins."""
    from mrt_data_integration_spark.operators.funnel import funnel_conversion

    ev = load_table(spark, sf_dir, "events")
    return funnel_conversion(
        ev, steps=["view", "click", "purchase"], window="12 hours"
    )


@query(
    "campaign_event_attribution",
    oracle="""
    WITH campaigns AS (
      SELECT i AS campaign_id,
             TIMESTAMP '2024-01-01' + i * 3 * INTERVAL '1 day' AS c_start,
             TIMESTAMP '2024-01-01' + (i * 3 + 4) * INTERVAL '1 day' AS c_end
      FROM generate_series(0, 9) AS t(i)
    )
    SELECT CAST(campaign_id AS BIGINT) AS campaign_id,
           strftime(c_start, '%Y-%m-%d') AS start_day,
           count(*)                      AS n_events,
           count(DISTINCT user_id)       AS n_users,
           round(sum(value), 4)          AS sum_value
    FROM events e
    JOIN campaigns c
      ON e.ts >= c.c_start AND e.ts < c.c_end
    GROUP BY campaign_id, c_start
    """,
)
def campaign_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: range (interval) join — attribute events to overlapping
    4-day campaign windows at 3-day stride (so boundary days belong to
    two campaigns: a genuine one-to-many time join, not disguised
    bucketing). operators.rangejoin.range_join turns the non-equi
    ``start <= ts < end`` predicate into a day-bucketed equi-join —
    hash join keyed by bucket instead of the BroadcastNestedLoopJoin
    Spark would otherwise plan (tests/test_rangejoin.py pins the plan).
    The oracle keeps the plain non-equi join: agreement proves the
    bucket rewrite is exact, including half-open boundaries."""
    from mrt_data_integration_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    campaigns = spark.range(10).select(
        F.col("id").alias("campaign_id"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(days=(F.col("id") * 3).cast("int"))
        ).alias("c_start"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(days=(F.col("id") * 3 + 4).cast("int"))
        ).alias("c_end"),
    )
    joined = range_join(
        ev, campaigns, ts_col="ts", start_col="c_start", end_col="c_end"
    )
    return joined.groupBy("campaign_id", "c_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        "campaign_id",
        F.date_format("c_start", "yyyy-MM-dd").alias("start_day"),
        "n_events",
        "n_users",
        "sum_value",
    )


@query("streaming_rollup_merge")  # rows-only: HLL estimates are
# engine-specific; streaming-final == direct-batch (estimate included)
# is pinned in tests/test_streaming.py.
def streaming_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6×E11: incremental aggregate maintenance ON A STREAM — events
    re-materialized as a 4-file streamable directory, drained file-by-
    file with availableNow; each micro-batch reduces to a mergeable
    rollup state (streaming/rollup.py → operators.sketches) and merges
    into a versioned parquet state table. Returns the finalized last
    state: per event_type counts, sums, and the HLL distinct-user
    estimate — identical to what one batch pass over all rows computes,
    though no micro-batch ever saw more than a quarter of them."""
    import shutil
    import tempfile

    from mrt_data_integration_spark.streaming.rollup import run_rollup_stream

    events = load_table(spark, sf_dir, "events")
    # Same staged content as stateful_capped_sessions ("events4") — the
    # two queries share one immutable build per (sf_dir, mtime).
    src = _staged_stream_dir(
        sf_dir,
        "events4",
        lambda p: events.repartition(4).write.parquet(p),
    )
    state = tempfile.mkdtemp(prefix="graft_rollup_state_")
    shutil.rmtree(state, ignore_errors=True)
    final = run_rollup_stream(
        spark,
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        state,
        ["event_type"],
        "value",
        "user_id",
    )
    return final.select(
        "event_type",
        "n_rows",
        F.round("sum_value", 4).alias("sum_value"),
        F.col("distinct_est").cast("long").alias("distinct_users_est"),
    ).orderBy("event_type")


@query(
    "streaming_dedup_ingest",
    oracle="""
    -- ts truncated to MICROSECONDS to mirror the engine exactly: the
    -- stream fingerprints the ns->us floor-truncated timestamp
    -- (sources/tables.py), so the oracle's distinct-payload key must
    -- use the same granularity. (Today's data carries nothing below
    -- us — epoch_ns % 1000 == 0 for every row — so this is belt and
    -- braces, not a behavior change.)
    WITH uniq AS (
      SELECT DISTINCT date_trunc('microseconds', ts) AS ts,
                      user_id, event_type, value, props
      FROM events
    )
    SELECT event_type,
           count(*)                                   AS n_unique,
           CAST(2 * count(*) AS BIGINT)               AS n_ingested
    FROM uniq
    GROUP BY event_type
    """,
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3×E6: ingest-time exact dedup on a stream
    (streaming/dedup.py). The events table is doubled with re-delivered
    copies (same payload, new event_id — every copy a true duplicate),
    re-materialized as a streamable directory, and drained through
    ``streaming_dedup_within_watermark`` (content-fingerprint key,
    first-arrival-wins, per-key state evicted once the watermark
    passes). The oracle knows the survivors exactly: one per DISTINCT
    payload tuple — distinct, not count(*), because a natural payload
    collision between two base events is a true duplicate the stream
    correctly drops (ADVICE r6: count(*) would count both and go red on
    exactly the driver scale where collisions first appear). The hash
    check proves the stream dropped every duplicate and nothing else;
    n_ingested documents the 2× survivor inflow.

    Scale shape: the fingerprint is map-side; the stateful dedup
    shuffles (fingerprint) only, and state is bounded by the watermark
    horizon — the property that lets this run forever on an unbounded
    crawl, where batch dedup would rescan history per batch."""
    import shutil
    import tempfile

    from mrt_data_integration_spark.streaming.dedup import (
        streaming_dedup_within_watermark,
    )

    # Watermarks require TIMESTAMP (driver testdata surfaces NTZ; the
    # session is pinned UTC so the cast is value-identity).
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dupes = events.withColumn("event_id", F.col("event_id") + 10_000_000)
    # The doubled staging corpus is a pure function of the source table;
    # built once per (sf_dir, mtime) under the shared immutable-staging
    # protocol (_staged_stream_dir — ADVICE r6 race fix).
    src = _staged_stream_dir(
        sf_dir,
        "sdedup_dup10M_ts_4f",
        lambda p: events.unionByName(dupes).repartition(4).write.parquet(p),
    )
    payload = ["ts", "user_id", "event_type", "value", "props"]
    deduped = streaming_dedup_within_watermark(
        # 2 files per micro-batch → two real batches (state must carry
        # across them for cross-batch duplicates); one file per batch
        # just multiplies scheduler rounds without testing more.
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src),
        payload,
        delay="365 days",
    )
    # Each micro-batch's survivors are REDUCED executor-side to per-type
    # partial counts (≤ |event_type| rows/batch) before anything reaches
    # the sink — the survivors themselves are never shipped to the
    # driver (a memory sink would hold the whole deduped stream there).
    # The batch id travels WITH the rows and the read side dedupes on
    # (bid, event_type): foreachBatch is at-least-once, and a summed
    # count is the one downstream that does NOT survive a replayed
    # batch (the funnel/sessions appends do — their max_by reductions
    # absorb identical rows). Latent today (private checkpoint, no
    # restart possible) but the sink must be safe for any caller that
    # reuses it with a persistent checkpoint.
    agg_out = tempfile.mkdtemp(prefix="graft_sdedup_agg_")
    try:
        _drain_stream(
            deduped,
            _batch_count_sink(agg_out, "event_type"),
            mode="append",
            # 4 staged files, 2 per trigger → 2 micro-batches
            state_partitions=_sized_state_partitions(spark, src, 2),
        )
        rows = _sum_batch_counts(spark, agg_out, "event_type").collect()
    finally:
        shutil.rmtree(agg_out, ignore_errors=True)
    return spark.createDataFrame(
        [(r.event_type, int(r.n_unique), 2 * int(r.n_unique)) for r in rows],
        "event_type string, n_unique bigint, n_ingested bigint",
    )


@query(
    "streaming_funnel_conversion",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > t1.t AND e.ts <= t1.t + INTERVAL '12 hours'
      GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > t2.t AND e.ts <= t2.t + INTERVAL '12 hours'
      GROUP BY 1
    ),
    c AS (SELECT (SELECT count(*) FROM t1) AS n1,
                 (SELECT count(*) FROM t2) AS n2,
                 (SELECT count(*) FROM t3) AS n3)
    SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
           CAST(n1 AS BIGINT) AS n_users, round(n1 / n1, 6) AS conversion
    FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', CAST(n2 AS BIGINT),
           round(n2 / n1, 6) FROM c
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', CAST(n3 AS BIGINT),
           round(n3 / n2, 6) FROM c
    ORDER BY stage
    """,
)
def streaming_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 (round 6): the funnel computed ON A STREAM — events drained
    file-by-file through the stateful `streaming/funnel.py` operator
    (per-user state re-folds the greedy anchor walk each micro-batch,
    so late-arriving earlier events revise stages correctly), reduced
    to the same (stage, step, n_users, conversion) report. The oracle
    is the identical 3-level min-join twin the batch query uses — a
    hash match proves stream == batch == SQL end-to-end."""
    import shutil
    import tempfile

    from mrt_data_integration_spark.streaming.funnel import (
        funnel_stream,
        merge_funnel_updates,
        read_funnel_state,
    )

    steps = ["view", "click", "purchase"]
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # Staged under the shared immutable protocol, PRE-FILTERED to the
    # funnel's step types and the three columns the operator consumes —
    # at 100 TB the ingest stream is exactly this projection (ship the
    # funnel events, not the firehose), and locally it cuts the
    # per-batch scan/shuffle/state volume ~2×.
    step_events = events.filter(F.col("event_type").isin(steps)).select(
        "user_id", "ts", "event_type"
    )
    src = _staged_stream_dir(
        sf_dir,
        "sfunnel_steps3_4f",
        lambda p: step_events.repartition(4).write.parquet(p),
    )
    updates = funnel_stream(
        spark.readStream.schema(step_events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src),
        steps,
    )
    # Update-mode emissions flow through the COMPACTED serving-state
    # path (r7 verdict item 8): merge_funnel_updates folds each
    # micro-batch into the versioned per-user state table (greatest
    # (last_ts, n_seen) row wins — the same reduction
    # latest_stage_times applies to an append log, pre-applied at write
    # time), so disk stays O(retained users) instead of O(updates) and
    # the serving read is the production read_funnel_state path. The
    # driver still sees only the final 1-row count frame.
    out = tempfile.mkdtemp(prefix="graft_sfunnel_state_")
    try:
        _drain_stream(
            updates,
            lambda df, bid: merge_funnel_updates(df, bid, out),
            # 4 staged files, 2 per trigger → 2 micro-batches
            state_partitions=_sized_state_partitions(spark, src, 2),
        )
        times = read_funnel_state(spark, out)
        counts = times.agg(
            *[F.count(F.col(f"t{i + 1}")).alias(f"n{i + 1}") for i in range(3)]
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    n = [int(counts[f"n{i + 1}"]) for i in range(3)]
    base = spark.createDataFrame(
        [
            (i + 1, step, n[i], n[i - 1] if i else n[0])
            for i, step in enumerate(steps)
        ],
        "stage bigint, step string, n_users bigint, denom bigint",
    )
    # conversion rounded by Spark (HALF_UP), matching the oracle's
    # round() — python round() is banker's and could differ at ties
    return base.select(
        "stage",
        "step",
        "n_users",
        F.round(F.try_divide("n_users", "denom"), 6).alias("conversion"),
    ).orderBy("stage")


@query(
    "streaming_click_attribution",
    oracle="""
    SELECT strftime(date_trunc('day', v.ts), '%Y-%m-%d') AS view_day,
           count(*)                                      AS n_attributed,
           round(sum(c.value), 4)                        AS click_value
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '12 hours'
    GROUP BY 1
    """,
)
def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6+ (late r7): attribution as a STREAM-STREAM interval join
    (streaming/join.py) — impressions and clicks arrive as two
    watermarked streams; each click joins every view by the same user
    in the preceding 12 hours, reduced to a per-day attribution report.
    The oracle is the plain batch interval join in SQL, so the hash
    match proves the streaming join emitted EXACTLY the batch pair set
    (the 365-day delay means no row is watermark-dropped — eviction
    semantics are pinned separately in tests/test_streaming_join.py).

    Scale shape: the batch form rescans the full impression history per
    click batch; the streaming form holds each side in state only while
    the 12-hour join horizon (plus delay) can still match it — Spark
    derives both sides' eviction from the time bounds INSIDE the join
    condition. Per batch, the join output is reduced executor-side to
    per-day (count, value-sum) partials tagged with the batch id
    (foreachBatch is at-least-once; the read side collapses replays on
    (bid, day) before summing) — the joined pairs themselves never
    reach the driver."""
    import shutil
    import tempfile

    from mrt_data_integration_spark.streaming.join import (
        stream_interval_join,
    )

    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value"
    )
    src_v = _staged_stream_dir(
        sf_dir, "sattr_views_4f",
        lambda p: views.repartition(4).write.parquet(p),
    )
    src_c = _staged_stream_dir(
        sf_dir, "sattr_clicks_4f",
        lambda p: clicks.repartition(4).write.parquet(p),
    )
    joined = stream_interval_join(
        # 2 files per trigger per side → two real micro-batches, so
        # pairs split across batches must be served from join state
        spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_v),
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_c),
        on="user_id",
        left_ts="v_ts",
        right_ts="c_ts",
        upper="12 hours",
        left_delay="365 days",
        right_delay="365 days",
    )
    agg_out = tempfile.mkdtemp(prefix="graft_sattr_agg_")

    def sink(df, bid):
        (
            df.groupBy(
                F.date_format(F.date_trunc("day", "v_ts"), "yyyy-MM-dd").alias(
                    "view_day"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("sv"),
            )
            .withColumn("bid", F.lit(bid))
            .write.mode("append")
            .parquet(agg_out)
        )

    try:
        _drain_stream(
            joined,
            sink,
            mode="append",
            # cap=4 (opt r15): the stream-stream join runs FOUR state
            # stores per partition (left/right × keyToNumValues /
            # keyWithIndexToValue), so its effective store count is
            # 4× the partition count — measured 3.5 s wall at 4
            # partitions (16 stores) vs 8.5-22 s at 8 (32 stores,
            # 17-41 s summed commit; scripts/stream_state_ab.py).
            state_partitions=_sized_state_partitions(spark, src_c, 2, cap=4),
            # inner stream-stream joins emit every pair on ARRIVAL —
            # the trailing no-data batch only evicts state the
            # availableNow termination discards; measured 1-2.5 s of
            # pure state-store commit. Output identical (the oracle
            # hash and tests/test_streaming_join.py pins re-prove it).
            no_data_batches=False,
        )
        totals = (
            spark.read.parquet(agg_out)
            # replay-safe: a replayed batch appends an identical
            # (bid, view_day) row set; max() collapses it before the sum
            .groupBy("bid", "view_day")
            .agg(F.max("n").alias("n"), F.max("sv").alias("sv"))
            .groupBy("view_day")
            .agg(
                F.sum("n").alias("n_attributed"),
                F.round(F.sum("sv"), 4).alias("click_value"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(agg_out, ignore_errors=True)
    return spark.createDataFrame(
        [(r.view_day, int(r.n_attributed), float(r.click_value)) for r in totals],
        "view_day string, n_attributed bigint, click_value double",
    )


@query(
    "gap_filled_user_series",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value FROM events
      WHERE event_type = 'purchase' AND user_id % 40 = 0
    ),
    -- floor(x*10^d + 0.5)/10^d in BOTH engines: engine round()s
    -- disagree on representational ties (operators/resample.py
    -- _round_half_up rationale)
    -- max, not avg: a float SUM is summation-order-dependent, so the
    -- two engines disagree by ULPs before any rounding; max picks an
    -- existing bit pattern and is order-independent (resample docstring)
    obs AS (SELECT user_id, h,
                   floor(max(value) * 1000000 + 0.5) / 1000000 AS v
            FROM e GROUP BY 1, 2),
    span AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM obs GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.h, o.v
      FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
    ),
    f AS (
      SELECT user_id, h, v,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER wp AS pt,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER wn AS nt
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(h, '%Y-%m-%d %H:%M') AS hour,
           floor((CASE WHEN v IS NOT NULL THEN v
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       -- parenthesized fraction: Spark computes
                       -- (nv-pv) * (dt/span); x*y/z associates as
                       -- (x*y)/z and differs by ULPs
                       ELSE pv + (nv - pv)
                            * ((epoch(h) - epoch(pt))
                               / (epoch(nt) - epoch(pt)))
                  END) * 10000 + 0.5) / 10000 AS value_filled,
           (v IS NOT NULL) AS is_observed
    FROM f
    """,
)
def gap_filled_user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill/resample (r8, operators/resample.py): each sampled
    user's sparse purchase series densified onto an hourly grid with
    linear interpolation between observed hours (constant extrapolation
    at the edges). sequence()+explode grid, two shared-sort window
    fills, one key shuffle — no UDF. The oracle replays the identical
    grid + IGNORE NULLS window fills; the only float inputs (hourly avg
    values) are rounded to 6 BEFORE interpolation in both engines, so
    the interpolation arithmetic sees bit-identical operands."""
    from mrt_data_integration_spark.operators.resample import resample_series

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 40 == 0)
    ).select("user_id", "ts", "value")
    out = resample_series(
        purchases,
        ["user_id"],
        "ts",
        "value",
        unit="hour",
        how="linear",
        # max, not avg: float-sum aggregation is summation-order-
        # dependent, so Spark and DuckDB disagree by ULPs that a
        # boundary row then rounds apart; max is order-independent and
        # bit-exact across engines
        agg="max",
    )
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("hour"),
        "value_filled",
        "is_observed",
    )
