"""Partitioned-dataset parquet sink (SURVEY.md §2.1 S3/S7 extension).

The reference persists intermediate frames as single files
(simulation.R:250-254 ``write.csv``); at 100 TB the sink itself becomes
an operator with failure modes of its own:

- **Small files.** A naive ``df.write.partitionBy(cols)`` makes EVERY
  upstream task open a writer for EVERY partition value it sees —
  tasks × values output files (a 2 000-task stage over 100 languages
  → 200 000 files), which then poisons every downstream scan with
  per-file open/footer costs and overwhelms the metastore listing.
- **Giant files / skew.** Repartitioning by the partition columns alone
  collapses each value into ONE task — the 40 %-of-corpus ``en``
  partition becomes a single straggling writer and a single
  row-group-bloated file.

``write_partitioned_dataset`` threads that needle: rows are hash-spread
across ``files_per_partition`` salted buckets WITHIN each partition
value (one shuffle), so each partition directory is written by exactly
that many tasks → that many files, regardless of either the upstream
task count or the value's skew. ``sort_cols`` orders rows within each
file (parquet min/max row-group statistics then give downstream scans
range pruning on those columns — the poor man's clustering index), and
``maxRecordsPerFile`` caps the worst case if a salt bucket still
overflows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    files_per_partition: "int | Column" = 1,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    helper_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a hive-layout parquet dataset at ``path``.

    Layout contract: each ``partition_cols`` value combination gets its
    own directory containing at most ``files_per_partition`` files (plus
    any ``maxRecordsPerFile`` splits), each internally sorted by
    ``sort_cols``. The salt is ``hash(whole row) % files_per_partition``
    — content-derived, so the layout is deterministic for a given input,
    and uniform, so skewed partition values spread evenly instead of
    serializing through one writer. "At most": two salt buckets of the
    same value can hash into one reduce task, which then writes their
    rows as one file — collisions only ever merge files, never split
    them, so the small-files bound holds unconditionally.

    ``helper_cols`` name columns that exist only to carry per-row
    writer directives (e.g. the compaction path's joined-in file-count
    lookup): they are excluded from the content-derived salt and
    dropped before the write, so the output layout and schema are
    identical to a run where the directive was a literal.
    """
    sort_cols = sort_cols or []
    helper_cols = helper_cols or []
    # files_per_partition may be a Column (evaluated per row from df's
    # own columns) so a caller can size file counts PER PARTITION VALUE
    # — the compaction path's skew-aware layout. Clamped to ≥ 1.
    if isinstance(files_per_partition, int):
        n_files = F.lit(max(1, files_per_partition))
    else:
        n_files = F.greatest(files_per_partition.cast("int"), F.lit(1))
    # pmod, not abs(hash) % n: abs(Integer.MIN_VALUE) overflows (stays
    # negative, or throws under ANSI mode), which would mint a negative
    # salt bucket — an extra file beyond the files_per_partition bound.
    salt = F.pmod(
        F.hash(*[F.col(c) for c in df.columns if c not in helper_cols]),
        n_files,
    ).alias("__salt__")
    arranged = df.withColumn("__salt__", salt).repartition(
        *[F.col(c) for c in partition_cols], F.col("__salt__")
    )
    if sort_cols:
        arranged = arranged.sortWithinPartitions(
            *[F.col(c) for c in partition_cols + sort_cols]
        )
    writer = (
        arranged.drop("__salt__", *helper_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_partitioned_dataset(spark, path: str) -> DataFrame:
    """Read a dataset written by :func:`write_partitioned_dataset`.

    Plain ``spark.read.parquet`` — the hive layout makes the partition
    columns virtual directory columns, so an equality/IN filter on them
    prunes whole directories at planning time (``PartitionFilters`` in
    the scan node — tests/test_sinks.py pins this), reading zero bytes
    of the excluded partitions. That planning-time pruning is the entire
    point of partitioning the 100 TB corpus by coarse keys.
    """
    return spark.read.parquet(path)


def compaction_plan(path: str, target_file_bytes: int) -> list[dict]:
    """Per-partition-directory compaction plan for a hive-layout
    dataset: current parquet file count and bytes, and the file count a
    rewrite to ``target_file_bytes`` would produce. Driver-side
    ``os.walk`` over directory METADATA only — the same listing any
    metastore pays; zero data read. At object-store scale the walk
    becomes a manifest listing; the arithmetic is unchanged."""
    import math
    import os

    plan = []
    for root, _dirs, files in os.walk(path):
        pq = [f for f in files if f.endswith(".parquet")]
        if not pq:
            continue
        n_bytes = sum(os.path.getsize(os.path.join(root, f)) for f in pq)
        after = max(1, math.ceil(n_bytes / max(1, target_file_bytes)))
        plan.append(
            {
                "partition_dir": os.path.relpath(root, path),
                "n_files": len(pq),
                "bytes": n_bytes,
                # compaction only ever MERGES files — a dir already at
                # or under target density keeps its file count
                "files_after": min(after, len(pq)),
            }
        )
    return plan


def compact_dataset(
    spark,
    src: str,
    dest: str,
    partition_cols: list[str],
    target_file_bytes: int,
    sort_cols: list[str] | None = None,
) -> list[dict]:
    """Rewrite a small-files hive dataset into bounded-size files —
    the standard 100 TB table-maintenance operation (streaming sinks
    and incremental appends accrete files; every future scan then pays
    per-file open/footer costs and the listing overwhelms the planner).

    Skew-aware by measurement: each partition VALUE gets the file count
    its MEASURED bytes warrant (``compaction_plan``), carried into the
    writer's salt via a broadcast-joined per-row lookup — the
    40 %-of-corpus ``en``
    directory keeps enough files to parallelize, a two-row language
    collapses to one, in the same single shuffle. One data pass total.

    Writes to ``dest`` (a FRESH directory): compaction must never
    rewrite in place under readers. Publish by atomically flipping a
    current-version pointer (the versioned-dir protocol in
    streaming/rollup.py) or, for build-once artifacts,
    :func:`publish_build`. Returns the plan it executed.

    Partition values are matched through their hive directory encoding
    (``col=value`` path segments, string-cast) — exact for the
    string/int keys coarse partitioning uses; a null partition value
    (``__HIVE_DEFAULT_PARTITION__``) falls back to one file per dir.

    AQE interaction: small-partition coalescing can merge salt buckets
    that are far below the advisory partition size — which only ever
    produces FEWER, larger files (compaction's goal). At production
    targets (hundreds of MB per bucket, above the advisory size)
    nothing merges and the planned counts hold.
    """
    plan = compaction_plan(src, target_file_bytes)
    df = read_partitioned_dataset(spark, src)
    helper_cols: list[str] = []
    if plan:
        key = F.concat_ws(
            "/",
            *[
                F.concat(F.lit(c + "="), F.col(c).cast("string"))
                for c in partition_cols
            ],
        )
        # The plan is joined in as a BROADCAST dim, not inlined as a
        # create_map literal: a date-partitioned table has thousands of
        # partition dirs, and a 2×N-literal expression tree slows
        # analysis superlinearly and can blow the 64 KB JVM method
        # limit on the per-row salt path. The broadcast lookup is O(1)
        # plan size at any partition count. A LEFT join keeps rows
        # whose dir misses the plan (null partition value →
        # __HIVE_DEFAULT_PARTITION__, hive-escaped specials) — they
        # coalesce to the 1-file fallback.
        plan_df = spark.createDataFrame(
            [(p["partition_dir"], int(p["files_after"])) for p in plan],
            "__part_dir__ string, __files_after__ int",
        )
        df = df.join(
            F.broadcast(plan_df), key == F.col("__part_dir__"), "left"
        ).drop("__part_dir__")
        n_files = F.coalesce(F.col("__files_after__"), F.lit(1))
        helper_cols = ["__files_after__"]
    else:
        n_files = F.lit(1)
    write_partitioned_dataset(
        df,
        dest,
        partition_cols,
        sort_cols=sort_cols,
        files_per_partition=n_files,
        helper_cols=helper_cols,
    )
    return plan


def zorder_key(
    cols: "list[Column | str]",
    ranges: "list[tuple[float, float]]",
    bits: int = 10,
) -> Column:
    """Z-order (Morton) sort key over 2+ numeric columns — interleaved
    quantized bits, so sorting by it clusters rows that are close in
    EVERY dimension into the same neighborhoods.

    Why: parquet row-group min/max statistics prune scans only along
    the sort order. Sorting by ``(a, b)`` makes ``b``'s per-file ranges
    near-useless (each file spans most of ``b``); sorting by the Morton
    code keeps BOTH columns' per-file ranges narrow, so a conjunctive
    box predicate (``a BETWEEN … AND b BETWEEN …``) prunes on both —
    the standard lakehouse multi-dimensional clustering technique
    (tests/test_sinks.py measures the pruning win vs a linear sort).

    Quantization is uniform over the caller-supplied ``ranges``
    (typically robust p1/p99 bounds from
    ``operators.sketches.approx_profile`` — one cheap sketch pass),
    clamped at the edges: out-of-range values cluster at the boundary
    cells, degrading pruning for them but never correctness. ``bits``
    per dimension; the key fits a long for dims × bits ≤ 63. Pure
    integer expressions — codegen, no UDF, no shuffle beyond the sort
    the caller was already paying for.
    """
    if len(cols) != len(ranges):
        raise ValueError("one (lo, hi) range per z-order column")
    if len(cols) * bits > 63:
        raise ValueError("dims × bits must fit a signed long (≤ 63)")
    n_cells = (1 << bits) - 1
    quantized = []
    for c, (lo, hi) in zip(cols, ranges):
        c = F.col(c) if isinstance(c, str) else c
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(
            float(hi) - float(lo)
        )
        q = F.least(
            F.greatest(F.floor(scaled * n_cells).cast("long"), F.lit(0)),
            F.lit(n_cells),
        )
        quantized.append(q)
    ndims = len(quantized)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for d, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * ndims + d)
    return key


def shard_key(id_col: "Column | str", salt: str = "shard") -> Column:
    """Deterministic 32-bit shuffle key from an id: the first 8 hex
    chars of ``md5(salt || ':' || id)`` parsed as a long — uniform,
    engine-portable (same convention as the stratified-sample gates),
    and independent of the input's physical order."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> None:
    """Deterministic global shuffle + sharding — the LAST step of a
    training-data pipeline: documents leave the corpus in a fixed
    pseudo-random order, split into ``n_shards`` hive directories
    (``__shard__=K`` — the physical hive partition column is the
    engine-internal ``__shard__``), each file internally sorted by the shuffle key.

    Determinism contract: shard assignment is ``shard_key(id) mod
    n_shards`` and within-shard order is (shard_key, id) — both pure
    functions of the id, so the SAME corpus yields byte-identical shard
    membership and order on any cluster, any partitioning, any run (the
    property that makes training runs reproducible and resumable). A
    trainer reading ``__shard__=K`` in file order replays the canonical
    order; epochs re-shuffle by changing ``salt``.

    Scale shape: ONE shuffle, keyed by the (uniform) shard id via
    ``repartitionByRange`` over (shard, key) — every writer task gets a
    contiguous, equal-mass key range, so output files are balanced
    regardless of input skew, and the within-file sort is a local sort
    of an already-range-partitioned task. No global sort, no driver
    involvement.
    """
    key = shard_key(id_col, salt)
    out = df.withColumn("__sk__", key).withColumn(
        "__shard__", F.pmod(F.col("__sk__"), F.lit(n_shards))
    )
    (
        out.repartitionByRange(F.col("__shard__"), F.col("__sk__"))
        .sortWithinPartitions("__shard__", "__sk__", id_col)
        .drop("__sk__")
        .write.mode("overwrite")
        .partitionBy("__shard__")
        .parquet(path)
    )


def ephemeral_dir(prefix: str) -> str:
    """mkdtemp whose removal is registered at interpreter exit. For
    round-trip queries whose written dir must outlive the query's lazy
    result (the sink is the thing under test), so per-invocation
    cleanup isn't possible — without exit-time cleanup every bench
    shot / parity run leaks a directory into /tmp forever (observed:
    50+ per query family before this existed)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d


# Append-only in-process log of build_and_publish outcomes:
# (artifact path, built: bool) per call — False when a complete
# published copy was reused. bench.py reports it per run (the r14
# verdict's artifact-transparency item) so a bench median over
# persisted-store queries is self-describing about whether the run
# paid any cold artifact build. Observability only: never read by
# engine code.
BUILD_EVENTS: list[tuple[str, bool]] = []


def build_and_publish(path: str, marker: str, build) -> str:
    """Build a shared cache artifact if absent: run ``build(tmp_dir)``
    into a private sibling directory, then :func:`publish_build` it at
    ``path``; returns the directory to READ from. The
    check-then-build-then-publish idiom lives here ONCE so the protocol
    cannot drift across its call sites (persisted ANN indexes, the LSH
    signature store, training shards, streamable staging dirs)."""
    import os
    import uuid

    if os.path.exists(os.path.join(path, marker)):
        BUILD_EVENTS.append((path, False))
        return path
    tmp = f"{path}.build-{uuid.uuid4().hex[:8]}"
    build(tmp)
    BUILD_EVENTS.append((path, True))
    return publish_build(tmp, path, marker)


def publish_build(tmp: str, path: str, marker: str) -> str:
    """Atomically publish a freshly built artifact directory (index,
    signature store, shard set) at its shared cache path; returns the
    directory to READ from.

    The build-into-private-dir + rename protocol makes concurrent
    builders safe (the rename loser discards its copy), but the naive
    fallback had a hole: rename also fails when ``path`` holds a STALE
    PARTIAL directory (a killed earlier process), and discarding the
    fresh build then leaves every future reader on the incomplete
    artifact. So on rename failure: if ``path`` carries its completion
    ``marker``, a concurrent winner published a complete copy — use it;
    otherwise move the debris ASIDE (an atomic rename to a private
    debris name — never an in-place rmtree, which between the marker
    check and the delete could destroy a complete artifact a concurrent
    winner just published and a reader is mid-scan on; ADVICE r6) and
    retry, falling back to reading the private complete copy if the
    path stays contended. If the swept-aside directory turns out to
    carry the marker (the race fired inside that window), it IS a
    complete artifact — every builder builds the same deterministic
    content — so it is reinstated rather than destroyed.

    Residual window, stated honestly: between sweeping a
    just-published complete dir aside and reinstating it, ``path``
    itself is briefly absent — a reader that resolved ``path`` in that
    microsecond window sees ENOENT and should retry (its content is
    never lost; the re-check immediately before the sweep makes the
    window one syscall wide). Fully closing it needs a lock shared
    with the publish fast-path, which trades a crash-stale-lock
    liveness problem for a transient-retry problem — the retry is the
    better failure mode for a /tmp artifact cache.
    """
    import os
    import shutil
    import uuid

    def _published() -> bool:
        return os.path.exists(os.path.join(path, marker))

    try:
        os.rename(tmp, path)
        return path
    except OSError:
        pass
    debris = f"{path}.debris.{uuid.uuid4().hex[:8]}"
    # Single marker check, immediately before the sweep: the sweep
    # takes a complete artifact OFF the path for a moment if one was
    # published since the rename failed, so the check sits adjacent to
    # the os.rename — one syscall wide, and in exactly one place (a
    # duplicated copy of this branch diverges the protocol the first
    # time one copy is edited).
    if _published():
        shutil.rmtree(tmp, ignore_errors=True)
        return path
    try:
        os.rename(path, debris)
    except OSError:
        # path vanished or changed under us — fall through to the retry;
        # a complete copy published meanwhile is honored below.
        pass
    else:
        if os.path.exists(os.path.join(debris, marker)):
            # We swept aside a COMPLETE artifact published in the race
            # window. Put it back (atomic); if the slot was re-taken by
            # another complete copy meanwhile, ours is redundant.
            try:
                os.rename(debris, path)
                shutil.rmtree(tmp, ignore_errors=True)
                return path
            except OSError:
                if _published():
                    shutil.rmtree(debris, ignore_errors=True)
                    shutil.rmtree(tmp, ignore_errors=True)
                    return path
                # Contended with non-published debris again: serve the
                # complete swept-aside copy rather than fight.
                shutil.rmtree(tmp, ignore_errors=True)
                return debris
        shutil.rmtree(debris, ignore_errors=True)
    try:
        os.rename(tmp, path)
        return path
    except OSError:
        if _published():
            shutil.rmtree(tmp, ignore_errors=True)
            return path
        return tmp
