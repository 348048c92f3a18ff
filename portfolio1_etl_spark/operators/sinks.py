"""Sinks — SURVEY.md §2.10 K1-K3.

The reference writes ~11 CSV reports, several with the date encoded in
the *filename* (portfolio-etl.py:700-717, :723-743, :772-775) and one
that overwrites its own input (:648). The idiomatic Spark replacements:

- K3 filename-encodes-partition → ``partitionBy('brand', 'dt')``
  directory layout (partition pruning for every downstream reader);
- K2 read-modify-overwrite → snapshot write to a new location (or a
  staged temp-then-swap), never an in-place mutation of an input being
  read — Spark would corrupt a table read lazily from the same path;
- K1 CSV report (pandas index column NOT reproduced).
"""

from __future__ import annotations

import os
import urllib.parse
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: bounded optimistic-concurrency retries for manifest-chain commits —
#: enough to ride out a burst of interleaved writers, small enough that
#: pathological contention fails loudly instead of spinning
_COMMIT_RETRIES = 8


def write_report_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """K1: a human-facing CSV report (soldvalueretail.csv,
    portfolio-etl.py:618). ``single_file`` coalesces to one part —
    only for genuinely small report outputs; large extracts keep their
    partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    bloom_filter_columns: dict[str, int] | None = None,
) -> None:
    """K3: date/brand-partitioned report fan-out — the filename-encodes
    -date pattern (portfolio-etl.py:700-707) as real partition
    directories.

    ``bloom_filter_columns`` maps column name → expected NDV and turns
    on PARQUET-LEVEL bloom filters for those columns (parquet-mr's
    ``parquet.bloom.filter.enabled#col`` options). Use for high-
    cardinality point-lookup columns that partitioning and min/max
    stats can't prune (IDs, hashes): at 100 TB a reader with predicate
    pushdown skips whole row groups on a negative membership test —
    the same role the engine-side CMS/Bloom operators play, but baked
    into the files so EVERY parquet reader benefits. Size cost is
    ~1.25 bytes/row/column at the default FPP. Note parquet-mr only
    writes the filter when the column exceeds the dictionary
    threshold — a fully dictionary-encoded column already answers
    exact membership, so requesting a bloom there is a silent no-op
    by design (size-delta-measured in tests/test_sinks_layout.py)."""
    w = df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt)
    for col, ndv in (bloom_filter_columns or {}).items():
        w = w.option(f"parquet.bloom.filter.enabled#{col}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
    w.option("header", True).save(path)


def write_snapshot(df: DataFrame, path: str) -> None:
    """K2: the inventory snapshot (portfolio-etl.py:648-650) with
    idempotent overwrite semantics. Caller must NOT write onto a path
    the plan is still lazily reading — materialize first (the
    reference's self-overwrite at :648 only works because pandas is
    eager)."""
    df.write.mode("overwrite").parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the table-maintenance job every
    long-running parquet lake needs: streaming/incremental writers
    leave thousands of KB-sized part files, and at 100 TB the
    per-file open/footer overhead dominates scan time. Rewrites the
    dataset into ceil(bytes/target) files via ``repartition`` (with
    optional ``sortWithinPartitions`` so min/max footer stats stay
    selective for downstream pushdown), staging to a sibling temp dir
    and swapping via rename — the source is never read and overwritten
    in the same job. A crash between the two renames leaves the data
    intact at ``path._precompact``; the next run recovers it before
    doing anything else (single-writer assumption, as for any
    parquet-directory overwrite). Returns the new file count.

    All listing/rename/delete go through the Hadoop FileSystem API
    resolved from the path's own scheme (r7 — previously local ``os``
    calls behind a loud reject on ``://`` paths), so compaction runs
    identically against local disk, ``file://`` URIs, and HDFS.
    Renames are atomic on HDFS/local; on object stores they are
    copy+delete. For object-store-safe compaction use a MANIFEST
    chain (``write_versioned(manifest=True)`` +
    ``compact_versioned``): the rewrite commits through a one-file
    manifest and never renames a directory at all (r8)."""
    fs, live = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    staged = Path(path.rstrip("/") + "._compacting")
    backup = Path(path.rstrip("/") + "._precompact")
    if fs.exists(backup):
        if fs.exists(live):  # crashed before the backup was removed
            fs.delete(backup, True)
        else:  # crashed mid-swap: restore the original dataset
            if not fs.rename(backup, live):
                raise IOError(
                    f"crash repair failed: could not restore {path} "
                    "from ._precompact backup"
                )
    if fs.exists(staged):  # incomplete prior staging
        fs.delete(staged, True)
    size, it = 0, fs.listFiles(live, True)  # recursive remote iterator
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            size += st.getLen()
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(path).repartition(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(str(staged))
    # FileSystem.rename reports failure by RETURNING FALSE, not by
    # raising — an unchecked call would drop the swap silently
    if not fs.rename(live, backup):
        raise IOError(f"swap failed: could not back up {path}")
    if not fs.rename(staged, live):
        raise IOError(f"swap failed: could not promote compacted {path}")
    fs.delete(backup, True)
    return n_files


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Columnar ORC sink (Spark-native, zlib by default) — for
    consumers standardized on the Hive/ORC stack. Same partition-layout
    semantics as ``write_partitioned``."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink — the interchange format most LLM-data tooling
    consumes. One JSON object per row, per-partition files (no
    driver-side coalesce; at scale the output is sharded like any
    columnar sink, just line-oriented)."""
    df.write.mode("overwrite").json(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Idempotent partition-level backfill: with DYNAMIC partition
    overwrite, only the partitions present in ``df`` are replaced —
    re-running yesterday's job rewrites yesterday's directories and
    leaves the rest of the table untouched. (STATIC mode — the
    default — would truncate the whole table first; at 100 TB that
    difference is the whole ballgame.) The mode is set per-write via
    option, not globally, so concurrent writers keep their own
    semantics."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_range_sorted(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Range-cluster the dataset on ``cols`` before writing: rows
    route to files by range (``repartitionByRange``) and sort within
    each file, so every parquet file covers a narrow, near-disjoint
    slice of the key space. Readers then skip whole files/row-groups
    from footer min/max statistics alone — the data-layout half of
    predicate pushdown, and at 100 TB the difference between a range
    query reading ~1/n_files of the data and reading all of it
    (asserted from the real footers in tests/test_sinks_layout.py).

    This is the single-dimension clustering a warehouse would call a
    sorted/clustered table; multi-column calls cluster hierarchically
    (major → minor), the right layout when filters lead with the
    first column."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_versioned(
    df: DataFrame,
    path: str,
    capture_changes: bool = False,
    manifest: bool = False,
    meta: dict | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Versioned snapshot chain — the warehouse-grade form of the
    reference's destructive inventory overwrite (portfolio-etl.py:648
    loses yesterday's stock forever): each write lands in
    ``{path}/v=N/`` with N = last + 1 and never touches prior
    versions, so a bad upstream run is a one-line rollback
    (``read_version(..., n)``), and the self-overwrite hazard
    ``write_snapshot`` documents cannot occur — the version being
    read and the version being written are different directories.
    Returns the new version number. Retention via ``prune_versions``.

    Version listing and pruning go through the Hadoop FileSystem API
    (``_versions``/``_delete_version``), resolved from the path's own
    scheme — so the chain behaves identically on local disk, HDFS, and
    object stores (wherever 100 TB actually lives), instead of a
    driver-local ``glob`` silently seeing zero versions on ``s3a://``
    and restarting the chain at v=0.

    Concurrency (r9): on a MANIFEST chain version allocation is
    optimistic-concurrency-safe. Each writer stages its data under a
    uuid-unique ``_staging/{token}/`` directory (no two writers ever
    contend on a path), then commits with a CREATE-EXCLUSIVE rename
    of ``_manifests/v=N.json`` — the compare-and-swap. Losing the
    race raises ``ConcurrentCommitError`` internally; the writer
    re-reads the latest version, re-derives its change feed against
    the ACTUAL new predecessor, and retries at N+1 (bounded, then
    loud failure — never a silent clobber; two-interleaved-writers
    test in test_sinks_layout). Non-manifest chains remain
    single-writer (the batch-job norm) — a multi-writer deployment
    without manifests needs a lock service in front.

    ``capture_changes=True`` additionally persists the row-level diff
    against the previous version to ``{path}/_changes/v=N/`` (v=0:
    every row as ``insert``) — WRITE-TIME change capture, so
    ``read_changes`` replays tiny delta files instead of re-diffing
    two full snapshots per read (r8; the r7 read-path diff paid two
    full-table scans + a full-row hash shuffle per read, which at
    100 TB defeats the point of publishing deltas). The diff costs the
    writer two scans of each endpoint (``exceptAll`` in each
    direction reads both inputs), paid ONCE per commit instead of
    once per consumer — and both inputs are freshly-written parquet,
    not the upstream pipeline, so nothing recomputes. The
    snapshot commits FIRST: a crash before the delta lands leaves a
    readable version whose feed ``read_changes`` reconstructs by
    snapshot diff for that step alone (self-healing fallback, tested
    in test_sinks_layout). The underscore prefix keeps Spark's
    partition discovery from ever mistaking ``_changes`` for data.

    ``partition_by`` (r9) lays each version out hive-partitioned on
    the given columns; the manifest records the layout (``base`` +
    ``partition_by``) so ``read_version`` restores the partition
    columns through a basePath-aware scan and a filter on them PRUNES
    FILES AT PLAN TIME (PartitionFilters — the plan-asserted property;
    at 100 TB the difference between listing one partition and
    scanning the table). ``compact_versioned`` preserves the layout.

    Schema evolution (r9): additive — a version may add (or drop)
    nullable columns; the captured change feed aligns adjacent
    versions to the union of columns (``_align_for_diff``), so an
    added column surfaces as update pairs (NULL → value), span reads
    fold across the boundary, and time travel returns each version's
    own schema. A same-name TYPE change is refused loudly at the
    capture diff — type evolution needs an explicit migration write.

    ``manifest=True`` upgrades the chain to MANIFEST COMMITS (r8):
    readers resolve a version through ``{path}/_manifests/v=N.json``
    — a single small file listing the version's data files, written
    LAST — instead of trusting directory existence. That closes the
    object-store atomicity gap the plain chain carries: a directory
    of part files appears gradually on S3-style stores (no atomic
    directory rename), but a one-file manifest PUT/rename is atomic
    everywhere, so a version either exists completely or not at all.
    A crash mid-write leaves an uncommitted data directory that is
    INVISIBLE to every reader and is swept by the next write's
    recovery pass. The flag is sticky: once a chain has manifests,
    later writes commit through them regardless of the argument
    (mixing would let a non-manifest write publish an invisible
    version). Crash-injection tested in test_sinks_layout.

    ``meta`` (manifest chains only) rides INSIDE the manifest JSON —
    committed atomically with the data in the same one-file commit,
    readable via ``version_meta``. That makes it the right home for
    writer bookkeeping that must never diverge from the data it
    describes: a streaming writer records its epoch id here, so
    exactly-once folding survives restarts with no side channel a
    crash could leave half-updated (streaming/jobs.py
    ``versioned_cdc_stream``)."""
    spark = df.sparkSession
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    has_manifests = fs.exists(hpath(f"{path}/_manifests"))
    if manifest and not has_manifests and _dir_versions(spark, path):
        raise ValueError(
            f"{path} already holds non-manifest versions; a chain "
            "cannot adopt manifest commits mid-life (readers could "
            "not tell an uncommitted directory from a legacy one)"
        )
    manifest = manifest or has_manifests
    if meta is not None and not manifest:
        raise ValueError("meta requires a manifest chain (manifest=True)")
    def _writer(frame: DataFrame):
        w = frame.write.mode("errorifexists")
        return w.partitionBy(*partition_by) if partition_by else w

    if not manifest:
        vs = _versions(spark, path)
        new = (max(vs) + 1) if vs else 0
        _writer(df).parquet(f"{path}/v={new}")
        if capture_changes:
            # diff the WRITTEN files (cheap re-scan) against the
            # previous snapshot — never the incoming plan, which
            # would recompute the upstream pipeline a second time
            written = spark.read.parquet(f"{path}/v={new}")
            if new == 0:
                feed = written.withColumn("_change", F.lit("insert"))
            else:
                feed = _step_changes(
                    written, read_version(spark, path, new - 1)
                )
            feed.write.mode("errorifexists").parquet(
                f"{path}/_changes/v={new}"
            )
        return new

    # manifest chain: stage once under a writer-unique token, then
    # CAS-commit with bounded retry. The data staging is version-
    # independent, so a lost race re-derives only the change feed.
    import uuid

    token = uuid.uuid4().hex[:12]
    data_rel = f"_staging/{token}/data"
    _writer(df).parquet(f"{path}/{data_rel}")
    written = spark.read.parquet(f"{path}/{data_rel}")
    for _ in range(_COMMIT_RETRIES):
        vs = _versions(spark, path)
        new = (max(vs) + 1) if vs else 0
        promotions = None
        constraints = None
        prev_m = _read_manifest(spark, path, new - 1) if new > 0 else None
        if new > 0:
            # constraints ride every manifest and carry forward; the
            # incoming snapshot validates per CAS attempt (a lost race
            # may have ADDED a constraint under this writer's feet)
            constraints = (prev_m or {}).get("constraints")
            _enforce_constraints(written, constraints, "snapshot write")
        if new > 0:
            # widening audit against the ACTUAL predecessor (re-derived
            # per CAS attempt): value-preserving promotions commit and
            # are RECORDED in the manifest; narrowing or cross-family
            # changes refuse at write time — before any reader can
            # trip over them at diff or span-fold time. Schema-only
            # probe: the recorded manifest schemas answer it without
            # building (and inferring) the predecessor's scan.
            prior_fields = _manifest_head_types(prev_m or {}) or {
                f.name: f.dataType
                for f in read_version(spark, path, new - 1).schema.fields
            }
            promotions = {}
            for f in written.schema.fields:
                old_t = prior_fields.get(f.name)
                if old_t is not None and f.dataType != old_t:
                    w = _widened(f.dataType, old_t)
                    if w is None or w != f.dataType:
                        raise ValueError(
                            f"column {f.name!r} would change "
                            f"{old_t.simpleString()} -> "
                            f"{f.dataType.simpleString()}: not a type-"
                            "widening promotion; narrowing/reinterpreting "
                            "needs an explicit migration write"
                        )
                    promotions[f.name] = {
                        "from": old_t.simpleString(),
                        "to": f.dataType.simpleString(),
                    }
            promotions = promotions or None
        changes_rel = None
        if capture_changes:
            # feed staging is PER ATTEMPT: its content depends on the
            # predecessor version, which a lost race changes
            changes_rel = f"_staging/{token}/changes-{new}"
            if new == 0:
                feed = written.withColumn("_change", F.lit("insert"))
            else:
                feed = _step_changes(
                    written, read_version(spark, path, new - 1)
                )
            feed.write.mode("errorifexists").parquet(
                f"{path}/{changes_rel}"
            )
        try:
            _commit_manifest(
                spark,
                path,
                new,
                meta,
                files=_list_rel_parquet(spark, path, data_rel),
                changes=(
                    _list_rel_parquet(spark, path, changes_rel)
                    if changes_rel
                    else []
                ),
                base=data_rel,
                partition_by=partition_by,
                type_promotions=promotions,
                constraints=constraints,
                schemas={str(new): written.schema.jsonValue()},
            )
            return new
        except ConcurrentCommitError:
            # another writer took v=new; drop our stale feed attempt
            # and retry against the advanced chain
            if changes_rel and not fs.delete(
                hpath(f"{path}/{changes_rel}"), True
            ):
                raise IOError(
                    f"could not clean stale staging {changes_rel}"
                )
    if not fs.delete(hpath(f"{path}/_staging/{token}"), True):
        pass  # best-effort abandon; vacuum_staging sweeps orphans
    raise ConcurrentCommitError(
        f"gave up committing to {path} after {_COMMIT_RETRIES} lost "
        "races — contention too high; back off and retry the write"
    )


def _widened(a, b):
    """The wider of two types when one is a VALUE-PRESERVING promotion
    of the other (the lakehouse type-widening lattice): the integer
    chain byte→short→int→long, float→double, and decimal precision
    growth at the same scale. Returns None for every other pair —
    narrowing and cross-family changes (long→int, string→int,
    long→double) are refused by the callers, loudly, because they can
    silently lose or reinterpret values."""
    if a == b:
        return a
    from pyspark.sql import types as T

    ints = (T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType())
    if a in ints and b in ints:
        return ints[max(ints.index(a), ints.index(b))]
    floats = (T.FloatType(), T.DoubleType())
    if a in floats and b in floats:
        return T.DoubleType()
    if (
        isinstance(a, T.DecimalType)
        and isinstance(b, T.DecimalType)
        and a.scale == b.scale
    ):
        return a if a.precision >= b.precision else b
    return None


def _align_for_diff(
    to_df: DataFrame, from_df: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Schema-evolution alignment (r9): lift both frames to the UNION
    of their columns, columns absent on one side becoming typed NULLs
    — so an ADDED column diffs as update pairs (old NULL → new value)
    and a DROPPED column as the reverse, instead of an
    AnalysisException from ``exceptAll``. Column order: `to`'s, then
    `from`'s extras.

    Type changes (r10): a column whose two sides differ by a
    VALUE-PRESERVING widening (``_widened`` — int→long, float→double,
    decimal precision-up) lifts BOTH sides to the wider type, so a
    mid-history promotion diffs exactly like unchanged data (the cast
    is injective — no two distinct narrow values collide). Any other
    type change still fails loudly — narrowing or reinterpretation
    needs an explicit migration, not a silent cast."""
    types: dict[str, object] = {f.name: f.dataType for f in to_df.schema.fields}
    for f in from_df.schema.fields:
        if f.name in types:
            if f.dataType != types[f.name]:
                w = _widened(f.dataType, types[f.name])
                if w is None:
                    raise ValueError(
                        f"column {f.name!r} changed type "
                        f"{f.dataType.simpleString()} -> "
                        f"{types[f.name].simpleString()}; only widening "
                        "promotions evolve in place — anything else "
                        "requires an explicit migration write"
                    )
                types[f.name] = w
        else:
            types[f.name] = f.dataType
    order = list(types)

    def lift(df: DataFrame) -> DataFrame:
        have = {f.name: f.dataType for f in df.schema.fields}
        return df.select(
            *[
                (
                    F.col(c).cast(types[c]).alias(c)
                    if have[c] != types[c]
                    else F.col(c)
                )
                if c in have
                else F.lit(None).cast(types[c]).alias(c)
                for c in order
            ]
        )

    return lift(to_df), lift(from_df)


#: Internal marker column of the signed-diff feed. ``_marker_name``
#: keeps it collision-free against user columns per call.
_DIFF_COL = "_d"


def _marker_name(base: str, taken) -> str:
    """``base`` suffixed with underscores until absent from ``taken``
    — internal marker columns must never collide with (and silently
    replace or ambiguate) a user column of the same name."""
    name = base
    taken = set(taken)
    while name in taken:
        name += "_"
    return name


def _signed_diff(to_df: DataFrame, from_df: DataFrame) -> DataFrame:
    """Net multiset delta ``to − from`` as (row cols..., _d long ≠ 0)
    in ONE aggregate pass (r13): the pair of directional ``exceptAll``
    calls this replaces each re-scanned BOTH frames, so every diff
    cost two scans of each input plus two wide aggregates; the
    signed-count form is one union scan plus one aggregate that yields
    both directions at once. Multiplicity is exact: net count Δ > 0 is
    Δ inserts, Δ < 0 is −Δ deletes — identical to exceptAll's
    max(0, ±Δ) semantics (and, like the set ops, grouping compares
    with null-safe, NaN-normalizing equality).

    The sign column name derives collision-free from the input
    columns (r14 — a user table carrying its own ``_s`` would have
    been silently corrupted: withColumn REPLACES same-named columns,
    rows then never cancel); the net-count column is pinned ``_d``
    for the ``_replicated``/consumer contract and REFUSED loudly in
    inputs (the old exceptAll path accepted it, but every consumer of
    the signed form already reserves it)."""
    cols = to_df.columns
    if _DIFF_COL in cols:
        raise ValueError(
            f"column {_DIFF_COL!r} is reserved by the change-feed "
            "machinery; rename it before diffing versioned snapshots"
        )
    s = _marker_name("_s", cols)
    return (
        to_df.withColumn(s, F.lit(1))
        .unionByName(from_df.withColumn(s, F.lit(-1)))
        .groupBy(*cols)
        .agg(F.sum(s).alias(_DIFF_COL))
        .filter(F.col(_DIFF_COL) != 0)
    )


def _replicated(net: DataFrame, positive: bool) -> DataFrame:
    """One sign of a signed diff restored to multiset form (|Δ| copies
    per row) — array_repeat + explode, no join, no second aggregate.
    The repeat count stays BIGINT via sequence() (r14 — casting to int
    with ANSI off would wrap a multiplicity over 2^31 and array_repeat
    on the negative wrap returns an EMPTY array: rows silently vanish
    instead of failing)."""
    cols = [c for c in net.columns if c != _DIFF_COL]
    side = net.filter(F.col(_DIFF_COL) > 0 if positive else F.col(_DIFF_COL) < 0)
    rep = _marker_name("__r", cols)
    return side.select(
        *cols,
        F.explode(F.expr(f"sequence(1L, abs({_DIFF_COL}))")).alias(rep),
    ).drop(rep)


def _step_changes(to_df: DataFrame, from_df: DataFrame) -> DataFrame:
    """The multiset insert/delete feed between two adjacent frames:
    rows in `to` but not `from` surface as ``insert``, the reverse as
    ``delete`` — signed-count diff (``_signed_diff``) so duplicate
    rows diff by COUNT. A row can never appear under both labels (the
    counts are max(0, Δ) and max(0, −Δ)), which is what makes per-step
    feeds net-foldable. Frames with evolved (additive) schemas align
    to the union of columns first — see ``_align_for_diff``."""
    to_df, from_df = _align_for_diff(to_df, from_df)
    net = _signed_diff(to_df, from_df)
    cols = [c for c in net.columns if c != _DIFF_COL]
    rep = _marker_name("__r", cols)
    return net.select(
        *cols,
        F.when(F.col(_DIFF_COL) > 0, F.lit("insert"))
        .otherwise(F.lit("delete"))
        .alias("_change"),
        F.explode(F.expr(f"sequence(1L, abs({_DIFF_COL}))")).alias(rep),
    ).drop(rep)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``, resolved by the path's OWN
    scheme against the session's Hadoop conf — file:// and bare paths
    get the local FS, hdfs://, s3a://, etc. their connector. This is
    the same resolution Spark's writers use, so listing and writing
    can never disagree about which store they are talking to."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def _hive_partition_cols(spark: SparkSession, data_dir: str) -> list[str]:
    """Partition columns of a hive-laid-out directory, recovered from
    the ``col=value`` subdirectory chain (walking one branch — hive
    layouts are uniform by construction). Empty list when the first
    level holds plain files."""
    fs, _ = _hadoop_fs(spark, data_dir)
    jvm = spark.sparkContext._jvm
    cols: list[str] = []
    cur = jvm.org.apache.hadoop.fs.Path(data_dir)
    while fs.exists(cur):
        nxt = None
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name and not name.startswith((".", "_")):
                cols.append(name.split("=", 1)[0])
                nxt = st.getPath()
                break
        if nxt is None:
            break
        cur = nxt
    return cols


def _dir_versions(spark: SparkSession, path: str) -> list[int]:
    """Sorted version numbers under ``path`` by DIRECTORY listing —
    the legacy (pre-manifest) resolution, still what non-manifest
    chains use."""
    import re

    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    vs = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and (m := re.fullmatch(r"v=(\d+)", name)):
            vs.append(int(m.group(1)))
    return sorted(vs)


def _versions(spark: SparkSession, path: str) -> list[int]:
    """Committed version numbers. On a manifest chain only versions
    whose manifest file landed count — an uncommitted data directory
    from a crashed writer is invisible; elsewhere, directory listing
    (the two never mix: ``write_versioned`` enforces it)."""
    import re

    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    mdir = jvm.org.apache.hadoop.fs.Path(f"{path}/_manifests")
    if not fs.exists(mdir):
        return _dir_versions(spark, path)
    vs = []
    for status in fs.listStatus(mdir):
        name = status.getPath().getName()
        if status.isFile() and (m := re.fullmatch(r"v=(\d+)\.json", name)):
            vs.append(int(m.group(1)))
    return sorted(vs)


def _list_rel_parquet(spark: SparkSession, path: str, sub: str) -> list[str]:
    """``sub``-relative paths of every ``*.parquet`` data file under
    ``{path}/{sub}`` (recursive; ``_SUCCESS`` et al. excluded)."""
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    d = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
    if not fs.exists(d):
        return []
    base = d.toUri().getPath()
    out = []
    it = fs.listFiles(d, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toUri().getPath()
        if p.endswith(".parquet"):
            out.append(sub + p[len(base):])
    return sorted(out)


def _read_small_file(spark: SparkSession, path: str) -> str | None:
    """Contents of a small control file via the path's own Hadoop FS,
    or None when absent — the shared read half of the one-file commit
    protocol (manifests, generation pointers)."""
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same version/pointer first. The
    caller either retries against the new latest (``write_versioned``)
    or aborts loudly — never silently clobbers the winner's commit."""


def _write_small_file_atomic(
    spark: SparkSession, path: str, text: str, overwrite: bool = True
) -> None:
    """The one-file COMMIT: stage to a unique dot-tmp sibling, then
    rename into place through ``FileContext`` — which (unlike
    ``FileSystem.rename``'s silently-ignorable boolean) THROWS on
    failure, and supports two distinct commit semantics:

    - ``overwrite=True`` → ``Options.Rename.OVERWRITE``: an ATOMIC
      replace (HDFS server-side; ``Files.move(REPLACE_EXISTING)`` on
      local). There is no delete-then-rename window in which a
      concurrent reader sees the pointer file absent.
    - ``overwrite=False`` → create-exclusive, surfaced as
      ``ConcurrentCommitError`` when the destination exists. This is
      the compare-and-swap primitive the manifest chain's
      concurrent-writer protocol commits through (the same pattern as
      Delta's HDFS LogStore ``putIfAbsent``). The guarantee is
      store-scoped: on HDFS ``Options.Rename.NONE`` is one atomic
      server-side op; on the LOCAL filesystem Hadoop's
      ``RawLocalFs.rename`` is exists-check-then-rename — a
      check-then-act window two genuinely concurrent writers can both
      pass — so paths whose HADOOP-RESOLVED filesystem is the local FS
      take a pure-POSIX branch instead: ``os.link(tmp, final)``, whose
      ``EEXIST`` is a kernel-atomic putIfAbsent. The branch decision
      resolves the path through the SAME ``_hadoop_fs`` lookup the
      read half (``_read_small_file`` / ``_versions``) uses — a bare
      schemeless path on a cluster whose ``fs.defaultFS`` is
      ``hdfs://`` must commit to HDFS, not the driver's local disk
      (the raw-string check would split-brain the commit protocol:
      writes landing locally, reads looking on HDFS). Plain object
      stores without atomic rename need their usual consistency shim
      (external lock / conditional PUT), same as every rename-based
      commit protocol.

    A single-file rename is atomic on HDFS/local and an atomic
    single-object copy on S3-style stores — which is exactly why every
    commit point in this package (manifest files, the ANN generation
    pointer) goes through ONE small file instead of trusting
    multi-file directory renames (non-atomic copy+delete there).
    Centralized so a store-specific fix lands in every commit point
    at once. The tmp name embeds a uuid so two concurrent committers
    can never clobber each other's staged bytes."""
    import uuid

    from py4j.protocol import Py4JJavaError

    parsed = urllib.parse.urlparse(path)
    # POSIX branch ONLY when Hadoop resolves the path to the local FS.
    # An explicit file:// scheme is definitively local; a schemeless
    # path resolves against fs.defaultFS, so ask Hadoop — on a cluster
    # with defaultFS=hdfs:// the schemeless path MUST take the
    # FileContext branch or the write and read halves of the commit
    # protocol would talk to different stores.
    is_local = parsed.scheme == "file" or (
        parsed.scheme == ""
        and _hadoop_fs(spark, path)[0].getUri().getScheme() == "file"
    )
    if is_local:
        local = parsed.path if parsed.scheme == "file" else path
        tmp_local = os.path.join(
            os.path.dirname(local),
            f".{os.path.basename(local)}.{uuid.uuid4().hex[:12]}.tmp",
        )
        os.makedirs(os.path.dirname(local), exist_ok=True)
        with open(tmp_local, "w", encoding="utf-8") as fh:
            fh.write(text)
        try:
            if overwrite:
                os.replace(tmp_local, local)  # POSIX-atomic swap
            else:
                try:
                    os.link(tmp_local, local)  # kernel-atomic putIfAbsent
                except FileExistsError as e:
                    raise ConcurrentCommitError(
                        f"lost the commit race for {path}: another "
                        "writer's file landed first"
                    ) from e
        finally:
            if os.path.exists(tmp_local):
                os.remove(tmp_local)
        return

    fs, _ = _hadoop_fs(spark, path)
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    parent, name = path.rsplit("/", 1)
    tmp = hpath(f"{parent}/.{name}.{uuid.uuid4().hex[:12]}.tmp")
    final = hpath(path)
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        final.toUri(), sc._jsc.hadoopConfiguration()
    )
    rename_enum = jvm.org.apache.hadoop.fs.Options.Rename
    opts = sc._gateway.new_array(rename_enum, 1)
    opts[0] = rename_enum.OVERWRITE if overwrite else rename_enum.NONE
    try:
        fc.rename(tmp, final, opts)
    except Py4JJavaError as e:
        if not fs.delete(tmp, False):  # best-effort stage cleanup
            pass
        exc = str(e.java_exception.getClass().getName())
        if not overwrite and "AlreadyExists" in exc:
            raise ConcurrentCommitError(
                f"lost the commit race for {path}: another writer's "
                "file landed first"
            ) from e
        raise IOError(f"atomic rename to {path} failed: {e}") from e


def _enforce_constraints(df: DataFrame, cons: dict | None, what: str) -> None:
    """Validate ``df`` against a manifest's ``constraints`` block
    (``{"not_null": [col, ...], "check": {name: sql_expr, ...}}``) —
    one scan of the INCOMING rows only, never the table. ANSI CHECK
    semantics: a check fails only when its expression evaluates to
    FALSE (NULL passes — that's what ``not_null`` is for). Raises with
    the violated constraint names and up to three offending rows."""
    if not cons:
        return
    fails = []
    for c in cons.get("not_null", []):
        if c not in df.columns:
            raise ValueError(
                f"{what} is missing NOT NULL constrained column {c!r}"
            )
        fails.append(F.when(F.col(c).isNull(), F.lit(f"NOT NULL {c}")))
    for name, expr in (cons.get("check") or {}).items():
        fails.append(
            F.when(
                ~F.coalesce(F.expr(expr), F.lit(True)),
                F.lit(f"CHECK {name}"),
            )
        )
    if not fails:
        return
    bad = (
        df.withColumn("_violated", F.array_compact(F.array(*fails)))
        .filter(F.size("_violated") > 0)
        .limit(3)
        .collect()
    )
    if bad:
        names = sorted({v for r in bad for v in r["_violated"]})
        rows = [
            {k: v for k, v in r.asDict().items() if k != "_violated"}
            for r in bad
        ]
        raise ValueError(
            f"{what} violates chain constraints {names}; "
            f"e.g. {rows} — nothing was committed"
        )


def _commit_manifest(
    spark: SparkSession,
    path: str,
    n: int,
    meta: dict | None = None,
    files: list[str] | None = None,
    changes: list[str] | None = None,
    cas: bool = True,
    base: str | None = None,
    partition_by: list[str] | None = None,
    seqs: dict[str, int] | None = None,
    row_deletes: list[dict] | None = None,
    bases: dict[str, str] | None = None,
    type_promotions: dict[str, dict] | None = None,
    clone_of: dict | None = None,
    constraints: dict | None = None,
    stats: dict | None = None,
    schemas: dict | None = None,
) -> None:
    """The commit point of a manifest chain: one small JSON file
    listing the version's data (and change-feed) files, staged to a
    dot-tmp name and renamed into ``_manifests/v=N.json``. Until this
    file exists, no reader resolves the version.

    ``cas=True`` (the default — every production commit path) makes
    the rename CREATE-EXCLUSIVE: if another writer's ``v=N.json``
    landed first the commit raises ``ConcurrentCommitError`` instead
    of silently replacing the winner's manifest — the
    compare-and-swap half of the concurrent-writer protocol
    (``write_versioned`` reacts by re-reading the latest version and
    retrying at N+1).

    ``files``/``changes`` are the r9 staged-layout inputs (root-
    relative parquet paths); when omitted the legacy ``v=N`` /
    ``_changes/v=N`` directories are listed instead."""
    import json

    from datetime import datetime, timezone

    layout = {}
    if base is not None:
        layout["base"] = base
    if partition_by:
        layout["partition_by"] = list(partition_by)
    if seqs is not None:
        layout["seqs"] = seqs
    if row_deletes is not None:
        layout["row_deletes"] = row_deletes
    if bases is not None:
        layout["bases"] = bases
    if type_promotions:
        layout["type_promotions"] = type_promotions
    if clone_of is not None:
        layout["clone_of"] = clone_of
    if constraints:
        layout["constraints"] = constraints
    if stats:
        layout["stats"] = stats
    if schemas:
        # per-seq read-back schemas (see _recorded_schema): readers
        # skip footer-inference jobs for every group recorded here
        layout["schemas"] = schemas
    doc = json.dumps(
        {
            "version": n,
            "committed_at": datetime.now(timezone.utc).isoformat(),
            **layout,
            "files": (
                files
                if files is not None
                else _list_rel_parquet(spark, path, f"v={n}")
            ),
            "changes": (
                changes
                if changes is not None
                else _list_rel_parquet(spark, path, f"_changes/v={n}")
            ),
            "meta": meta or {},
        },
        indent=1,
    )
    _write_small_file_atomic(
        spark, f"{path}/_manifests/v={n}.json", doc, overwrite=not cas
    )


def _read_manifest(spark: SparkSession, path: str, n: int) -> dict | None:
    """Parsed manifest for version ``n``, or None when the chain (or
    that version) has no manifest."""
    import json

    txt = _read_small_file(spark, f"{path}/_manifests/v={n}.json")
    return None if txt is None else json.loads(txt)


def version_meta(spark: SparkSession, path: str, n: int | None = None) -> dict:
    """The writer-supplied ``meta`` committed with version ``n``
    (default: latest) — atomically consistent with the data because it
    lives in the same manifest file. Empty dict for manifest versions
    written without meta; raises FileNotFoundError for non-manifest
    chains/versions (they have no committed metadata)."""
    if n is None:
        vs = _versions(spark, path)
        if not vs:
            raise FileNotFoundError(f"no versions under {path}")
        n = vs[-1]
    m = _read_manifest(spark, path, n)
    if m is None:
        raise FileNotFoundError(f"no manifest for version {n} under {path}")
    return m.get("meta", {})


def _manifest_bases(m: dict) -> dict[str, str]:
    """Per-sequence basePath map: delta manifests record ``bases``
    (files appended at different commits stage under different token
    dirs); pre-delta manifests carried one ``base`` for all files."""
    if "bases" in m:
        return dict(m["bases"])
    if "base" in m:
        return {str(m["version"]): m["base"]}
    return {}


def _recorded_schema(doc: dict | None):
    """``StructType`` from a recorded-schema JSON dict, or None.

    r14: every Spark ``read.parquet`` WITHOUT an explicit schema runs
    a footer-inference JOB (~0.25 s of scheduler fixed cost) before
    the read is even planned — a manifest-chain replay pays that per
    file group per ``read_version``. Commit paths therefore CAPTURE
    the inference result they already compute (the post-write
    read-back, which is footer-faithful by construction — including
    partition-column type inference on hive-laid-out groups) into the
    manifest, and every reader passes it back explicitly: zero
    inference jobs on the read side, byte-identical schema to what
    inference would return because it IS an inference result. File
    groups without a recorded schema (pre-r14 manifests, compaction
    rewrites) fall back to inference exactly as before."""
    if not doc:
        return None
    from pyspark.sql import types as T

    return T.StructType.fromJson(doc)


def _manifest_head_types(m: dict) -> dict | None:
    """name → DataType of ``read_version``'s output for manifest ``m``,
    derived purely from recorded schemas (None when any seq group lacks
    one): per-seq schemas folded in seq order, later commits winning —
    an upsert commits the full (possibly widened) column set, so the
    newest append's types are the head types. Lets schema-only
    consumers (the write-time widening audit) skip building the
    read_version plan altogether."""
    if not m or "version" not in m:
        return None
    schemas = m.get("schemas") or {}
    if m.get("clone_of") is not None:
        return None  # delegated base: schema lives in the source chain
    seqs = m.get("seqs") or {}
    groups = sorted(
        {int(seqs.get(rel, m["version"])) for rel in m.get("files", [])}
    )
    if not groups:
        groups = [int(m["version"])]
    types: dict = {}
    for s in groups:
        sch = _recorded_schema(schemas.get(str(s)))
        if sch is None:
            return None
        for f in sch.fields:
            types[f.name] = f.dataType
    return types


def read_version(spark: SparkSession, path: str, n: int | None = None) -> DataFrame:
    """Read snapshot version ``n`` (default: latest) — time travel over
    the plain-parquet chain. On a manifest chain the scan reads
    exactly the files the manifest committed — stray files from a
    crashed writer in the same directory are never picked up.

    On a chain with ROW-LEVEL DELTA commits (``delete_from_chain`` /
    ``upsert_into_chain``), the manifest additionally carries per-file
    commit sequence numbers and equality-delete key files; the
    resolved view is base-files MINUS keys deleted by any LATER
    commit (an anti-join on the key columns with the seq inequality —
    a delete never suppresses rows appended by the same or a later
    commit, the Iceberg equality-delete rule) PLUS the appended
    files. The delete frames are key-only and tiny relative to the
    base, so at scale the anti-join broadcasts."""
    if n is None:
        vs = _versions(spark, path)
        if not vs:
            raise FileNotFoundError(f"no versions under {path}")
        n = vs[-1]
    m = _read_manifest(spark, path, n)
    if m is None:
        return spark.read.parquet(f"{path}/v={n}")
    row_deletes = m.get("row_deletes") or []
    bases = _manifest_bases(m)
    clone = m.get("clone_of")

    schemas = m.get("schemas") or {}

    def _scan(rels: list[str], seq: int):
        reader = spark.read
        sch = _recorded_schema(schemas.get(str(seq)))
        if sch is not None:
            # recorded at commit time from the post-write inference
            # read — skips the per-group footer-inference job
            reader = reader.schema(sch)
        if str(seq) in bases:
            # basePath recovers hive-partition columns from the staged
            # file paths; a filter on them prunes at PLAN time
            reader = reader.option("basePath", f"{path}/{bases[str(seq)]}")
        return reader.parquet(*[f"{path}/{rel}" for rel in rels])

    if not row_deletes:
        if clone is not None:
            # shallow clone (r12): the manifest owns no files — the
            # read DELEGATES to the pinned source version (zero-copy;
            # pruning/vacuuming the source breaks the clone, the
            # documented lakehouse contract)
            return read_version(spark, clone["path"], clone["version"])
        return _scan(m["files"], m["version"])
    seqs = m.get("seqs") or {}
    by_seq: dict[int, list[str]] = {}
    for rel in m["files"]:
        by_seq.setdefault(int(seqs.get(rel, m["version"])), []).append(rel)
    data = None
    if clone is not None:
        # delta commits on top of a shallow clone: the delegated
        # source state is the seq-0 base (every delete commits at
        # seq ≥ 1, so it suppresses clone-base rows but never rows
        # appended by the same or a later commit)
        data = read_version(
            spark, clone["path"], clone["version"]
        ).withColumn("_seq", F.lit(0))
    for s in sorted(by_seq):
        part = _scan(by_seq[s], s).withColumn("_seq", F.lit(s))
        data = part if data is None else data.unionByName(part)
    key_cols = row_deletes[0]["key_cols"]
    dels = None
    for entry in row_deletes:
        reader = spark.read
        ksch = _recorded_schema(entry.get("schema"))
        if ksch is not None:
            reader = reader.schema(ksch)
        d = reader.parquet(f"{path}/{entry['path']}").select(
            *[F.col(c).alias(f"_del_{c}") for c in entry["key_cols"]]
        ).withColumn("_dseq", F.lit(int(entry["seq"])))
        dels = d if dels is None else dels.unionByName(d)
    cond = F.col("_dseq") > F.col("_seq")
    for c in key_cols:
        cond = cond & (F.col(c) == F.col(f"_del_{c}"))
    return data.join(dels, cond, "left_anti").drop("_seq")


def read_version_asof(spark: SparkSession, path: str, asof: str) -> DataFrame:
    """Timestamp time travel (r9): the newest version whose manifest
    committed at or before ``asof`` (ISO-8601, UTC) — "the table as
    the 02:00 report saw it" without knowing version numbers. Commit
    times ride in the manifest (``committed_at``, recorded inside the
    same atomic one-file commit, so a version's existence and its
    timestamp can never disagree). Manifest chains only; raises
    FileNotFoundError when every commit postdates ``asof`` (or the
    survivors were pruned — retention bounds how far back asof
    reads, exactly like any lakehouse). Each version keeps its own
    schema, same as ``read_version``."""
    from datetime import datetime, timezone

    cut = datetime.fromisoformat(asof)
    if cut.tzinfo is None:  # bare timestamps read as UTC
        cut = cut.replace(tzinfo=timezone.utc)
    best: int | None = None
    for n in _versions(spark, path):
        m = _read_manifest(spark, path, n)
        if m is None or "committed_at" not in m:
            raise ValueError(
                f"{path} v={n} has no committed_at (non-manifest chain "
                "or pre-r9 commit); asof reads need manifest commits"
            )
        if datetime.fromisoformat(m["committed_at"]) <= cut:
            best = n
    if best is None:
        raise FileNotFoundError(
            f"no version of {path} committed at or before {asof}"
        )
    return read_version(spark, path, best)


def _delta_commit(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    keys_df: DataFrame | None = None,
    source_df: DataFrame | None = None,
    meta: dict | None = None,
) -> int:
    """Shared engine of ``delete_from_chain`` / ``upsert_into_chain``:
    commit a new version that REUSES every prior data file byte-for-
    byte and adds only an equality-delete key file (plus, for upsert,
    the appended source rows). See the public wrappers for semantics.
    ``meta`` (r13) overrides the committed writer metadata for this
    version — the streaming jobs' exactly-once markers need to ride
    O(delta) commits; None keeps the prior version's meta carrying
    forward unchanged (the pre-r13 behavior)."""
    import uuid

    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(hpath(f"{path}/_manifests")):
        raise ValueError(
            f"{path} is not a manifest chain — row-level delta commits "
            "need atomic one-file manifests (write_versioned(..., "
            "manifest=True) from v=0)"
        )
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = (keys_df if keys_df is not None else source_df.select(*key_cols))
    keys = keys.select(*key_cols).dropDuplicates()
    token = uuid.uuid4().hex[:12]
    # version-independent stages land ONCE; only the change feed
    # (which depends on the actual predecessor) re-stages per attempt.
    # On a hive-partitioned chain the appended rows stage in the SAME
    # layout (partitionBy) so the per-seq basePath read restores the
    # partition columns for every file group uniformly.
    head = _versions(spark, path)
    pb0 = None
    if head:
        m0 = _read_manifest(spark, path, head[-1])
        pb0 = (m0 or {}).get("partition_by")
    keys_rel = f"_staging/{token}/rowdel"
    data_rel = f"_staging/{token}/data" if source_df is not None else None

    # the keys and data stagings land under distinct paths with no
    # dependency — write both (and their footer read-backs) from
    # driver threads (guide §2.6). The read-back inference results are
    # captured into the manifest (_recorded_schema) and reused below
    # for constraint checks and the change feed, so every later
    # read_version of this commit skips its inference jobs entirely.
    def _stage_keys():
        keys.write.mode("errorifexists").parquet(f"{path}/{keys_rel}")
        return spark.read.parquet(f"{path}/{keys_rel}")

    def _stage_data():
        if data_rel is None:
            return None
        w = source_df.write.mode("errorifexists")
        if pb0:
            w = w.partitionBy(*pb0)
        w.parquet(f"{path}/{data_rel}")
        return spark.read.parquet(f"{path}/{data_rel}")

    from portfolio1_etl_spark.parallelism import overlap_jobs

    keys_read, appended = overlap_jobs(_stage_keys, _stage_data)
    for _ in range(_COMMIT_RETRIES):
        vs = _versions(spark, path)
        if not vs:
            raise FileNotFoundError(
                f"no versions under {path} — a delta commit needs a base "
                "snapshot (write_versioned first)"
            )
        latest = vs[-1]
        m = _read_manifest(spark, path, latest)
        if m is None:
            raise ValueError(f"{path} v={latest} has no manifest")
        new = latest + 1
        prior = read_version(spark, path, latest)
        missing = [c for c in key_cols if c not in prior.columns]
        if missing:
            raise ValueError(f"key columns {missing} not in {path} schema")
        promotions = None
        if source_df is not None:
            if sorted(source_df.columns) != sorted(prior.columns):
                raise ValueError(
                    "upsert source schema must match the chain "
                    f"({sorted(source_df.columns)} vs "
                    f"{sorted(prior.columns)}); schema evolution on a "
                    "delta chain is an explicit full-snapshot write"
                )
            # names alone are not enough: a same-named column of a
            # different TYPE would commit mixed-type parquet into the
            # chain and corrupt (or silently coerce) every later
            # read_version at the cross-seq unionByName. Refuse at
            # write time — except the sanctioned value-preserving
            # widenings, recorded like write_versioned records them.
            prior_types = {f.name: f.dataType for f in prior.schema.fields}
            promotions = {}
            for f in source_df.schema.fields:
                old_t = prior_types[f.name]
                if f.dataType == old_t:
                    continue
                w = _widened(f.dataType, old_t)
                if w is None or w != f.dataType:
                    raise ValueError(
                        f"upsert column {f.name!r} would change "
                        f"{old_t.simpleString()} -> "
                        f"{f.dataType.simpleString()}: not a type-"
                        "widening promotion; a delta chain refuses "
                        "narrowing/reinterpretation at commit time"
                    )
                promotions[f.name] = {
                    "from": old_t.simpleString(),
                    "to": f.dataType.simpleString(),
                }
            promotions = promotions or None
        if (m.get("partition_by") or None) != (pb0 or None):
            raise ConcurrentCommitError(
                f"chain layout changed mid-stage ({pb0} -> "
                f"{m.get('partition_by')}); restage the delta commit"
            )
        inherited_deletes = m.get("row_deletes") or []
        for entry in inherited_deletes:
            if entry["key_cols"] != list(key_cols):
                raise ValueError(
                    f"chain already carries deletes keyed on "
                    f"{entry['key_cols']}; one chain, one key set"
                )
        constraints = m.get("constraints")
        if appended is not None and constraints:
            _enforce_constraints(appended, constraints, "upsert source")
        captures = bool(m["changes"])
        changes_rel = None
        if captures:
            changes_rel = f"_staging/{token}/changes-{new}"
            old_matched = prior.join(F.broadcast(keys), key_cols, "semi")
            if appended is not None:
                feed = _step_changes(appended, old_matched)
            else:
                feed = old_matched.withColumn("_change", F.lit("delete"))
            feed.write.mode("errorifexists").parquet(f"{path}/{changes_rel}")
        seqs = {
            rel: int((m.get("seqs") or {}).get(rel, m["version"]))
            for rel in m["files"]
        }
        files = list(m["files"])
        bases = _manifest_bases(m)
        schemas = dict(m.get("schemas") or {})
        if data_rel is not None:
            new_files = _list_rel_parquet(spark, path, data_rel)
            files += new_files
            seqs.update({rel: new for rel in new_files})
            bases[str(new)] = data_rel
            schemas[str(new)] = appended.schema.jsonValue()
        kschema = keys_read.schema.jsonValue()
        row_deletes = inherited_deletes + [
            {
                "path": rel,
                "seq": new,
                "key_cols": list(key_cols),
                "schema": kschema,
            }
            for rel in _list_rel_parquet(spark, path, keys_rel)
        ]
        try:
            _commit_manifest(
                spark,
                path,
                new,
                meta if meta is not None else (m.get("meta") or None),
                files=files,
                changes=(
                    _list_rel_parquet(spark, path, changes_rel)
                    if changes_rel
                    else []
                ),
                partition_by=m.get("partition_by"),
                seqs=seqs,
                row_deletes=row_deletes,
                bases=bases or None,
                type_promotions=promotions,
                clone_of=m.get("clone_of"),
                constraints=constraints,
                schemas=schemas or None,
            )
            return new
        except ConcurrentCommitError:
            if changes_rel and not fs.delete(
                hpath(f"{path}/{changes_rel}"), True
            ):
                raise IOError(f"could not clean stale staging {changes_rel}")
    if not fs.delete(hpath(f"{path}/_staging/{token}"), True):
        pass  # best-effort abandon; vacuum_chain sweeps orphans
    raise ConcurrentCommitError(
        f"gave up committing delta to {path} after {_COMMIT_RETRIES} "
        "lost races — back off and retry"
    )


def delete_from_chain(
    spark: SparkSession, path: str, keys_df: DataFrame, key_cols: list[str]
) -> int:
    """Row-level DELETE on a manifest chain WITHOUT rewriting the
    snapshot: the commit reuses every prior data file untouched
    (byte-identical — pytest-pinned) and adds one tiny parquet of the
    deleted KEYS (an equality-delete vector, Iceberg-style). Readers
    resolve the view by anti-joining the keys against strictly-older
    files at plan time; ``compact_versioned`` later materializes the
    resolved view and drops the vectors (lazy compaction).

    This is what a 100 TB table needs to forget 0.1% of its rows —
    the r9 verdict's top storage gap: a full-snapshot MERGE rewrite
    (the reference's read-modify-write inventory shape,
    portfolio-etl.py:634-648) would re-write the untouched 99.9%.

    Keys must be non-null (NULL never equals anything in the
    anti-join). If the chain captures changes, the feed records the
    full deleted rows (one broadcast-semi-join read of the base,
    paid only at capture time). Returns the new version."""
    return _delta_commit(spark, path, key_cols, keys_df=keys_df)


def upsert_into_chain(
    spark: SparkSession,
    path: str,
    source_df: DataFrame,
    key_cols: list[str],
    meta: dict | None = None,
) -> int:
    """MERGE (upsert) into a manifest chain as a DELTA commit: every
    base row whose key appears in ``source_df`` is suppressed by an
    equality-delete vector, and all source rows append as new data
    files — matched keys become updates, unmatched keys inserts, and
    the untouched bulk's files are reused byte-for-byte. Combined
    with ``delete_from_chain`` this is the full WHEN MATCHED UPDATE /
    NOT MATCHED INSERT / MATCHED DELETE matrix (q192's query shape)
    as a transactional write that scales as O(delta), not O(table).

    A no-op upsert (source row identical to the base row) nets to
    zero in the captured change feed (the feed diffs source against
    the matched base rows with the same exceptAll semantics as
    snapshot diffing). Duplicate keys IN the source replace the base
    rows with every source occurrence (multiset semantics, same as a
    snapshot write of the merged frame). Returns the new version."""
    return _delta_commit(spark, path, key_cols, source_df=source_df, meta=meta)


def prune_versions(spark: SparkSession, path: str, keep: int = 3) -> list[int]:
    """Drop all but the newest ``keep`` versions; returns the pruned
    version numbers. Never prunes the latest even if keep == 0.
    Deletes go through the same Hadoop FileSystem as the listing, so
    retention is actually enforced on remote stores (a local
    ``shutil.rmtree`` against ``s3a://…`` would silently no-op).
    On a manifest chain the MANIFEST deletes first — the un-commit —
    so a crash mid-prune leaves unreferenced data files (invisible,
    harmless), never a referenced version with missing data.

    Delta commits (``upsert_into_chain``/``delete_from_chain``) make
    file lifetime OUTLIVE the committing version — a v=0 data file is
    referenced by every later delta manifest — so storage deletion is
    decided by REFERENCEDNESS ACROSS THE SURVIVORS, never by which
    version first wrote a file."""
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    vs = _versions(spark, path)
    doomed = vs[: -max(keep, 1)]
    survivors = vs[-max(keep, 1):]

    def _rels(man: dict) -> list[str]:
        return (
            man["files"]
            + man["changes"]
            + [e["path"] for e in man.get("row_deletes") or []]
        )

    kept_tokens: set[str] = set()
    for n in survivors:
        man = _read_manifest(spark, path, n)
        if man is not None:
            kept_tokens |= {
                rel.split("/", 2)[1]
                for rel in _rels(man)
                if rel.startswith("_staging/")
            }
    for n in doomed:
        m = _read_manifest(spark, path, n)
        mf = hpath(f"{path}/_manifests/v={n}.json")
        if fs.exists(mf) and not fs.delete(mf, False):
            raise IOError(f"could not un-commit manifest v={n} under {path}")
        if m is not None:
            # staged layout (r9): the manifest's file lists are the
            # source of truth. A writer's _staging/{token} dir holds
            # exactly this commit's data + feed (one writer, one
            # commit), so the whole token dir goes — unless a
            # SURVIVING delta manifest still references it. Legacy
            # (pre-staging) manifest rels all live under the v=N /
            # _changes/v=N dirs the loop below deletes anyway.
            tokens = {
                rel.split("/", 2)[1]
                for rel in _rels(m)
                if rel.startswith("_staging/")
            }
            for tok in sorted(tokens - kept_tokens):
                p = hpath(f"{path}/_staging/{tok}")
                if fs.exists(p):
                    fs.delete(p, True)
        for sub in (f"v={n}", f"_changes/v={n}"):
            p = hpath(f"{path}/{sub}")
            if fs.exists(p):
                fs.delete(p, True)
    return doomed




def compact_versioned(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Transactional small-file compaction for the versioned chain:
    rewrite the LATEST committed version into ceil(bytes/target) files
    as a NEW version, committed exactly like any other write — on a
    manifest chain that means no directory rename at all (the gap
    ``compact_parquet``'s swap protocol documents on object stores):
    readers resolve the old version until the one-file manifest
    commit lands, and a crash at any point leaves only invisible
    uncommitted files. If the chain captures changes, the compacted
    version commits an EMPTY change feed — a layout rewrite is not a
    data change, and downstream CDC consumers see zero rows for it.
    The prior version's manifest ``meta`` carries FORWARD into the
    compacted version (a layout rewrite does not advance writer
    bookkeeping — dropping it would reset e.g. the streaming epoch
    marker and break the durable exactly-once guard).
    Returns the new version number."""
    import uuid

    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    manifest = fs.exists(hpath(f"{path}/_manifests"))
    for _ in range(_COMMIT_RETRIES if manifest else 1):
        vs = _versions(spark, path)
        if not vs:
            raise FileNotFoundError(f"no versions under {path}")
        latest = vs[-1]
        m = _read_manifest(spark, path, latest) if manifest else None
        captures = (
            bool(m["changes"])
            if m is not None
            else fs.exists(hpath(f"{path}/_changes/v={latest}"))
        )
        prior_meta = m.get("meta", {}) if m is not None else None
        new = latest + 1
        if manifest:
            token = uuid.uuid4().hex[:12]
            data_rel = f"_staging/{token}/data"
            changes_rel = f"_staging/{token}/changes-{new}"
        else:
            data_rel = f"v={new}"
            changes_rel = f"_changes/v={new}"
        if m is not None:
            pb = m.get("partition_by")
        else:
            # non-manifest chains record no layout metadata — recover
            # the hive partition columns from the directory structure
            # itself, else compaction silently flattens the layout
            pb = _hive_partition_cols(spark, f"{path}/v={latest}")
        src = read_version(spark, path, latest)
        if pb:
            # preserve the hive layout: cluster rows by partition key
            # so each partition compacts to ~one file (the n_files
            # size math is meaningless per-partition and skipped)
            (
                src.repartition(*[F.col(c) for c in pb])
                .write.mode("errorifexists")
                .partitionBy(*pb)
                .parquet(f"{path}/{data_rel}")
            )
        else:
            rels = (
                m["files"]
                if m is not None
                else _list_rel_parquet(spark, path, f"v={latest}")
            )
            size = 0
            for rel in rels:
                size += fs.getFileStatus(hpath(f"{path}/{rel}")).getLen()
            n_files = max(1, -(-size // target_file_bytes))
            (
                src.repartition(n_files)
                .write.mode("errorifexists")
                .parquet(f"{path}/{data_rel}")
            )
        if captures:
            empty = (
                spark.read.parquet(f"{path}/{data_rel}")
                .limit(0)
                .withColumn("_change", F.lit("insert"))
            )
            empty.write.mode("errorifexists").parquet(f"{path}/{changes_rel}")
        if not manifest:
            return new
        try:
            _commit_manifest(
                spark,
                path,
                new,
                prior_meta,
                files=_list_rel_parquet(spark, path, data_rel),
                changes=(
                    _list_rel_parquet(spark, path, changes_rel)
                    if captures
                    else []
                ),
                base=data_rel,
                partition_by=pb,
                # a layout rewrite materializes a clone (clone_of is
                # deliberately NOT carried) but keeps the rules
                constraints=m.get("constraints") if m else None,
            )
            return new
        except ConcurrentCommitError:
            # a concurrent WRITE advanced the chain: this compaction's
            # input is stale — abandon the staged output and redo the
            # whole rewrite from the new latest
            fs.delete(hpath(f"{path}/_staging/{token}"), True)
    raise ConcurrentCommitError(
        f"compaction of {path} lost {_COMMIT_RETRIES} commit races — "
        "the chain is advancing faster than it can be compacted"
    )


def read_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data feed between two snapshots of a versioned chain
    (r7): what a downstream consumer replays instead of re-reading
    the full table every run — the incremental complement to
    ``write_versioned``'s time travel.

    Row-level semantics (multiset, exact):
    - without ``key_cols``: rows in `to` but not `from` surface as
      ``insert``, rows in `from` but not `to` as ``delete`` —
      computed with ``exceptAll`` so duplicate rows diff by COUNT,
      not by set membership (a quantity going 2→3 yields one insert).
    - with ``key_cols``: the insert/delete pairs that share a key are
      reclassified ``update_postimage`` / ``update_preimage`` (the
      Delta CDF vocabulary), keyed rows appearing/disappearing stay
      insert/delete. Keys are matched positionally per count so
      multiset semantics survive keyed reclassification too.

    Scale shape (r8): when the chain was written with
    ``capture_changes=True``, every step's feed is already persisted
    under ``_changes/v=N/`` and this read only SCANS DELTA FILES —
    the net feed over a span folds the per-step feeds with one
    exceptAll over changed rows only (multiset math: the span diff is
    the positive/negative part of Σinserts − Σdeletes), so the
    unchanged 100 TB bulk is never touched. Steps whose delta is
    missing (pre-capture chains, or a crash between the snapshot and
    delta commits) self-heal by snapshot diff — for that step alone
    when the rest of the span is captured, or as one endpoint-pair
    diff when nothing is (the r7 read-path shape: two snapshot scans
    + one exceptAll hash each, then broadcast-size joins on the
    changed rows only)."""
    if to_version is None:
        vs = _versions(spark, path)
        if not vs:
            raise FileNotFoundError(f"no versions under {path}")
        to_version = vs[-1]
    lo, hi = sorted((from_version, to_version))
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    # a delta counts as captured when its manifest lists change files
    # (staged layout, r9 — the manifest is the source of truth), or —
    # legacy/non-manifest chains — when its _SUCCESS marker landed:
    # a writer can die mid-delta-write, and trusting directory
    # existence would read the truncated feed forever
    feeds: dict[int, list[str] | str] = {}
    for v in range(lo + 1, hi + 1):
        m = _read_manifest(spark, path, v)
        if m is not None:
            if m["changes"]:
                feeds[v] = [f"{path}/{rel}" for rel in m["changes"]]
        elif fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{path}/_changes/v={v}/_SUCCESS")
        ):
            feeds[v] = f"{path}/_changes/v={v}"
    if lo < hi and feeds:
        steps = []
        for v in range(lo + 1, hi + 1):
            src = feeds.get(v)
            if isinstance(src, list):
                steps.append(spark.read.parquet(*src))
            elif src is not None:
                steps.append(spark.read.parquet(src))
            else:  # self-heal the one missing step by snapshot diff
                steps.append(
                    _step_changes(
                        read_version(spark, path, v),
                        read_version(spark, path, v - 1),
                    )
                )
        # allowMissingColumns: a span crossing an (additive) schema
        # evolution folds in the union of columns, pre-evolution rows
        # carrying NULLs — the same alignment _step_changes applies
        allf = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), steps
        )
        ins_rows = allf.filter(F.col("_change") == "insert").drop("_change")
        del_rows = allf.filter(F.col("_change") == "delete").drop("_change")
        net = _signed_diff(ins_rows, del_rows)
    else:
        net = _signed_diff(
            read_version(spark, path, hi), read_version(spark, path, lo)
        )
    if from_version > to_version:  # reverse span inverts the feed
        net = net.withColumn("_d", -F.col("_d"))
    return _classified_feed(_replicated(net, True), _replicated(net, False), key_cols)


def change_feed(
    from_df: DataFrame, to_df: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """The CDC feed between two arbitrary frames — ``read_changes``'s
    classification semantics (multiset insert/delete via exceptAll;
    with ``key_cols`` the Delta-CDF update pre/post reclassification
    with positional count-matching) without the versioned-chain
    storage: what a pipeline uses to diff any two computed states
    (yesterday's inventory vs today's — the read-modify-write cycle
    at portfolio-etl.py:634-650 published as deltas instead of a full
    overwrite). On-scoreboard as q151 (plans/warehouse_ops), where the
    DuckDB oracle replays EXCEPT ALL both ways + the keyed
    reclassification CTE."""
    net = _signed_diff(to_df, from_df)
    return _classified_feed(_replicated(net, True), _replicated(net, False), key_cols)


def _classified_feed(
    fwd_ins: DataFrame, fwd_del: DataFrame, key_cols: list[str] | None
) -> DataFrame:
    """Label the forward diff (rows only in `to` / only in `from`)
    with ``_change``, reclassifying keyed pairs into update pre/post
    images when ``key_cols`` is given."""
    from pyspark.sql.window import Window

    inserts = fwd_ins.withColumn("_change", F.lit("insert"))
    deletes = fwd_del.withColumn("_change", F.lit("delete"))
    row_cols = [c for c in inserts.columns if c != "_change"]
    if not key_cols:
        return inserts.unionByName(deletes)
    # materialize the diffs once: the keyed path references each side
    # three times (pairing, semi, anti) and would otherwise re-run the
    # full-snapshot exceptAll per reference
    from portfolio1_etl_spark.operators.checkpointing import materialize

    inserts = materialize(inserts)
    deletes = materialize(deletes)
    # positional count-matching per key (Delta-CDF semantics): the
    # k-th insert of a key pairs with its k-th delete — so 2 inserts
    # vs 1 delete for a key yield ONE balanced update pair plus one
    # plain insert, never an unpaired postimage
    val_cols = [c for c in row_cols if c not in key_cols]
    if not val_cols:
        # the key IS the whole row: an insert/delete sharing a key
        # would be identical rows, which exceptAll already cancelled —
        # no update pairs can exist, and the reclassification window
        # would have an empty ORDER BY (analysis error). Plain feed.
        return inserts.unionByName(deletes)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc_nulls_first() for c in val_cols]
    )
    ins_rn = inserts.withColumn("_rn", F.row_number().over(w))
    del_rn = deletes.withColumn("_rn", F.row_number().over(w))
    pair_on = [*key_cols, "_rn"]
    post = (
        ins_rn.join(del_rn.select(*pair_on), pair_on, "left_semi")
        .withColumn("_change", F.lit("update_postimage"))
        .drop("_rn")
    )
    pre = (
        del_rn.join(ins_rn.select(*pair_on), pair_on, "left_semi")
        .withColumn("_change", F.lit("update_preimage"))
        .drop("_rn")
    )
    pure_ins = ins_rn.join(del_rn.select(*pair_on), pair_on, "left_anti").drop("_rn")
    pure_del = del_rn.join(ins_rn.select(*pair_on), pair_on, "left_anti").drop("_rn")
    return pure_ins.unionByName(pure_del).unionByName(post).unionByName(pre)


def vacuum_chain(spark: SparkSession, path: str) -> list[str]:
    """Garbage-collect a MANIFEST chain's unreferenced storage:
    ``v=N`` / ``_changes/v=N`` directories with no committed manifest.
    Two ways these arise — a writer crash before the manifest commit
    at the HEAD (normally swept when the next write reuses N, but the
    chain may simply never be written again), and a ``prune_versions``
    crash between the manifest delete and the data delete (that N is
    below the head, so number-reuse sweeping never reaches it — a
    permanent leak without this op). Readers never see these files
    (that is the manifest invariant), so vacuum is pure space
    reclamation — but it MUST only run while no writer is active:
    an in-flight writer's ``_staging/{token}`` directory is
    unreferenced by definition until its commit lands (the same
    referenced-set-vs-live-writer contract as any lakehouse VACUUM,
    resolved by scheduling, not by the storage layer).
    Returns the deleted subpaths. Raises on non-manifest chains —
    directory existence IS the commit there, so nothing is garbage.

    r9: also sweeps unreferenced ``_staging/{token}`` directories (the
    debris of crashed or commit-race-losing writers under the staged
    CAS layout), orphan ``.{name}.{uuid}.tmp`` commit-stage files
    under ``_manifests/`` (a writer that died between staging and
    rename), and legacy ``v=N`` directories whose number was later
    committed THROUGH STAGING (the pre-r9 crash leftover the old
    number-reuse sweep handled) — referencedness, not version-number
    membership, decides what survives."""
    import re

    fs, jpath = _hadoop_fs(spark, path)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(hpath(f"{path}/_manifests")):
        raise ValueError(f"{path} is not a manifest chain")
    committed = set(_versions(spark, path))
    # every directory prefix a committed manifest actually references
    referenced_prefixes: set[str] = set()
    for n in committed:
        man = _read_manifest(spark, path, n)
        if man is None:
            continue
        delete_rels = [e["path"] for e in man.get("row_deletes") or []]
        for rel in man["files"] + man["changes"] + delete_rels:
            if rel.startswith("_staging/"):
                referenced_prefixes.add("/".join(rel.split("/", 2)[:2]))
            elif rel.startswith("_changes/"):
                referenced_prefixes.add("/".join(rel.split("/", 3)[:2]))
            else:
                referenced_prefixes.add(rel.split("/", 1)[0])
    deleted: list[str] = []
    for sub, pat in (("", r"v=(\d+)"), ("_changes/", r"v=(\d+)")):
        d = hpath(f"{path}/{sub}") if sub else jpath
        if not fs.exists(d):
            continue
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            m = re.fullmatch(pat, name)
            if (
                m
                and st.isDirectory()
                and f"{sub}{name}" not in referenced_prefixes
            ):
                fs.delete(st.getPath(), True)
                deleted.append(f"{sub}{name}")
    mdir = hpath(f"{path}/_manifests")
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if st.isFile() and name.startswith(".") and name.endswith(".tmp"):
            fs.delete(st.getPath(), False)
            deleted.append(f"_manifests/{name}")
    sdir = hpath(f"{path}/_staging")
    if fs.exists(sdir):
        referenced = {
            p.split("/", 1)[1]
            for p in referenced_prefixes
            if p.startswith("_staging/")
        }
        for st in fs.listStatus(sdir):
            token = st.getPath().getName()
            if token not in referenced:
                if not fs.delete(st.getPath(), True):
                    raise IOError(f"could not vacuum staging dir {token}")
                deleted.append(f"_staging/{token}")
    return sorted(deleted)


def clone_chain(
    spark: SparkSession, src: str, dst: str, n: int | None = None
) -> int:
    """SHALLOW CLONE (r12): start a new manifest chain at ``dst``
    whose v=0 is a ZERO-COPY reference to version ``n`` (default:
    latest) of the manifest chain at ``src`` — the lakehouse
    branch-for-experiments primitive (Delta ``CREATE TABLE ... SHALLOW
    CLONE``): a 100 TB table forks in one small-file write, and every
    subsequent write to the clone (snapshots, row-level deletes,
    upserts, compaction) is isolated from the source.

    Mechanics: the clone's v=0 manifest owns NO data files — it
    carries ``clone_of = {path, version}`` and readers DELEGATE
    (``read_version``). Delta commits on top of the clone treat the
    delegated state as the seq-0 base, so equality-deletes suppress
    source rows without touching source storage; a full snapshot
    write or ``compact_versioned`` materializes the clone and drops
    the delegation. ``prune_versions`` / ``vacuum_chain`` on the
    clone only ever see the clone's own staging — they CANNOT reclaim
    source files. The flip side of zero-copy is the standard
    lakehouse contract: pruning/vacuuming the SOURCE below the pinned
    version breaks the clone (pass a stable absolute path/URI).

    Constraints active on the source version carry into the clone
    (it starts with the same rules; ``drop_chain_constraint`` on the
    clone never touches the source). Returns the clone's version (0).
    """
    fs, _ = _hadoop_fs(spark, src)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    # qualify src BEFORE pinning it in clone_of: a relative path would
    # commit verbatim and the clone's delegated reads would silently
    # resolve against whatever working directory the READER runs from
    src = fs.makeQualified(hpath(src)).toString()
    if not fs.exists(hpath(f"{src}/_manifests")):
        raise ValueError(
            f"{src} is not a manifest chain — shallow clones pin a "
            "manifest version (directory chains have no atomic state "
            "to reference)"
        )
    vs = _versions(spark, src)
    if not vs:
        raise FileNotFoundError(f"no versions under {src}")
    if n is None:
        n = vs[-1]
    if n not in vs:
        raise FileNotFoundError(f"no version {n} under {src}")
    dfs, _ = _hadoop_fs(spark, dst)
    if dfs.exists(hpath(f"{dst}/_manifests")) or _dir_versions(spark, dst):
        raise ValueError(f"{dst} already holds a chain; clone into a "
                         "fresh path")
    src_m = _read_manifest(spark, src, n) or {}
    _commit_manifest(
        spark,
        dst,
        0,
        {"cloned_at_src_version": n},
        files=[],
        changes=[],
        clone_of={"path": src, "version": n},
        constraints=src_m.get("constraints"),
    )
    return 0


def chain_constraints(spark: SparkSession, path: str) -> dict:
    """The constraint block active at the chain head:
    ``{"not_null": [col, ...], "check": {name: sql_expr, ...}}``
    (empty dict when none)."""
    vs = _versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no versions under {path}")
    m = _read_manifest(spark, path, vs[-1])
    if m is None:
        raise ValueError(f"{path} is not a manifest chain")
    return m.get("constraints") or {}


def _metadata_commit(spark: SparkSession, path: str, mutate) -> int:
    """Shared CAS loop of the metadata-only operations (add/drop
    constraint, ANALYZE): a commit that reuses every prior data file
    byte-for-byte (same files/seqs/deletes/clone marker; explicitly
    empty change feed on capture chains — a metadata change is not a
    data change) and rewrites only the blocks ``mutate(head_manifest)
    -> {"constraints": ..., "stats": ...}`` returns. Blocks the mutate
    does not mention CARRY FORWARD (the files are identical, so e.g.
    stats stay valid through a constraints commit); data commits drop
    ``stats`` naturally because they never pass the kwarg."""
    fs, _ = _hadoop_fs(spark, path)
    if not fs.exists(
        spark.sparkContext._jvm.org.apache.hadoop.fs.Path(
            f"{path}/_manifests"
        )
    ):
        raise ValueError(
            f"{path} is not a manifest chain — metadata commits go "
            "through atomic one-file manifests"
        )
    import uuid

    for _ in range(_COMMIT_RETRIES):
        vs = _versions(spark, path)
        if not vs:
            raise FileNotFoundError(f"no versions under {path}")
        m = _read_manifest(spark, path, vs[-1])
        if m is None:
            raise ValueError(f"{path} v={vs[-1]} has no manifest")
        extras = {
            "constraints": m.get("constraints"),
            "stats": m.get("stats"),
        }
        extras.update(mutate(m))
        changes_rel = None
        if m["changes"]:
            # capture chains get an explicitly EMPTY feed (a rule
            # change is not a data change) — otherwise read_changes
            # would self-heal this step with two full snapshot scans
            changes_rel = f"_staging/{uuid.uuid4().hex[:12]}/changes"
            (
                read_version(spark, path, vs[-1])
                .limit(0)
                .withColumn("_change", F.lit("insert"))
                .write.mode("errorifexists")
                .parquet(f"{path}/{changes_rel}")
            )
        try:
            _commit_manifest(
                spark,
                path,
                vs[-1] + 1,
                m.get("meta") or None,
                files=list(m["files"]),
                changes=(
                    _list_rel_parquet(spark, path, changes_rel)
                    if changes_rel
                    else []
                ),
                # base/bases carry in their ORIGINAL form: a single
                # 'base' remaps to the new version number inside
                # _manifest_bases, while a seq-keyed 'bases' dict stays
                # keyed by the carried seqs — both keep partition
                # columns recoverable through basePath
                base=m.get("base"),
                partition_by=m.get("partition_by"),
                seqs=m.get("seqs"),
                row_deletes=m.get("row_deletes"),
                bases=m.get("bases"),
                clone_of=m.get("clone_of"),
                schemas=m.get("schemas"),
                **extras,
            )
            return vs[-1] + 1
        except ConcurrentCommitError:
            # drop the staged empty feed before re-deriving against the
            # advanced head — matching write_versioned/_delta_commit;
            # abandoning it leaked orphan _staging dirs until vacuum
            if changes_rel and not fs.delete(
                spark.sparkContext._jvm.org.apache.hadoop.fs.Path(
                    f"{path}/{changes_rel}"
                ),
                True,
            ):
                raise IOError(
                    f"could not clean stale staging {changes_rel}"
                )
            continue  # re-read the advanced head and re-derive
    raise ConcurrentCommitError(
        f"gave up committing constraints to {path} after "
        f"{_COMMIT_RETRIES} lost races"
    )


def add_chain_constraint(
    spark: SparkSession,
    path: str,
    name: str | None = None,
    check: str | None = None,
    not_null: list[str] | None = None,
) -> int:
    """Add write-time constraints to a manifest chain (Delta's ALTER
    TABLE ADD CONSTRAINT): ``check`` is a SQL boolean expression
    enforced on every future snapshot write and upsert (ANSI
    semantics — only FALSE violates, NULL passes); ``not_null`` lists
    columns that must be non-null. EXISTING rows validate first —
    a constraint the current head already violates refuses loudly
    (one scan of the head, before anything commits), so a green
    ADD CONSTRAINT certifies the whole table, not just future writes.

    Commits a new metadata-only version (empty CDC feed, all data
    files reused); enforcement happens inside every later commit's
    CAS attempt, so a constraint added under a concurrent writer's
    feet still gates that writer's commit. Returns the new version."""
    if check is None and not not_null:
        raise ValueError("nothing to add: pass check= and/or not_null=")
    if check is not None and not name:
        raise ValueError("a check constraint needs a name")
    add_block = {
        "not_null": list(not_null or []),
        "check": {name: check} if check is not None else {},
    }
    # validate existing rows BEFORE the CAS loop (one scan; the loop
    # itself is metadata-only). A racing write that lands between this
    # scan and the commit was itself validated against the OLD rules —
    # the standard ADD CONSTRAINT race every lakehouse documents.
    _enforce_constraints(
        read_version(spark, path), add_block, "existing table data"
    )

    def _mutate(m: dict) -> dict:
        cons = {
            "not_null": list((m.get("constraints") or {}).get("not_null", [])),
            "check": dict((m.get("constraints") or {}).get("check", {})),
        }
        for c in add_block["not_null"]:
            if c not in cons["not_null"]:
                cons["not_null"].append(c)
        for k, v in add_block["check"].items():
            if k in cons["check"] and cons["check"][k] != v:
                raise ValueError(
                    f"check constraint {k!r} already exists with a "
                    "different expression; drop it first"
                )
            cons["check"][k] = v
        return cons

    return _metadata_commit(spark, path, lambda m: {"constraints": _mutate(m)})


def drop_chain_constraint(
    spark: SparkSession,
    path: str,
    name: str | None = None,
    not_null: list[str] | None = None,
) -> int:
    """Drop a named check constraint and/or NOT NULL columns from the
    chain head (metadata-only commit). Unknown names refuse loudly —
    silently 'dropping' a constraint that never existed would let a
    typo pass as a policy change. Returns the new version."""
    if name is None and not not_null:
        raise ValueError("nothing to drop: pass name= and/or not_null=")

    def _mutate(m: dict) -> dict | None:
        cons = {
            "not_null": list((m.get("constraints") or {}).get("not_null", [])),
            "check": dict((m.get("constraints") or {}).get("check", {})),
        }
        if name is not None:
            if name not in cons["check"]:
                raise ValueError(f"no check constraint {name!r} on {path}")
            del cons["check"][name]
        for c in not_null or []:
            if c not in cons["not_null"]:
                raise ValueError(f"column {c!r} is not NOT NULL on {path}")
            cons["not_null"].remove(c)
        return cons if (cons["not_null"] or cons["check"]) else None

    return _metadata_commit(spark, path, lambda m: {"constraints": _mutate(m)})


def analyze_chain(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    exact_ndv: bool = False,
) -> int:
    """ANALYZE for the manifest chain (Delta/Iceberg table statistics):
    one aggregate scan of the head version computes ``n_rows`` and
    per-column {min, max, n_nulls, ndv} for ``columns`` (default:
    every atomic non-binary column), committed as a METADATA-ONLY
    version pinned to the data it describes — the stats and the file
    list live in the same atomic manifest, so a reader can never see
    stats detached from their snapshot. Data commits DROP the stats
    block (stale statistics are worse than none); ``chain_stats``
    reports which version the surviving stats describe so callers see
    staleness explicitly.

    ``ndv`` uses ``approx_count_distinct`` (HLL — the 100 TB answer;
    ±~2%) unless ``exact_ndv=True`` (deterministic, for tests and
    small dimensions). min/max are stringified for the JSON manifest;
    consumers needing typed bounds read the schema alongside.

    Consumers: ``operators.advisor.join_advice_frame`` computes the
    same (rows, ndv, width) profile by scanning — a chain with fresh
    stats feeds the advisor for free; file-skipping stays with the
    parquet footers (finer grain), table-level stats drive JOIN-SIDE
    decisions (broadcast threshold, skew suspicion). Returns the new
    version."""
    head = read_version(spark, path)
    if columns is None:
        columns = [
            f.name
            for f in head.schema.fields
            if f.dataType.typeName()
            not in ("binary", "array", "map", "struct")
        ]
    missing = [c for c in columns if c not in head.columns]
    if missing:
        raise ValueError(f"columns {missing} not in {path} schema")
    ndv = (
        (lambda c: F.countDistinct(c))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in columns:
        aggs += [
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
            # coalesce: over 0 rows F.sum returns NULL and int(None)
            # would crash ANALYZE on an empty head (min/max stay None
            # — "no values" is the honest stat there)
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"_nulls_{c}"),
            ndv(c).alias(f"_ndv_{c}"),
        ]
    row = head.agg(*aggs).collect()[0]
    cols = {
        c: {
            "min": row[f"_min_{c}"],
            "max": row[f"_max_{c}"],
            "n_nulls": int(row[f"_nulls_{c}"]),
            "ndv": int(row[f"_ndv_{c}"]),
        }
        for c in columns
    }

    def _mutate(m: dict) -> dict:
        return {
            "stats": {
                "analyzed_version": m["version"],
                "n_rows": int(row["_rows"]),
                "exact_ndv": bool(exact_ndv),
                "columns": cols,
            }
        }

    return _metadata_commit(spark, path, _mutate)


def chain_stats(
    spark: SparkSession, path: str, n: int | None = None
) -> dict | None:
    """The stats block valid at version ``n`` (default: head), or None.
    No walk-back is needed: metadata-only commits carry stats forward
    (identical files — the stats still describe the data exactly) and
    every DATA commit drops the block, so a manifest either holds
    valid stats or the table changed since the last ANALYZE. The
    block's ``analyzed_version`` records where it was computed."""
    vs = _versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no versions under {path}")
    if n is None:
        n = vs[-1]
    m = _read_manifest(spark, path, n)
    return None if m is None else m.get("stats")
