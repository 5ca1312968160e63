"""Fixture-table IO.

The driver provides deterministic parquet tables under ``/root/testdata/sf*/``
(TESTDATA.md): TPC-H-ish ``region nation customer supplier part orders lineitem``
plus ``events`` (timestamped stream), ``documents`` (text corpus) and ``embeddings``
(vector corpus). Every oracle-checked query in ``__spark_entry__.py`` reads these.

Reads are plain ``spark.read.parquet`` so Catalyst handles column pruning and filter
pushdown; at warehouse scale the same call targets partitioned parquet/iceberg paths
and partition pruning applies on date columns (SURVEY §4: keep ``created_date``
partitioning for the orders fact).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to the package-wide contract:
    a session-timezone µs ``ts`` TIMESTAMP plus an exact ``ts_ns`` long
    (ns since epoch), whatever physical type the parquet stores:

    - TIMESTAMP(NANOS) (older fixtures): Spark's reader rejects it unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set (Spark timestamps are µs);
      the exact ns survives as ``ts_ns`` and ``ts`` is floor-truncated to µs.
    - TIMESTAMP(MICROS, isAdjustedToUTC=true): native ``timestamp``;
      ``ts_ns = unix_micros(ts) * 1000``.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) (current fixtures): inferred as
      ``timestamp_ntz``. Sessions run with ``spark.sql.session.timeZone=UTC``
      (session.py), so the ntz→ltz cast maps the wall-clock to the same instant
      DuckDB's ``epoch_ns(ts)`` computes on the naive timestamp — bit-identical
      ``ts_ns`` in both engines.

    Any other ``ts`` dtype raises instead of silently skipping ``ts_ns``
    (which would surface much later as an unresolved-column error in every
    downstream query).
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt is None:
        return df
    if dt == "bigint":
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts",
            F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long")),
        )
    if dt.startswith("timestamp"):
        if dt != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    raise TypeError(
        f"events.ts has unsupported dtype {dt!r}; expected bigint (ns) or a "
        "timestamp type"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    ``events`` always exposes BOTH a µs ``ts`` timestamp and a ``ts_ns`` long
    (ns since epoch) via :func:`normalize_events_ts`. Downstream queries use
    either hour-level ``date_trunc`` (precision-insensitive) or exact ``ts_ns``
    integer math so Spark and the DuckDB oracle agree.
    """
    # session.get_spark pins this at build time; the guarded set here covers
    # externally-built sessions (the correctness driver constructs its own),
    # without re-issuing a conf write on every read
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each fixture table as a temp view so ``spark.sql`` queries can use
    the same table names the DuckDB oracle sees."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --------------------------------------------------------------------------- #
# interchange formats (CSV / JSON-lines)
# --------------------------------------------------------------------------- #
#
# Parquet stays the canonical storage format (columnar pruning + pushdown);
# CSV and JSONL are INTERCHANGE surfaces — what upstream systems hand a
# pipeline and what downstream consumers ask for. Two disciplines, both
# scale-driven:
#
# - Explicit schema ALWAYS, never inference: `inferSchema` costs one extra
#   full scan of the data at 100 TB and drifts types between runs (a column
#   of "1"s infers int today and string tomorrow when a stray value lands).
#   Readers here require a StructType, exactly like the parquet path's
#   explicit-schema policy (SURVEY §2.1 S1/F22).
# - Fail loudly: reads run FAILFAST so a malformed row aborts the job at the
#   scan instead of surfacing as silent NULLs that corrupt aggregates.
#
# CSV carries FLAT rows only (arrays/structs/maps have no CSV encoding);
# `write_csv_table` rejects nested schemas with a pointer at JSONL. The CSV
# convention pins `\N` as the NULL marker so NULL and empty-string survive a
# round trip distinctly, and quotes/escapes embedded delimiters and newlines
# (readers therefore run multiLine=true — correct first; for multi-TB CSV
# prefer many input files, or JSONL, which stays line-splittable).
#
# KNOWN CAVEAT of the `\N` convention: a string field whose value is EXACTLY
# the two characters backslash-N collides with the NULL marker — Spark's CSV
# writer emits it unquoted (it only quotes on delimiter/quote/newline), and
# the reader maps any whole unquoted field equal to nullValue back to NULL.
# Values that merely CONTAIN `\N` round-trip fine; only the exact-match whole
# field is lossy (NULL-on-read). Data where the literal string `\N` is a
# possible whole-field value must go through JSONL, which has a real null
# token and escapes backslashes. Pinned by test_io.py's
# `test_csv_backslash_n_literal_collides_with_null`.

# Spark's default CSV/JSON timestampFormat carries milliseconds only — a
# silent µs truncation that would corrupt the events ts contract on a round
# trip; pin a µs-precise format on BOTH sides of both formats
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_CSV_OPTS = {
    "header": "true",
    "nullValue": "\\N",
    "escape": '"',
    "timestampFormat": _TS_FMT,
}


def _atomic_only(df: DataFrame, caller: str) -> None:
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if bad:
        raise ValueError(
            f"{caller}: CSV cannot encode nested columns {bad}; use "
            "write_jsonl_table/read_jsonl_table for array/map/struct data"
        )


def write_csv_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a FLAT table as headered CSV (NULL as ``\\N``, embedded
    delimiters/newlines quoted). Nested columns raise — CSV has no encoding
    for them (JSONL does)."""
    _atomic_only(df, "write_csv_table")
    df.write.mode(mode).options(**_CSV_OPTS).csv(path)


def read_csv_table(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read headered CSV written by :func:`write_csv_table` (or any CSV
    following the same conventions) under an EXPLICIT schema, FAILFAST.

    ``schema`` is a StructType or DDL string — never inferred (inference is
    an extra full scan at scale and drifts types between runs). multiLine
    handles quoted embedded newlines; for bulk ingest where line-splittable
    scans matter more than embedded newlines, prefer JSONL."""
    return (
        spark.read.options(**_CSV_OPTS, mode="FAILFAST", multiLine="true")
        .schema(schema)
        .csv(path)
    )


def write_jsonl_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as JSON-lines — the interchange format for nested data
    (arrays/structs/maps encode natively) that stays line-splittable, so a
    100 TB directory still fans out across executors without multiLine
    parsing. Timestamps serialize at full µs precision."""
    df.write.mode(mode).option("timestampFormat", _TS_FMT).json(path)


def read_jsonl_table(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read JSON-lines under an EXPLICIT schema (StructType or DDL string),
    FAILFAST — same no-inference, fail-loud discipline as
    :func:`read_csv_table`."""
    return (
        spark.read.option("mode", "FAILFAST")
        .option("timestampFormat", _TS_FMT)
        .schema(schema)
        .json(path)
    )


# --------------------------------------------------------------------------- #
# atomic table materialization — the Delta/Iceberg-shaped sink boundary
# --------------------------------------------------------------------------- #
#
# The reference's warehouse gave it ACID CREATE OR REPLACE for free
# (data_extraction_queries_automated_script.sql:7,24 — every stage is a
# CREATE OR REPLACE TABLE); a bare Spark `mode("overwrite")` parquet write is
# NOT that: it deletes the old directory first, so a mid-write failure leaves
# a truncated "table" for the next reader. This section implements the
# public snapshot-pointer commit protocol those table formats use, in
# miniature:
#
#   <path>/v0000000001/        immutable version dirs (plain parquet)
#   <path>/v0000000002/
#   <path>/_CURRENT            one-line pointer file naming the live version
#
# A writer stages a FRESH version directory (never touching live files),
# verifies Spark's _SUCCESS commit marker, then flips _CURRENT via
# write-temp + fsync + os.replace — an atomic POSIX rename, so a reader
# either sees the old pointer or the new one, never a half-written table. A
# crash at ANY point before the pointer flip leaves the previous version
# live and intact (crash-sim pytest: tests/test_io.py). Old versions remain
# readable for in-flight jobs until `vacuum_versions`.
#
# Two commit protocols, chosen per write:
#
# - ``replace`` (default): the _CURRENT pointer flip above — one atomic
#   POSIX rename. The LOCAL-filesystem fast path.
# - ``marker``: S3-style object stores don't provide atomic rename, but
#   they DO provide atomic single-object create and listing; the commit is
#   the creation of ``<path>/_commits/<version>`` and the committed version
#   is the MAX listed marker — no rename anywhere in the protocol (the
#   same list-and-max scheme as Delta's numbered _delta_log entries). A
#   crash before the marker create leaves nothing committed; a crash after
#   is a completed commit.
#
# ``current_version`` resolves max(_CURRENT, markers), so the two protocols
# compose on one table (a local table migrated to marker commits keeps its
# history readable). Single-writer-per-table is assumed (the reference
# pipeline is a daily Airflow task); concurrent writers are
# last-commit-wins, and a staging-dir numbering race fails loudly on the
# errorifexists write.

_CURRENT_PTR = "_CURRENT"
_COMMITS_DIR = "_commits"
_VERSION_FMT = "v{:010d}"


def _version_dirs(path: str) -> list[int]:
    import re as _re

    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _re.fullmatch(r"v(\d{10})", name)
        if m and os.path.isdir(os.path.join(path, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _commit_pointer(path: str, version: str) -> None:
    """Atomically flip <path>/_CURRENT to name ``version``: write a temp
    pointer, fsync it, os.replace over the live pointer (atomic on POSIX),
    then best-effort fsync the directory so the rename survives power loss."""
    import uuid as _uuid

    tmp = os.path.join(path, f".{_CURRENT_PTR}.{_uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        fh.write(version)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, _CURRENT_PTR))
    try:
        dfd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # directory fsync is a durability nicety, not correctness


def _commit_marker(path: str, version: str) -> None:
    """Object-store-safe commit: create ``<path>/_commits/<version>``. The
    single-object create IS the commit — no rename required, so the same
    protocol works where os.replace has no atomic equivalent. 'x' mode
    makes a marker collision (two writers claiming one version) loud."""
    cdir = os.path.join(path, _COMMITS_DIR)
    os.makedirs(cdir, exist_ok=True)
    with open(os.path.join(cdir, version), "x") as fh:
        fh.write(version)
        fh.flush()
        os.fsync(fh.fileno())


def _marker_versions(path: str) -> list[str]:
    import re as _re

    cdir = os.path.join(path, _COMMITS_DIR)
    if not os.path.isdir(cdir):
        return []
    return sorted(n for n in os.listdir(cdir) if _re.fullmatch(r"v\d{10}", n))


def current_version(path: str) -> str | None:
    """The committed version name at ``path`` (None = nothing committed):
    the max over the ``_CURRENT`` pointer and the ``_commits`` markers, so
    tables written under either protocol — or migrated between them —
    resolve to their newest commit."""
    candidates = _marker_versions(path)
    ptr = os.path.join(path, _CURRENT_PTR)
    if os.path.exists(ptr):
        with open(ptr) as fh:
            v = fh.read().strip()
        if v:
            candidates = candidates + [v]
    return max(candidates) if candidates else None


def atomic_overwrite(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    extra_files: dict[str, str] | None = None,
    protocol: str = "replace",
) -> str:
    """CREATE-OR-REPLACE ``path`` with ``df``, atomically: stage a fresh
    immutable version directory, verify Spark's ``_SUCCESS`` marker, then
    commit — ``protocol="replace"`` flips the ``_CURRENT`` pointer (atomic
    POSIX rename, the local-FS fast path); ``protocol="marker"`` creates a
    numbered ``_commits/<version>`` file instead (atomic single-object
    create + list-and-max on read — the object-store-safe protocol, since
    S3-style stores have no atomic rename). Returns the committed version
    directory.

    ``extra_files`` maps sidecar names (must start with ``_`` so Spark's
    hidden-file filter skips them at read time) to text contents, written
    and fsynced into the staging dir BEFORE the pointer flip — so metadata
    like :func:`compact_batches`'s watermark commits atomically with the
    data it describes.

    Failure contract: a crash/kill at any point — mid-file, between files,
    even between _SUCCESS and the pointer flip — leaves the previously
    committed version live and byte-identical; the orphaned staging dir is
    swept by the next writer's numbering (max+1) and by
    :func:`vacuum_versions`. Readers via :func:`read_committed` never see a
    partial table."""
    if protocol not in ("replace", "marker"):
        raise ValueError(
            f"atomic_overwrite: unknown protocol {protocol!r}; "
            "expected 'replace' or 'marker'"
        )
    os.makedirs(path, exist_ok=True)
    versions = _version_dirs(path)
    ver = _VERSION_FMT.format((versions[-1] + 1) if versions else 1)
    vdir = os.path.join(path, ver)
    # errorifexists: a version dir is immutable once created — a collision
    # means a concurrent writer raced this one; fail loudly instead of
    # corrupting its staging
    df.write.mode("errorifexists").format(fmt).save(vdir)
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise IOError(
            f"atomic_overwrite: staging write at {vdir} carries no _SUCCESS "
            "commit marker; refusing to flip the table pointer"
        )
    for name, content in (extra_files or {}).items():
        if not name.startswith("_"):
            raise ValueError(
                f"atomic_overwrite: extra file {name!r} must start with '_' "
                "(Spark's hidden-file filter) so data readers never scan it"
            )
        with open(os.path.join(vdir, name), "w") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
    if protocol == "marker":
        _commit_marker(path, ver)
    else:
        _commit_pointer(path, ver)
    return vdir


def read_committed(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None,
    version: str | None = None,
) -> DataFrame:
    """Read the COMMITTED version of an :func:`atomic_overwrite` table —
    resolves ``_CURRENT`` once at plan time, so the returned frame keeps
    reading its snapshot even if a writer commits a newer version mid-job
    (snapshot isolation, the reader half of the protocol).

    ``version`` pins a specific past snapshot instead (time travel — the
    same capability the Delta/Iceberg pointer protocol provides, bounded
    here by what :func:`vacuum_versions` has not yet deleted). Only
    versions at or before the committed pointer are readable: anything
    newer is an uncommitted staging dir from an in-flight or failed write
    and reading it would break the atomicity contract."""
    import re as _re

    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(
            f"read_committed: no committed version at {path} (no "
            f"{_CURRENT_PTR} pointer — never written, or only failed writes)"
        )
    if version is not None and not _re.fullmatch(r"v\d{10}", version):
        # the 'newer than committed' guard below compares names
        # LEXICOGRAPHICALLY; a non-canonical name like 'v1' would fall
        # through it and surface as a misleading error — reject it up front
        raise ValueError(
            f"read_committed: malformed version name {version!r}; expected "
            f"the canonical zero-padded form {_VERSION_FMT.format(1)!r}"
        )
    ver = version or cur
    if ver > cur:
        raise ValueError(
            f"read_committed: {ver} is newer than the committed pointer "
            f"{cur} — an uncommitted staging dir, not a snapshot"
        )
    if not os.path.isdir(os.path.join(path, ver)):
        raise FileNotFoundError(
            f"read_committed: version {ver} not found at {path} "
            "(vacuumed, or never committed)"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(os.path.join(path, ver))


# --------------------------------------------------------------------------- #
# batch-dir state: the append log behind the incremental/streaming dedup
# indexes, plus its compaction
# --------------------------------------------------------------------------- #
#
# The incremental dedup twins (text/dedup.*_vs_index) and the foreachBatch
# streams (streaming/windows.stream_corpus_dedup / _near_dedup) persist their
# state as one Hive-partitioned ``batch=<id>`` parquet directory per
# micro-batch — idempotent under foreachBatch replay (per-batch overwrite),
# but unbounded: a year of 15-minute triggers is ~35k directories and
# millions of tiny files, the classic streaming-sink listing/small-file
# failure mode. Compaction folds the log into ONE snapshot committed through
# the atomic pointer protocol above, under ``<path>/_compacted`` — a name
# Spark's hidden-file filter ignores, so the snapshot never leaks into a
# naive ``spark.read.parquet(path)`` of the log itself.
#
# Reader contract (read_batch_state): committed snapshot ∪ batch dirs NEWER
# than the snapshot's watermark. The snapshot PRESERVES the ``batch``
# partition column, so (a) leftover already-folded dirs are harmless — the
# watermark filter excludes them — which makes the post-commit sweep pure
# garbage collection, and (b) the streams' replay-safety filter
# (``batch < current_batch_id``) keeps working across a compaction.
#
# Operational contract: compact while no writer is mid-batch (stream stopped
# after a clean drain, or between availableNow passes). Folding a batch dir
# whose streaming commit never landed is safe for READERS (the replay
# rewrites the dir and the watermark filter hides the folded copy from the
# replayed batch itself), but the folded copy of the failed attempt would
# remain in the snapshot's history — compact quiescent state.

_COMPACTED_DIR = "_compacted"
_WATERMARK_FILE = "_watermark"


def _batch_ids(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("batch=") and os.path.isdir(os.path.join(path, name)):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def compacted_watermark(path: str) -> int | None:
    """The highest batch id folded into ``path``'s committed compacted
    snapshot (None = never compacted). Reads the ``_watermark`` sidecar the
    compaction committed atomically with the data."""
    croot = os.path.join(path, _COMPACTED_DIR)
    cur = current_version(croot)
    if cur is None:
        return None
    with open(os.path.join(croot, cur, _WATERMARK_FILE)) as fh:
        return int(fh.read().strip())


def read_batch_state(
    spark: SparkSession,
    path: str,
    before_batch: int | None = None,
    fmt: str = "parquet",
) -> DataFrame | None:
    """Current state of a ``batch=<id>`` log at ``path``: the committed
    compacted snapshot (if any) unioned with batch dirs NEWER than its
    watermark. Returns None when nothing has been written — callers treat
    that as "no index yet".

    ``before_batch`` restricts the view to batches STRICTLY EARLIER — the
    replay-safety filter for foreachBatch writers: a replayed batch N must
    never see its own failed attempt's ``batch=N`` rows (which would make
    every replayed doc look like a duplicate of itself and silently drop
    the batch). The filter applies to the snapshot too (the ``batch``
    column is preserved through compaction), so replay stays safe even if
    a compaction folded the failed attempt.

    Scale shape: listing is O(dirs newer than the watermark) + one pointer
    read — after compaction a year of triggers reads one snapshot and a
    handful of fresh dirs, not 35k directories."""
    wm = compacted_watermark(path)
    ids = [
        i
        for i in _batch_ids(path)
        if (wm is None or i > wm) and (before_batch is None or i < before_batch)
    ]
    parts = []
    if wm is not None:
        snap = read_committed(spark, os.path.join(path, _COMPACTED_DIR), fmt=fmt)
        if before_batch is not None:
            from pyspark.sql import functions as F

            snap = snap.filter(F.col("batch") < F.lit(before_batch))
        parts.append(snap)
    if ids:
        reader = spark.read.format(fmt).option("basePath", path)
        df = reader.load([os.path.join(path, f"batch={i}") for i in ids])
        # basePath keeps the batch partition column, matching snapshot schema;
        # normalize column ORDER (partition cols land last on a Hive read,
        # but the snapshot stores batch wherever the fold put it)
        parts.append(df)
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    return parts[0].unionByName(parts[1])


def compact_batches(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    sweep: bool = True,
    vacuum_keep: int = 2,
    target_partitions: int | None = None,
    protocol: str = "replace",
) -> int | None:
    """Fold every ``batch=<id>`` dir (plus any previous compacted snapshot)
    at ``path`` into ONE atomic snapshot, so readers stop paying the
    per-trigger directory/small-file tax. Returns the new watermark (the
    highest batch id folded), or the existing one when there is nothing new
    to fold (no-op — no new version is committed).

    The fold itself goes through :func:`atomic_overwrite`: a crash at any
    point leaves the previous snapshot + untouched batch dirs live, and
    :func:`read_batch_state` keeps returning the exact same rows before,
    during, and after the commit. ``sweep`` then deletes the folded batch
    dirs (pure GC — the watermark filter already hides them) and vacuums
    snapshot versions older than the ``vacuum_keep`` newest.

    ``target_partitions`` coalesces the snapshot write (small-file control:
    a year of tiny per-trigger files becomes N healthy parquet files);
    default leaves Spark's partitioning alone. ``protocol`` passes through
    to :func:`atomic_overwrite` — ``"marker"`` commits the snapshot via the
    rename-free numbered-marker protocol for object-store state dirs."""
    state = read_batch_state(spark, path, fmt=fmt)
    ids = _batch_ids(path)
    wm = compacted_watermark(path)
    new_ids = [i for i in ids if wm is None or i > wm]
    if not new_ids:
        return wm
    new_wm = max(new_ids)
    if target_partitions is not None:
        state = state.coalesce(target_partitions)
    atomic_overwrite(
        state,
        os.path.join(path, _COMPACTED_DIR),
        fmt=fmt,
        extra_files={_WATERMARK_FILE: str(new_wm)},
        protocol=protocol,
    )
    if sweep:
        import shutil as _shutil

        for i in ids:
            if i <= new_wm:
                _shutil.rmtree(os.path.join(path, f"batch={i}"), ignore_errors=True)
        vacuum_versions(os.path.join(path, _COMPACTED_DIR), keep=vacuum_keep)
    return new_wm


def vacuum_versions(path: str, keep: int = 1) -> list[str]:
    """Delete superseded version dirs, keeping the current version plus the
    ``keep``-1 newest PREVIOUS versions (versions older than current —
    anything newer than the pointer is an orphaned staging dir from a failed
    write and is always swept, never counted against ``keep``). Returns the
    deleted dir names. Run it when no reader still holds a plan over an old
    snapshot — same operational contract as Delta's VACUUM."""
    import shutil as _shutil

    cur = current_version(path)
    names = [_VERSION_FMT.format(v) for v in _version_dirs(path)]
    survivors: set[str] = set()
    if cur is not None:
        survivors.add(cur)
        older = [n for n in names if n < cur]
        survivors.update(older[len(older) - max(keep - 1, 0):] if keep > 1 else [])
    deleted = []
    for name in names:
        if name not in survivors:
            _shutil.rmtree(os.path.join(path, name))
            deleted.append(name)
            # drop the version's commit marker too (marker protocol): a
            # stale marker would otherwise advertise a vacuumed snapshot
            try:
                os.unlink(os.path.join(path, _COMMITS_DIR, name))
            except FileNotFoundError:
                pass
    return deleted
