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
