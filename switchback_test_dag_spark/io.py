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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    ``events`` always exposes BOTH a µs ``ts`` timestamp and a ``ts_ns`` long
    (ns since epoch), whichever physical type the parquet uses:

    - TIMESTAMP(NANOS) (older fixtures): Spark's reader rejects it unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set (Spark timestamps are µs);
      we keep the exact ns as ``ts_ns`` and floor-truncate ``ts`` to µs.
    - TIMESTAMP(MICROS) (current fixtures): read natively as a timestamp;
      ``ts_ns = unix_micros(ts) * 1000`` — bit-identical to DuckDB's
      ``epoch_ns(ts)`` on the same data, which is what the oracle SQL uses.

    Downstream queries use either hour-level ``date_trunc`` (precision-
    insensitive) or exact ``ts_ns`` integer math so both engines agree.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts",
                F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long")),
            )
        elif dt == "timestamp":
            df = df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
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
