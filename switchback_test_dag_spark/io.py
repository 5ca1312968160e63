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

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set (Spark timestamps are µs).
    We set the conf defensively at runtime (works on externally-created sessions,
    e.g. the driver's), keep the exact value as ``ts_ns`` (long, ns since epoch)
    and expose ``ts`` truncated to µs as a proper timestamp. DuckDB-oracle queries
    use either hour-level ``date_trunc`` (ns-insensitive) or exact ``ts_ns``
    integer math so both engines see identical values.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
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
