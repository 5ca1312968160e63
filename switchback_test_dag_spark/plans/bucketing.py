"""Bucketed-table layout — the shuffle-elimination strategy for repeated
big×big joins (SURVEY scale hygiene; the 100 TB complement to broadcast).

A join between two large fact tables shuffles BOTH sides on the join key every
time it runs. When the same join recurs (orders ⋈ lineitem on every pipeline
run; corpus ⋈ corpus candidates in dedup), pre-bucketing both tables by the
key amortizes that shuffle into the write: Spark's bucketed scan reports its
output partitioning to Catalyst, so the join plans WITHOUT an Exchange on
either side — the same co-location a Hive/Iceberg bucketed layout gives a
warehouse. This is a physical-layout decision (a sink property), so the API
here is a thin, explicit wrapper over ``bucketBy``; the value is the pinned
plan property (`tests/test_plans.py::test_bucketed_join_eliminates_shuffle`).

Local note: bucketed tables require the session catalog (``saveAsTable``);
files land under ``spark.sql.warehouse.dir``. Bucket counts must match across
join sides (or divide evenly with ``spark.sql.bucketing.coalesceBucketsInJoin``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    n_buckets: int,
    sort_keys: Sequence[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (optionally sort-ordered) catalog
    table. Sorting within buckets additionally removes the join's Sort nodes
    (a bucketed+sorted scan satisfies SortMergeJoin's requirement outright)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.saveAsTable(table)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan — the
    quantity bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys. With
    matching bucket specs Catalyst plans a SortMergeJoin with no Exchange on
    either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on))
