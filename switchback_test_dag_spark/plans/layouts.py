"""Date-partitioned fact layout — the partition-pruning strategy for the
orders fact (SURVEY §4: keep ``created_date`` partitioning at warehouse
scale; the reference's extraction scripts always carve by date).

A 100 TB orders fact read by a daily pipeline must not list or scan years of
history for a one-week query. Hive-style ``partitionBy`` on a derived month
(or day) column turns every date predicate into directory pruning at the
FILE LISTING — the plan shows it under ``PartitionFilters``, and the bytes
read track the queried window, not the table. Same mechanism the IVF cell
layout uses for ANN probes (``vectors/similarity.ivf_persist_layout``); this
module is the relational twin, pinned by
``tests/test_plans.py::test_date_partitioned_orders_prunes``.

Partition-count hygiene: month grain bounds directory counts (~120 for a
10-year fact) while day grain on the same span creates ~3 650 — choose the
grain so partitions stay ≥ file-size targets; sub-partition skewed months by
bucketed files, not deeper directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    orders: DataFrame, path: str, date_col: str = "o_orderdate"
) -> None:
    """Write the orders fact partitioned by derived ``order_month``
    (yyyy-MM). The partition column is REDUNDANT with the row-level date —
    kept so row queries never need directory-name parsing, while range
    predicates prune directories."""
    (
        orders.withColumn(
            "order_month", F.date_format(F.to_date(date_col), "yyyy-MM")
        )
        .write.mode("overwrite")
        .partitionBy("order_month")
        .parquet(path)
    )


def read_month_range(
    spark: SparkSession, path: str, start_month: str, end_month: str
) -> DataFrame:
    """Scan a month window from the partitioned layout. The BETWEEN on the
    partition column is a literal string comparison (yyyy-MM sorts
    lexicographically), so it prunes at listing time — ``PartitionFilters``
    in the plan, zero data files touched outside the window."""
    return spark.read.parquet(path).filter(
        F.col("order_month").between(start_month, end_month)
    )


def write_time_clustered(
    events: DataFrame, path: str, ts_col: str = "ts", n_files: int = 16
) -> None:
    """Range-cluster the events fact by event time: ``repartitionByRange``
    puts each time slice in its own file and the within-partition sort makes
    every parquet row group's min/max ``ts`` stats TIGHT and files pairwise
    DISJOINT in time. A time-window predicate (the switchback access pattern
    — every bucket query is a ts range) then skips whole files/row groups on
    footer stats alone, without Hive partition directories: the
    finer-grained, directory-free complement to
    :func:`write_date_partitioned`, and the same reason warehouses Z-order
    their dominant filter column. Disjointness is asserted from the written
    footers in ``tests/test_plans.py``."""
    (
        events.repartitionByRange(n_files, F.col(ts_col))
        .sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .parquet(path)
    )
