"""Geospatial queries (SURVEY §2.3 J4, §2.7 F13-F15) with DuckDB oracles.

The fixture tables carry no geometry, so zones/points are derived
deterministically from integer keys: each nation owns one 10×10 grid rectangle
(as a WKT polygon string), each customer a point placed at cell-interior
offsets (never on a boundary, so even-odd ray casting and the oracle's bbox
arithmetic agree everywhere). The Spark side exercises the general machinery —
WKT parse → grid-cell equi-join → ray-cast refine — while the oracle checks the
same answer with rectangle arithmetic DuckDB can run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from switchback_test_dag_spark.geo import (
    grid_cell,
    parse_wkt_polygon,
    st_astext_point,
    st_contains,
    st_point,
)
from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.queries import query

_CELL = 10.0


def _zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One closed-ring WKT rectangle per nation, tiling a 50×50 grid."""
    return (
        load_table(spark, sf_dir, "nation")
        .select(
            "n_name",
            (F.col("n_nationkey") % 5 * 10).cast("double").alias("x0"),
            (F.floor(F.col("n_nationkey") / 5) * 10).cast("double").alias("y0"),
        )
        .withColumn(
            "zone_wkt",
            F.expr(
                "concat('POLYGON ((', x0, ' ', y0, ', ', x0 + 10, ' ', y0, ', ',"
                " x0 + 10, ' ', y0 + 10, ', ', x0, ' ', y0 + 10, ', ',"
                " x0, ' ', y0, '))')"
            ),
        )
    )


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_acctbal",
        ((F.col("c_custkey") * 7 % 50) + F.lit(0.5)).cast("double").alias("px"),
        ((F.col("c_custkey") * 13 % 50) + F.lit(0.5)).cast("double").alias("py"),
    )


@query(
    "geo_zone_containment",
    """WITH zones AS (
         SELECT n_name, (n_nationkey % 5) * 10.0 AS x0, (n_nationkey // 5) * 10.0 AS y0
         FROM nation
       ), pts AS (
         SELECT c_acctbal, ((c_custkey * 7) % 50) + 0.5 AS px,
                ((c_custkey * 13) % 50) + 0.5 AS py
         FROM customer
       )
       SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
              round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*), 2) AS avg_acctbal
       FROM pts JOIN zones
         ON px >= x0 AND px < x0 + 10 AND py >= y0 AND py < y0 + 10
       GROUP BY n_name""",
)
def geo_zone_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/F14: customers↔zone-polygon containment join (ELT.sql:307-312,354).

    Filter-refine: both sides key on the coarse grid cell (hash equi-join, zone
    side broadcast), then exact WKT ray casting refines. The oracle reproduces
    the answer with bbox arithmetic (zones are rectangles by construction).
    """
    zones = (
        _zones(spark, sf_dir)
        .withColumn("zone_poly", parse_wkt_polygon("zone_wkt"))
        .withColumn("cell", grid_cell(F.col("x0"), F.col("y0"), _CELL))
        .select("n_name", "zone_poly", "cell")
    )
    pts = (
        _customer_points(spark, sf_dir)
        .withColumn("pt", st_point("px", "py"))
        .withColumn("cell", grid_cell(F.col("px"), F.col("py"), _CELL))
    )
    return (
        pts.join(broadcast(zones), "cell")
        .where(st_contains("zone_poly", "pt"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # money is 2-decimal: exact decimal sum makes the aggregate
            # order-independent, so the rounded mean can't flip on a boundary
            # ulp between engines (doubles sum in shuffle order otherwise)
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_acctbal"),
        )
    )


@query(
    "geo_supplier_wkt_points",
    """SELECT s_name,
              'POINT (' || CAST(((s_suppkey * 11) % 100) + 0.5 AS DECIMAL(20,1))
                        || ' '
                        || CAST(((s_suppkey * 17) % 100) + 0.5 AS DECIMAL(20,1))
                        || ')' AS loc_wkt
       FROM supplier""",
)
def geo_supplier_wkt_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/F15: ST_GEOGPOINT + ST_ASTEXT round trip — supplier locations as WKT
    text (ELT.sql:219,394)."""
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_name",
        ((F.col("s_suppkey") * 11 % 100) + F.lit(0.5)).cast("double").alias("px"),
        ((F.col("s_suppkey") * 17 % 100) + F.lit(0.5)).cast("double").alias("py"),
    )
    return supp.withColumn("pt", st_point("px", "py")).select(
        "s_name", st_astext_point("pt").alias("loc_wkt")
    )
