"""Geo containment: pure-Spark ray casting vs an independent python reference.

The oracle query (queries_geo) only exercises rectangles; these tests pin the
general even-odd algorithm on non-convex rings (L-shape, star) including points
inside concave notches, plus the WKT parse round trip.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from switchback_test_dag_spark.geo import (
    parse_wkt_polygon,
    st_astext_point,
    st_contains,
    st_point,
)


def ray_cast_reference(vertices: list[tuple[float, float]], px: float, py: float) -> bool:
    """Textbook even-odd point-in-polygon (independent reimplementation)."""
    inside = False
    for (x1, y1), (x2, y2) in zip(vertices, vertices[1:]):
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _wkt(vertices: list[tuple[float, float]]) -> str:
    return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in vertices) + "))"


# closed rings (first == last)
L_SHAPE = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4), (0, 0)]
STAR = [(0, 3), (2, 2), (3, 0), (4, 2), (6, 3), (4, 4), (3, 6), (2, 4), (0, 3)]

PROBES = [
    (1.0, 1.0),
    (3.0, 1.0),
    (1.0, 3.0),
    (3.0, 3.0),  # in the L's notch → outside
    (3.0, 5.0),
    (5.0, 5.0),  # between star arms → outside
    (3.0, 3.0),
    (0.5, 0.5),
    (-1.0, 2.0),
    (2.9, 0.4),
]


def test_ray_casting_matches_reference_on_nonconvex(spark):
    rows = [
        (name, _wkt(poly), float(px), float(py))
        for name, poly in (("L", L_SHAPE), ("star", STAR))
        for px, py in PROBES
    ]
    df = (
        spark.createDataFrame(rows, "poly_name string, wkt string, px double, py double")
        .withColumn("poly", parse_wkt_polygon("wkt"))
        .withColumn("pt", st_point("px", "py"))
        .withColumn("inside", st_contains("poly", "pt"))
    )
    got = {(r.poly_name, r.px, r.py): r.inside for r in df.collect()}
    polys = {"L": L_SHAPE, "star": STAR}
    for (name, px, py), inside in got.items():
        assert inside == ray_cast_reference(polys[name], px, py), (name, px, py)


def test_wkt_parse_and_point_text(spark):
    df = (
        spark.createDataFrame([("POLYGON ((0 0, 1.5 0, 1.5 2.25, 0 0))",)], "wkt string")
        .withColumn("poly", parse_wkt_polygon("wkt"))
        .select(
            F.expr("size(poly)").alias("n"),
            F.expr("poly[2].x").alias("x2"),
            F.expr("poly[2].y").alias("y2"),
        )
    )
    row = df.collect()[0]
    assert (row.n, row.x2, row.y2) == (4, 1.5, 2.25)

    pt = (
        spark.range(1)
        .select(F.lit(12.5).alias("px"), F.lit(-3.5).alias("py"))
        .withColumn("pt", st_point("px", "py"))
        .select(st_astext_point("pt").alias("wkt"))
        .collect()[0]
        .wkt
    )
    assert pt == "POINT (12.5 -3.5)"


def test_degenerate_polygons_are_outside(spark):
    df = (
        spark.createDataFrame(
            [("POLYGON (())",), ("no geometry here",)], "wkt string"
        )
        .withColumn("poly", parse_wkt_polygon("wkt"))
        .withColumn("pt", st_point(F.lit(1.0), F.lit(1.0)))
        .select(st_contains("poly", "pt").alias("inside"))
    )
    assert [r.inside for r in df.collect()] == [False, False]
