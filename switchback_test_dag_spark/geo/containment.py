"""Geospatial containment without Sedona: WKT polygons + ray-casting, pure
Spark expressions.

Covers the reference's geography surface (SURVEY §2.7 F13-F15, §2.3 J4):
``ST_GEOGPOINT`` (`sql_queries/data_extraction_queries_automated_script.sql:219`),
``ST_CONTAINS`` (`:354`, the orders↔zone-polygon join filter) and ``ST_ASTEXT``
(`:394`). Geometry is carried as WKT strings / ``struct<x,y>`` columns — no
geo library dependency, everything stays inside whole-stage codegen.

Scale design: a naive geo join is a cartesian product. ``grid_cell`` gives the
standard filter-refine spatial join — both sides compute a coarse grid-cell id,
the join is a plain (broadcastable) hash equi-join on the cell, and
``st_contains`` ray-casting refines exactly. At 100 TB the cell id is also the
natural partition key for the polygon side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# array<struct<x,y>> of the polygon's outer ring, in WKT order (ring closed:
# first vertex == last vertex).
VERTEX_TYPE = "array<struct<x:double,y:double>>"


def st_point(x, y) -> Column:
    """ST_GEOGPOINT(lon, lat) → struct<x,y> (ELT.sql:219)."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    return F.struct(xc.cast("double").alias("x"), yc.cast("double").alias("y"))


def st_astext_point(point_col: str, precision: int = 1) -> Column:
    """ST_ASTEXT for a point struct → 'POINT (x y)' (ELT.sql:394).

    Coordinates are rendered via DECIMAL(20, precision) so the text is
    engine-portable (no double shortest-round-trip formatting differences).
    """
    return F.expr(
        f"concat('POINT (', cast({point_col}.x as decimal(20,{precision})), ' ', "
        f"cast({point_col}.y as decimal(20,{precision})), ')')"
    )


def parse_wkt_polygon(wkt_col: str) -> Column:
    """Parse a single-ring 'POLYGON ((x y, x y, ...))' into array<struct<x,y>>.

    Pure expression: extract the inner coordinate list, split on commas, then
    split each pair on whitespace. Multi-ring polygons (holes) are out of scope
    (the reference's delivery zones are simple rings).
    """
    inner = f"regexp_extract({wkt_col}, 'POLYGON\\\\s*\\\\(\\\\(([^)]*)\\\\)\\\\)', 1)"
    # try_cast (not cast): ANSI mode would abort the job on malformed/empty WKT;
    # malformed vertices are dropped, leaving an array st_contains treats as
    # "nothing is inside".
    return F.expr(
        f"""filter(
              transform(split({inner}, ',\\\\s*'),
                p -> named_struct(
                  'x', try_cast(get(split(trim(p), '\\\\s+'), 0) as double),
                  'y', try_cast(get(split(trim(p), '\\\\s+'), 1) as double))),
              s -> s.x IS NOT NULL AND s.y IS NOT NULL)"""
    )


def st_contains(vertices_col: str, point_col: str) -> Column:
    """ST_CONTAINS(polygon, point) via even-odd ray casting (ELT.sql:354).

    ``vertices_col`` must be a plain column of ``VERTEX_TYPE`` (materialize the
    parse with ``withColumn`` first — a complex expression here would be
    re-evaluated per edge inside the fold). Casts a ray in +x from the point and
    folds edge crossings over ``aggregate``; odd crossings = inside. Boundary
    points follow the half-open edge rule (on-edge is not guaranteed inside —
    same caveat as any even-odd implementation; the reference's BQ semantics
    differ only on measure-zero boundary sets).

    The y-straddle test ``(y_i > py) != (y_j > py)`` is false whenever
    ``y_i == y_j``, so the slope division in the THEN branch cannot divide by
    zero (ANSI-safe).
    """
    v, p = vertices_col, point_col
    return F.expr(
        f"""CASE WHEN size({v}) >= 3 THEN
              aggregate(
                sequence(1, size({v}) - 1),
                false,
                (acc, i) -> CASE
                  WHEN (element_at({v}, i).y > {p}.y) != (element_at({v}, i + 1).y > {p}.y)
                       AND {p}.x < (element_at({v}, i + 1).x - element_at({v}, i).x)
                                   * ({p}.y - element_at({v}, i).y)
                                   / (element_at({v}, i + 1).y - element_at({v}, i).y)
                                   + element_at({v}, i).x
                  THEN NOT acc ELSE acc END)
            ELSE false END"""
    )


def grid_cell(x: Column, y: Column, cell_size: float) -> Column:
    """Coarse spatial-index key: the (⌊x/s⌋, ⌊y/s⌋) cell as one long.

    Join both sides of a containment join on this key (polygons keyed by every
    cell their bbox overlaps) to turn the spatial join into a hash equi-join;
    refine with :func:`st_contains`.
    """
    return (
        F.floor(x / F.lit(cell_size)) * F.lit(1_000_003) + F.floor(y / F.lit(cell_size))
    ).alias("grid_cell")
