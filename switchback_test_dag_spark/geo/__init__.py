from switchback_test_dag_spark.geo.containment import (
    grid_cell,
    parse_wkt_polygon,
    st_astext_point,
    st_contains,
    st_point,
)

__all__ = [
    "grid_cell",
    "parse_wkt_polygon",
    "st_astext_point",
    "st_contains",
    "st_point",
]
