"""Shared helpers for the stats engine."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt_kpis(
    df: DataFrame,
    kpi_cols: Sequence[str],
    id_cols: Sequence[str] = (),
    kpi_name_col: str = "kpi",
    value_col: str = "value",
) -> DataFrame:
    """Wide KPI columns → long (kpi, value) rows.

    The reference loops over a ``col_list`` of 13 KPI columns in Python
    (``automated_switchback_test_analysis_script.py:92-96,136-144``); melting lets
    one distributed job process all KPIs at once, with downstream windows/aggs
    partitioned by ``kpi`` — so per-KPI work parallelizes instead of serializing
    through a driver loop.
    """
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in kpi_cols)
    expr = f"stack({len(kpi_cols)}, {stack_args}) as ({kpi_name_col}, {value_col})"
    return df.select(*id_cols, F.expr(expr))
