"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship switchback analysis end-to-end on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the DuckDB-oracle differential gate at sf0.01.

Query registry lives in ``switchback_test_dag_spark/queries.py`` (keeps this file
a thin contract shim).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from switchback_test_dag_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full switchback battery (synthesized orders_fact → config-driven
    filter/label → 13-KPI MWU p-values) on /root/testdata/sf0.001."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.QUERIES


def oracle_sql() -> dict[str, str]:
    return _q.ORACLES
