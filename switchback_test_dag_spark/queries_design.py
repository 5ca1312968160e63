"""Design-tooling queries (SURVEY §2.8 T11/T19) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from switchback_test_dag_spark.design import mde_from_moments
from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.queries import query

_MDE_FORMULA = "(1.959963984540054 + 0.8416212335729143) * sd_raw * 2.0 / sqrt(n)"


@query(
    "mde_by_event_type",
    f"""WITH m AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                avg(value) AS mean_raw, stddev_samp(value) AS sd_raw
         FROM events
         WHERE value IS NOT NULL AND NOT isnan(value)
         GROUP BY event_type
       )
       SELECT event_type, n,
              round(mean_raw, 6) AS mean_value,
              round(sd_raw, 6) AS sd,
              round(CASE WHEN n > 3 AND sd_raw > 0 THEN {_MDE_FORMULA} END, 6) AS mde_abs,
              round(CASE WHEN n > 3 AND sd_raw > 0 AND abs(mean_raw) > 0
                         THEN ({_MDE_FORMULA}) / abs(mean_raw) * 100.0 END, 4) AS mde_pct
       FROM m""",
)
def mde_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11 (closed form): per-segment minimum detectable effect from one moment
    pass — the normal-approximation half of the reference's
    ``tt_ind_solve_power`` sweeps (switchback_analysis.ipynb:462-709); the
    exact-t solvers/curves live driver-side in ``design.power``.
    """
    return mde_from_moments(
        load_table(spark, sf_dir, "events"), "value", by=["event_type"]
    )
