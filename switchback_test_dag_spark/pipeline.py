"""The production switchback analysis — Spark-native re-expression of
``/root/reference/py_scripts/automated_switchback_test_analysis_script.py:104-161``.

Reference flow (per test, serial pandas): boolean-mask filter → ``np.select``
On/Off label → ``groupby().mean()`` / ``.sum()`` over 13 KPIs → per-KPI
``scipy.stats.mannwhitneyu``. Here the per-test loop disappears: configs become a
broadcast-joined dimension, so *all* tests run in one distributed plan —
filters/labels are column predicates over array-typed config fields, aggregates are
one ``groupBy``, and the 13 MWU tests melt into a single ranked window job
partitioned by (test, KPI). At 100 TB the fact table is scanned once per battery
instead of once per test.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from switchback_test_dag_spark.stats.mwu import mann_whitney_u
from switchback_test_dag_spark.stats.util import melt_kpis

# the reference's col_list (automated_...py:92-96): 10 monetary + 3 logistics KPIs
KPI_COLS: tuple[str, ...] = (
    "actual_df_paid_by_customer",
    "gfv_local",
    "gmv_local",
    "commission_local",
    "joker_vendor_fee_local",
    "sof_local",
    "service_fee_local",
    "revenue_local",
    "delivery_costs_local",
    "gross_profit_local",
    "dps_mean_delay",
    "delivery_distance_m",
    "actual_DT",
)
MONETARY_KPI_COLS: tuple[str, ...] = KPI_COLS[:-3]  # sums exclude logistics KPIs


def label_orders(orders: DataFrame, configs_df: DataFrame) -> DataFrame:
    """Attach (test_name, on_or_off_day) to every qualifying order.

    Replaces the reference's per-test pandas mask (``automated_...py:104-121``):
    one broadcast join on ``test_name`` + array-membership predicates. Orders not
    matching any running test drop out (the reference loop never sees them either).
    """
    joined = orders.join(broadcast(configs_df), on="test_name", how="inner")
    scheme = F.col("scheme_id")
    # pandas `~isin` semantics: a NULL zone is never "in" the exclusion list
    not_excluded = lambda excl, zone: F.coalesce(  # noqa: E731
        ~F.array_contains(F.col(excl), F.col(zone)), F.lit(True)
    )
    qualified = joined.filter(
        (F.col("target_group") != "Non_TG")
        & not_excluded("zone_name_vendor_excl", "zone_name_vendor")
        & not_excluded("zone_name_customer_excl", "zone_name_customer")
        & (
            F.array_contains(F.col("scheme_id_on"), scheme)
            | F.array_contains(F.col("scheme_id_off"), scheme)
        )
        & F.to_date("order_placed_at_local").between(
            F.col("test_start"), F.col("test_end")
        )
    )
    return qualified.withColumn(
        "on_or_off_day",
        F.when(F.array_contains(F.col("scheme_id_on"), scheme), F.lit("On")).otherwise(
            F.lit("Off")
        ),
    ).drop(
        "test_start",
        "test_end",
        "scheme_id_on",
        "scheme_id_off",
        "zone_name_vendor_excl",
        "zone_name_customer_excl",
    )


def per_order_metrics(
    labeled: DataFrame, kpi_cols: Sequence[str] = KPI_COLS
) -> DataFrame:
    """Per-order (mean) KPIs by (test_name, on_or_off_day), rounded to 2 —
    ``automated_...py:124-125``."""
    return labeled.groupBy("test_name", "on_or_off_day").agg(
        *[F.round(F.avg(c), 2).alias(c) for c in kpi_cols]
    )


def total_metrics(
    labeled: DataFrame, kpi_cols: Sequence[str] = MONETARY_KPI_COLS
) -> DataFrame:
    """Total (sum) monetary KPIs by (test_name, on_or_off_day), rounded to 2 —
    ``automated_...py:128-129`` (logistics KPIs excluded)."""
    return labeled.groupBy("test_name", "on_or_off_day").agg(
        *[F.round(F.sum(c), 2).alias(c) for c in kpi_cols]
    )


def p_values(
    labeled: DataFrame, kpi_cols: Sequence[str] = KPI_COLS, pivot: bool = False
) -> DataFrame:
    """Two-sided MWU p-value per (test_name, KPI), On vs Off, rounded to 4 —
    ``automated_...py:136-144``. All tests × KPIs in one distributed job."""
    long = melt_kpis(labeled, kpi_cols, id_cols=("test_name", "on_or_off_day"))
    res = mann_whitney_u(
        long, "value", "on_or_off_day", "On", "Off", by=["test_name", "kpi"]
    ).select("test_name", "kpi", F.round("p_value", 4).alias("p_value"))
    if pivot:
        return res.groupBy("test_name").pivot("kpi", list(kpi_cols)).agg(
            F.first("p_value")
        )
    return res


def run_tests(
    orders: DataFrame, configs_df: DataFrame, kpi_cols: Sequence[str] = KPI_COLS
) -> dict[str, DataFrame]:
    """Full battery: returns {'per_order', 'totals', 'p_values'} DataFrames."""
    labeled = label_orders(orders, configs_df)
    return {
        "per_order": per_order_metrics(labeled, kpi_cols),
        "totals": total_metrics(
            labeled, [c for c in kpi_cols if c in MONETARY_KPI_COLS]
        ),
        "p_values": p_values(labeled, kpi_cols),
    }
