from switchback_test_dag_spark.design.power import (
    Z_80,
    Z_975,
    interp_power_intercept,
    mde_from_moments,
    mde_scaled_by_affected_share,
    norm_ppf,
    power_curve,
    power_two_sample,
    solve_mde,
    solve_n,
)

__all__ = [
    "Z_80",
    "Z_975",
    "interp_power_intercept",
    "mde_from_moments",
    "mde_scaled_by_affected_share",
    "norm_ppf",
    "power_curve",
    "power_two_sample",
    "solve_mde",
    "solve_n",
]
