"""Distributed Mann-Whitney U test (two-sided, tie-corrected normal approximation
with continuity correction) — the reference's production significance method
(``/root/reference/py_scripts/automated_switchback_test_analysis_script.py:136-144``:
``mannwhitneyu(kpi_on.dropna(), kpi_off.dropna(), alternative='two-sided')``).

Spark-first design (no per-group pandas):

1. Drop nulls (scipy ``nan_policy='omit'`` equivalent of the reference's ``dropna``).
2. Pre-aggregate by (group-keys, value): ``n`` rows at each distinct value and
   ``n_a`` of them in sample A. This is the scale lever — ranks are computed over
   *distinct values* (bounded, often ≪ row count), not raw rows.
3. One window per group-key partition ordered by value: the default RANGE frame of
   ``sum() over (order by value)`` includes the whole tie group, so the average
   (midrank) of a tie group of size n ending at cumulative count c is
   ``c - n + (n+1)/2``.
4. Rank-sum R_A, tie term Σ(t³−t), then the scipy asymptotic formula:
   U_A = R_A − n_A(n_A+1)/2, μ = n_A n_B/2,
   σ = sqrt(n_A n_B/12 · ((N+1) − Σ(t³−t)/(N(N−1)))),
   z = (max(U_A, U_B) − μ − 0.5)/σ, p = min(1, 2·sf(z)).

All arithmetic is JVM column math; the normal tail uses the A&S approximation
(abs err ≤ 1.5e-7, validated against scipy in tests/test_stats_reference.py).

Scale note: the only shuffle beyond the pre-aggregation is the per-partition window;
with ``by=('test_name','kpi')`` partitions the window parallelizes across tests × KPIs
and no single-partition global sort exists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from switchback_test_dag_spark.stats.distributions import normal_two_sided_p


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    by: Sequence[str] = (),
) -> DataFrame:
    """Two-sided MWU of ``value_col`` between ``group_a`` and ``group_b`` rows,
    independently per ``by`` partition.

    Returns one row per ``by`` tuple with columns:
    ``n_a, n_b, u_stat`` (U of sample A, scipy's ``statistic``), ``z``, ``p_value``.
    """
    by = list(by)
    v = F.col(value_col).cast("double")

    filtered = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(group_col).isin([group_a, group_b])
    ).select(
        *by,
        v.alias("_v"),
        F.when(F.col(group_col) == F.lit(group_a), 1).otherwise(0).alias("_is_a"),
    )

    per_value = filtered.groupBy(*by, "_v").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_is_a").alias("_n_a"),
    )

    w = Window.partitionBy(*by).orderBy("_v") if by else Window.orderBy("_v")
    # Midranks are half-integers: track them in INTEGER HALF-UNITS
    # (2·midrank = 2·cum − n + 1) so the rank sum is an exact bigint. A double
    # rank sum loses ULPs once groups reach millions of rows (R_A ~ n²/2 ≈
    # 3.5e13 at 4M rows has ULP 0.004 — observed as a cross-engine 1-ulp
    # mismatch at the 100× scale point); exact integers are identical on any
    # engine. Bigint headroom: 2·R_A overflows past n ≈ 3e9 rows per group —
    # switch the sum to decimal(38,0)/hugeint beyond that.
    ranked = per_value.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "_midrank2",
        F.lit(2) * F.col("_cum") - F.col("_n") + F.lit(1),
    )

    agg = ranked.groupBy(*by).agg(
        F.sum("_n_a").alias("n_a"),
        (F.sum("_n") - F.sum("_n_a")).alias("n_b"),
        F.sum(F.col("_n_a").cast("long") * F.col("_midrank2")).alias("_r_a2"),
        # tie term n³−n overflows BIGINT once one value holds ≳2e6 rows (a
        # near-constant KPI at scale does exactly that) → exact decimal(38,0),
        # consumed as double inside sigma where only ~1e-16 relative matters
        F.sum(
            F.col("_n").cast("decimal(19,0)")
            * F.col("_n").cast("decimal(19,0)")
            * F.col("_n").cast("decimal(19,0)")
            - F.col("_n").cast("decimal(19,0)")
        ).alias("_tie_term"),
        F.sum("_n").alias("_n_tot"),
    )

    n_a, n_b, n_tot = F.col("n_a"), F.col("n_b"), F.col("_n_tot")
    # guard degenerate partitions (ANSI mode: unguarded x/0 throws)
    valid = (n_a > 0) & (n_b > 0) & (n_tot > 1)
    # U in half-units stays exact bigint through the subtraction; the halving
    # to U happens once, after all cancellation-prone arithmetic is integer
    u_a2 = F.col("_r_a2") - n_a * (n_a + 1)
    u_b2 = F.lit(2) * n_a * n_b - u_a2
    u_a = u_a2 / F.lit(2.0)
    sigma = F.when(
        valid,
        F.sqrt(
            n_a
            * n_b
            / F.lit(12.0)
            * ((n_tot + 1) - F.col("_tie_term").cast("double") / (n_tot * (n_tot - 1)))
        ),
    )
    # scipy's 0.5 continuity correction toward the mean on max(U_a, U_b):
    # numerator in half-units = max(2U_a, 2U_b) − n_a·n_b·(2/2) ... exactly
    # (max(u_a2, u_b2) − n_a·n_b − 1) / 2
    z = F.when(
        valid & (sigma > 0),
        (F.greatest(u_a2, u_b2) - n_a * n_b - F.lit(1)) / F.lit(2.0) / sigma,
    )

    return agg.select(
        *by,
        n_a,
        n_b,
        F.when(valid, u_a).alias("u_stat"),
        z.alias("z"),
        F.when(z.isNotNull(), normal_two_sided_p(z)).alias("p_value"),
    )
