"""Sketch-based approximate aggregates — the 100 TB forms of the exact
operators the registry oracles (A3 distinct counts, A11 quantiles).

At warehouse scale, exact ``countDistinct`` shuffles every distinct value
and exact percentiles sort whole partitions; the sketch forms are one-pass,
mergeable, and bounded-memory — the right default once inputs stop fitting
the exact paths' budgets:

- ``approx_distinct``: Spark's HyperLogLog++ (`approx_count_distinct`),
  relative standard deviation ``rsd`` dialing the register budget. Partial
  sketches merge associatively, so the map-side combine carries ~KBs per
  group regardless of row volume.
- ``approx_quantiles``: Greenwald–Khanna (`percentile_approx`), the same
  sketch the exact-path IQR operator already uses with a tight accuracy —
  exposed here with the accuracy knob as a first-class dial.
- ``distinct_count_with_error``: both the exact and sketch counts plus the
  realized relative error — the calibration query a pipeline runs once per
  dataset class to pick ``rsd`` before switching the exact path off.

Error contracts are pytest-gated against exact answers on the fixture
corpus (``tests/test_sketches.py``); these are deliberately NOT in the
oracle registry — DuckDB's HLL implementation differs register-for-register,
so cross-engine hashes cannot agree; the gate is the error bound itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count: ~1.04/sqrt(m) relative error with
    2^m registers; ``rsd`` picks m. Mergeable partial aggregate."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    col: str, probabilities: Sequence[float], accuracy: int = 10_000
) -> Column:
    """Greenwald–Khanna quantile sketch; rank error ≤ 1/accuracy of the
    partition-merged stream."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return F.percentile_approx(col, probs, F.lit(int(accuracy)))


def distinct_count_with_error(
    df: DataFrame, col: str, by: Sequence[str] = (), rsd: float = 0.05
) -> DataFrame:
    """Per-group exact vs HLL++ distinct counts and realized relative error.

    The calibration pass: run once at a representative scale, confirm
    ``rel_err`` sits inside the configured ``rsd`` envelope, then drop the
    exact half at production scale. One scan, both aggregates in the same
    groupBy (the exact half is the expensive one — that is the point)."""
    by = list(by)
    return df.groupBy(*by).agg(
        F.countDistinct(col).alias("exact_distinct"),
        approx_distinct(col, rsd).alias("approx_distinct"),
        F.round(
            F.abs(
                F.approx_count_distinct(col, rsd).cast("double")
                - F.countDistinct(col).cast("double")
            )
            / F.countDistinct(col).cast("double"),
            6,
        ).alias("rel_err"),
    )
