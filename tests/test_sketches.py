"""Sketch error contracts vs exact answers on real fixture data: the HLL++
distinct estimate must sit within a small multiple of its configured rsd, and
GK quantiles within their rank-error guarantee — the gates that justify
switching the exact paths off at warehouse scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.operators.sketches import (
    approx_quantiles,
    distinct_count_with_error,
)

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_error_envelope(spark):
    ev = load_table(spark, SF, "events")
    rows = distinct_count_with_error(
        ev, "user_id", by=["event_type"], rsd=0.05
    ).collect()
    assert rows
    for r in rows:
        # 3x rsd: HLL's rsd is a standard deviation, not a hard bound
        assert r["rel_err"] <= 0.15, (
            f"{r['event_type']}: {r['approx_distinct']} vs "
            f"{r['exact_distinct']} (rel_err {r['rel_err']})"
        )


def test_gk_quantiles_within_rank_error(spark):
    li = load_table(spark, SF, "lineitem")
    got = li.agg(
        approx_quantiles("l_extendedprice", [0.25, 0.5, 0.75], accuracy=10_000)
        .alias("q")
    ).first()["q"]
    n = li.count()
    exact_sorted = [
        r["l_extendedprice"]
        for r in li.select("l_extendedprice").orderBy("l_extendedprice").collect()
    ]
    for p, v in zip([0.25, 0.5, 0.75], got):
        # GK guarantee: the returned value's true rank is within n/accuracy
        # of the target rank
        import bisect

        lo = bisect.bisect_left(exact_sorted, v)
        hi = bisect.bisect_right(exact_sorted, v)
        target = p * n
        slack = n / 10_000 + 1
        assert lo - slack <= target <= hi + slack, (
            f"p={p}: value {v} rank window [{lo}, {hi}] vs target {target}"
        )
