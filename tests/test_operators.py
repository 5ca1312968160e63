"""Unit tests for the composed relational operators (as-of join semantics that
the oracle queries exercise only end-to-end)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from switchback_test_dag_spark.operators.relational import asof_join_backward


def _asof(spark, left_rows, right_rows, right_cols):
    left = spark.createDataFrame(left_rows, "k string, t long")
    right = spark.createDataFrame(
        right_rows, "k string, rt long, " + ", ".join(f"{c} string" for c in right_cols)
    )
    return asof_join_backward(
        left, right, on="k", left_time="t", right_time="rt", right_cols=right_cols
    )


def test_asof_backward_basic(spark):
    out = _asof(
        spark,
        [("a", 5), ("a", 15), ("a", 25), ("b", 1)],
        [("a", 10, "x10"), ("a", 20, "x20")],
        ["val"],
    ).collect()
    got = {(r["k"], r["t"]): r["val"] for r in out}
    assert got == {("a", 5): None, ("a", 15): "x10", ("a", 25): "x20", ("b", 1): None}


def test_asof_inclusive_at_equal_time(spark):
    out = _asof(spark, [("a", 10)], [("a", 10, "x10")], ["val"]).collect()
    assert out[0]["val"] == "x10"


def test_asof_no_row_tearing_with_null_right_cols(spark):
    """A NULL in one right column must NOT be filled from an *earlier* right
    row — all right values of an output row come from the same matched row
    (the struct-carry fix; per-column last(ignorenulls) would mix rows)."""
    out = _asof(
        spark,
        [("a", 30)],
        [("a", 10, "u10", "v10"), ("a", 20, "u20", None)],
        ["u", "v"],
    ).collect()
    assert out[0]["u"] == "u20"
    assert out[0]["v"] is None  # matched row's NULL, not v10 leaking forward


def test_asof_rejects_column_collision(spark):
    left = spark.createDataFrame([("a", 1, "clash")], "k string, t long, val string")
    right = spark.createDataFrame([("a", 1, "r")], "k string, rt long, val string")
    with pytest.raises(ValueError, match="right_cols"):
        asof_join_backward(
            left, right, on="k", left_time="t", right_time="rt", right_cols=["val"]
        )
