"""The events ``ts`` contract: whatever physical timestamp type the parquet
stores, ``load_table``/``stream_events`` expose a µs ``ts`` TIMESTAMP plus an
exact ``ts_ns`` long. Round 3's driver run failed on exactly this — the fixture
moved to TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers as
``timestamp_ntz``, and the old dtype dispatch silently skipped ``ts_ns``."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from switchback_test_dag_spark.io import load_table, normalize_events_ts

_EPOCH_NS = 1_500_000_123_456_789_000  # 2017-07-14T02:42:03.456789 UTC


def test_fixture_events_expose_ts_and_ts_ns(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dtypes = dict(ev.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    row = ev.select(
        (F.col("ts_ns") - F.unix_micros("ts") * F.lit(1000)).alias("sub_us_ns")
    ).agg(F.min("sub_us_ns"), F.max("sub_us_ns")).first()
    # ts is the floor-truncation of ts_ns to µs: residue within [0, 1000) ns
    assert 0 <= row[0] and row[1] < 1000


@pytest.mark.parametrize("physical", ["ntz", "ltz", "bigint_ns"])
def test_normalize_events_ts_all_physical_types(spark, physical):
    naive = dt.datetime(2017, 7, 14, 2, 42, 3, 456789)
    if physical == "bigint_ns":
        df = spark.createDataFrame([(_EPOCH_NS,)], "ts bigint")
    elif physical == "ntz":
        df = spark.createDataFrame([(naive,)], "ts timestamp_ntz")
    else:
        df = spark.createDataFrame([(naive,)], "ts timestamp")
    out = normalize_events_ts(df)
    dtypes = dict(out.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    row = out.select("ts_ns", F.unix_micros("ts").alias("us")).first()
    # session tz is UTC, so every physical type lands on the same instant
    assert row["us"] == _EPOCH_NS // 1000
    assert row["ts_ns"] == _EPOCH_NS if physical == "bigint_ns" else _EPOCH_NS // 1000 * 1000


def test_normalize_events_ts_rejects_unknown_dtype(spark):
    df = spark.createDataFrame([("2017-07-14",)], "ts string")
    with pytest.raises(TypeError, match="unsupported dtype"):
        normalize_events_ts(df)
