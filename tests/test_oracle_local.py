"""Local replica of the driver's DuckDB-oracle differential gate: run every
registered query on Spark and its oracle SQL on DuckDB at sf0.001 (speed) and
compare row counts + sorted values (order-insensitive, column-name aligned)."""

from __future__ import annotations

import math

import duckdb
import pytest

from switchback_test_dag_spark.io import TABLES

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _normalize(df):
    """pandas frame → sorted list of row tuples with column-name ordering and
    float rounding, mimicking the driver's order-insensitive value hash."""
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            return round(v, 6)
        return v

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF).toPandas()
    assert len(sdf) >= 0  # smoke: runs
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) > 0, f"rows-only query {name} returned no rows"
        return
    odf = duck.execute(oracle).fetchdf()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    s_rows, o_rows = _normalize(sdf), _normalize(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # flagship now carries the full MWU table: statistic half + p-value
    assert set(df.columns) == {
        "test_name", "kpi", "n_a", "n_b", "u_stat", "z", "p_value",
    }


def test_registry_fits_correctness_window():
    """The driver's correctness harness samples the FIRST 50 registered
    queries. The registry is consolidated to exactly fit; a 51st registration
    would silently push a query out of the hard oracle gate — merge into an
    existing suite instead (see COVERAGE.md)."""
    assert len(entry_mod.queries()) <= 50, (
        "registry exceeds the driver's 50-query check window; "
        "merge same-grain queries instead of appending"
    )
    # every oracle key must have a query (no orphaned oracles)
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
