"""Deterministic stratified sampling — the data-mixing primitives of a
training-corpus pipeline (pick exactly k docs per source, or hit exact
per-source mixture ratios), re-expressed Spark-first.

Why not ``df.sample``/``sampleBy``: those are PROBABILISTIC (Bernoulli per
row) — the drawn count varies run to run and across partitionings, which is
unacceptable when a data mixture is part of a training recipe. These
operators are exact and deterministic: membership is a pure function of
(row id, seed), independent of partitioning, cluster size, or row order.

Scale shape: one shuffle keyed on the strata (the window's partition), with
the per-row ordering key a seeded ``xxhash64`` — uniform, so the window sort
is skew-free even when the id space is clustered. The ``TABLESAMPLE``-style
fraction variant first computes per-stratum counts (a map-side-combined agg,
broadcast back) so targets are exact integers, then takes the same hash-top-k
slice. Selection is by rank over a hash permutation, i.e. a simple random
sample without replacement per stratum, reproducible forever from the seed.

Reference tie-in: the reference randomizes experiment assignment by seeded
hashing (SURVEY §2 T12); this extends the same portable-seeded-hash idiom to
corpus subsetting (mandated training-data extension).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _rank_in_stratum(
    strata: Sequence[str], id_col: str, seed: int, portable: bool
):
    """1-based rank of each row within its stratum under the seeded hash
    permutation; (hash, id) ordering makes the rank total even on a hash
    tie. ``portable=True`` swaps xxhash64 for an md5-prefix permutation that
    exists verbatim in DuckDB/BigQuery/Trino — slower, but lets an external
    engine replay the EXACT sample membership (the pytest oracle uses it);
    production keeps the cheap xxhash64."""
    if portable:
        h = F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
            1,
            16,
        )
    else:
        h = F.xxhash64(F.col(id_col), F.lit(seed))
    w = Window.partitionBy(*strata).orderBy(h, F.col(id_col))
    return F.row_number().over(w)


def stratified_exact_sample(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    k: int,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically.

    Membership depends only on (id, seed) ranks within the stratum — NOT on
    partitioning or arrival order — so re-running on a different cluster
    reproduces the sample bit-for-bit. ``id_col`` must be unique per row."""
    return (
        df.withColumn("_rk", _rank_in_stratum(strata, id_col, seed, portable))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def stratified_fraction_sample(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    fractions: Mapping[str, float] | float,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Exact-count fraction sampling per stratum: the target is
    ``floor(|stratum| * fraction + 0.5)`` rows — EXACT, unlike Bernoulli
    ``sampleBy`` whose realized count is binomial. ``fractions`` is either a
    single float or a map keyed by the FIRST stratum column's value (the
    data-mixing recipe shape: {"web": 0.1, "books": 1.0, ...}); strata
    missing from the map default to 0 (dropped). Two passes over the frame:
    a map-side-combined count per stratum broadcast back, then the hash-rank
    slice — no collect of data rows."""
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_n"))
    if isinstance(fractions, Mapping):
        frac = F.lit(0.0)
        for key, f in fractions.items():
            frac = F.when(F.col(strata[0]) == key, F.lit(float(f))).otherwise(frac)
    else:
        frac = F.lit(float(fractions))
    targets = counts.withColumn(
        "_target", F.floor(F.col("_n") * frac + 0.5).cast("long")
    ).drop("_n")
    return (
        df.join(broadcast(targets), on=list(strata))
        .withColumn("_rk", _rank_in_stratum(strata, id_col, seed, portable))
        .filter(F.col("_rk") <= F.col("_target"))
        .drop("_rk", "_target")
    )
