"""Deterministic stratified sampling — the data-mixing primitives of a
training-corpus pipeline (pick exactly k docs per source, or hit exact
per-source mixture ratios), re-expressed Spark-first.

Why not ``df.sample``/``sampleBy``: those are PROBABILISTIC (Bernoulli per
row) — the drawn count varies run to run and across partitionings, which is
unacceptable when a data mixture is part of a training recipe. These
operators are exact and deterministic: membership is a pure function of
(row id, seed), independent of partitioning, cluster size, or row order.

Scale shape — the few-huge-strata case is the design point: a data-mixing
recipe ({"web": 0.1, "books": 1.0}) has a handful of strata, each a large
slice of the corpus, so a per-stratum ``row_number`` window (one task per
stratum — a multi-TB single-executor sort at 100 TB) is exactly the wrong
plan. Instead the global per-stratum rank is reconstructed the same way
``operators.relational.exact_quantiles`` reconstructs its parallel running
sum: range-partition on ``(strata..., hash, id)`` so each stratum's hash
order ascends across ascending partition ids, take a LOCAL ``row_number``
per (partition, stratum) — bounded by partition size, never stratum size —
and add a broadcast per-(partition, stratum) offset (the count of same-
stratum rows in earlier partitions). The offset frame has ≤ partitions ×
strata rows — metadata, not data. The seeded ``xxhash64`` ordering key is
uniform, so the RANGE partitioner splits every stratum evenly regardless of
how the id space is clustered; stratum-size skew is then irrelevant because
no plan step ever gathers a whole stratum into one task.

The ``TABLESAMPLE``-style fraction variant first computes per-stratum counts
(a map-side-combined agg, broadcast back) so targets are exact integers,
then takes the same hash-top-k slice. Selection is by rank over a hash
permutation, i.e. a simple random sample without replacement per stratum,
reproducible forever from the seed.

Reference tie-in: the reference randomizes experiment assignment by seeded
hashing (SURVEY §2 T12); this extends the same portable-seeded-hash idiom to
corpus subsetting (mandated training-data extension).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_H, _PID, _LRK, _OPID, _OFF = "_sgs_h", "_sgs_pid", "_sgs_lrk", "_sgs_opid", "_sgs_off"


def _permutation_hash(id_col: str, seed: int, portable: bool):
    """The seeded per-row ordering key. ``portable=True`` swaps xxhash64 for
    an md5-prefix permutation that exists verbatim in DuckDB/BigQuery/Trino —
    slower, but lets an external engine replay the EXACT sample membership
    (the driver oracle and the pytest replay use it); production keeps the
    cheap xxhash64."""
    if portable:
        return F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
            1,
            16,
        )
    return F.xxhash64(F.col(id_col), F.lit(seed))


def _with_stratum_rank(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    seed: int,
    portable: bool,
    rank_col: str = "_rk",
) -> DataFrame:
    """Attach the 1-based rank of each row within its stratum under the seeded
    hash permutation, with NO single-task-per-stratum stage.

    (hash, id) ordering makes the rank total even on a hash tie (``id_col``
    must be unique per row), and the rank depends only on that total order —
    not on where the range partitioner happens to place its boundaries — so
    membership stays a pure function of (id, seed). NULL stratum values form
    their own stratum (groupBy semantics): the offset join is null-safe.
    """
    hashed = df.withColumn(_H, _permutation_hash(id_col, seed, portable))
    # _with_key_rank already projects _H away — no trailing drop needed
    return _with_key_rank(hashed, strata, id_col, rank_col)


def _with_key_rank(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    rank_col: str = "_rk",
) -> DataFrame:
    """The scale-safe per-stratum rank under an arbitrary pre-computed
    ordering key column ``_H`` (ascending, ties broken by ``id_col``) — the
    range-partition + local-row_number + broadcast-offset machinery shared by
    the uniform samplers (key = seeded permutation hash) and the weighted
    priority sampler (key = negated integer priority)."""
    from switchback_test_dag_spark.caching import pin

    hashed = df
    # ascending (strata..., key, id) ranges land on ascending partition ids
    # (the range partitioner's invariant); keys are unique, so assignment is
    # order-consistent and the reconstructed global rank is exact.
    #
    # The pin() is CORRECTNESS-load-bearing, not a performance cache: the
    # local-rank branch and the offset branch below both consume this frame,
    # and RangePartitioner draws fresh reservoir samples per execution, so
    # two independent executions of the exchange can place the partition
    # boundaries differently — local ranks from one partitioning added to
    # offsets from another silently corrupt deep ranks (caught by the 100x
    # oracle re-diff: 4948/6250 rows sampled in one stratum). Exchange reuse
    # is a Catalyst optimization, not a guarantee; persisting makes both
    # branches read the ONE materialized partitioning. Callers should project
    # to (strata, id, key/weight) before sampling so the pinned frame stays
    # narrow at corpus scale (the registry rows do).
    parts = pin(
        hashed.repartitionByRange(
            *[F.col(c) for c in strata], F.col(_H), F.col(id_col)
        ).withColumn(_PID, F.spark_partition_id())
    )
    local_w = Window.partitionBy(_PID, *strata).orderBy(_H, id_col)
    local = parts.withColumn(_LRK, F.row_number().over(local_w))
    # per-(partition, stratum) row counts -> prefix offsets over partition ids:
    # a window over the tiny subtotal frame (≤ partitions × strata rows)
    ptot = parts.groupBy(_PID, *strata).agg(F.count(F.lit(1)).alias("_pc"))
    off_w = (
        Window.partitionBy(*strata)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # single-select fusions (here and in the return): every DataFrame
    # transformation is an eagerly-analyzed Dataset creation, and on a deep
    # upstream tree each analysis pass re-walks (and, at joins of branches
    # sharing a relation, re-copies) that whole tree — fused selects halve
    # the number of passes without changing the plan Catalyst ends up with
    offs = ptot.select(
        F.col(_PID).alias(_OPID),
        *[F.col(c).alias(f"_sgs_s{i}") for i, c in enumerate(strata)],
        F.coalesce(F.sum("_pc").over(off_w), F.lit(0)).alias(_OFF),
    )
    cond = F.col(_PID) == F.col(_OPID)
    for i, c in enumerate(strata):
        cond = cond & F.col(c).eqNullSafe(F.col(f"_sgs_s{i}"))
    keep = [c for c in hashed.columns if c != _H]
    return local.join(broadcast(offs), cond).select(
        *keep, (F.col(_LRK) + F.col(_OFF)).cast("int").alias(rank_col)
    )


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
        _with_stratum_rank(df, strata, id_col, seed, portable)
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


_PRI_BITS = 40
_PRI_SCALE = 1 << _PRI_BITS


def weighted_priority_sample(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: the top ``k`` rows
    per stratum by *priority* ``w / u`` with ``u`` a seeded per-row uniform —
    Duffield–Lund–Thorup priority sampling (JACM 2007; public method), whose
    inclusion probabilities are ≈ proportional to weight with well-studied
    subset-sum estimators. The use case the uniform samplers can't serve:
    quality- or length-weighted corpus subsetting ("sample survivors ∝ token
    count / quality score") as part of a reproducible training recipe.

    Exactness across engines is part of the contract: the priority is the
    INTEGER ``(w << 40) div a`` with ``a`` the 40-bit seeded uniform (md5
    prefix under ``portable=True``, ``xxhash64`` masked otherwise), so the
    ordering involves no float op that could differ by an ulp between Spark
    and a replaying engine — an external oracle reproduces membership
    bit-for-bit (DuckDB: ``(w::HUGEINT * 2^40) // a``). The priority can
    reach ~2^103 (w near BIGINT max over a=1), so it is carried as
    DECIMAL(38,0) and computed overflow-free by the exact split identity
    ``w*S div a = (w div a)*S + ((w mod a)*S) div a`` — every intermediate
    fits DECIMAL(38,0) and the second quotient (< 2^40) fits the BIGINT that
    Spark's decimal ``div`` returns. Ranking uses the same range-partitioned
    machinery as the uniform samplers (no single-task-per-stratum stage).

    Rows with NULL or non-positive weight are never sampled; any positive
    weight that fits BIGINT (≤ 2^63 − 1, e.g. token counts of arbitrarily
    long documents) is supported. ``id_col`` must be unique per row."""
    if portable:
        a_raw = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
                1,
                _PRI_BITS // 4,
            ),
            16,
            10,
        ).cast("long")
    else:
        a_raw = F.xxhash64(F.col(id_col), F.lit(seed)).bitwiseAND(
            F.lit(_PRI_SCALE - 1)
        )
    w = F.col(weight_col).cast("long")
    a = F.greatest(a_raw, F.lit(1))
    # pri = w * 2^40 div a without overflow for ANY positive BIGINT weight:
    # with w = hi*a + r, exactly w*S div a = hi*S + (r*S) div a. hi*S can
    # reach 2^103 -> DECIMAL(38,0); r*S < 2^80 rides through DECIMAL and its
    # quotient (< 2^40) fits the BIGINT that decimal `div` yields (Spark's
    # decimal `div` truncates to BIGINT — safe here, silently wrong for
    # quotients past 2^63, which is why the full priority never goes
    # through a single `div`).
    pri = F.expr(
        f"CAST(_wps_w div _wps_a AS DECIMAL(38,0)) * {_PRI_SCALE}"
        f" + CAST(_wps_w % _wps_a AS DECIMAL(38,0)) * {_PRI_SCALE} div _wps_a"
    )
    # fused: two selects instead of three withColumns + a drop — each saved
    # transformation is one fewer analyzer pass over the caller's (often
    # deep) upstream tree; _wps_w/_wps_a exist only inside the inner select
    eligible = (
        df.filter(w.isNotNull() & (w > 0))
        .select("*", w.alias("_wps_w"), a.alias("_wps_a"))
        .select(*df.columns, (-pri).alias(_H))
    )
    return (
        _with_key_rank(eligible, strata, id_col)
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
    single float or a map keyed by the FIRST stratum column's value ONLY (the
    data-mixing recipe shape: {"web": 0.1, "books": 1.0, ...}) — with
    ``len(strata) > 1`` the count/rank granularity is the full stratum tuple
    but every tuple sharing a first-column value gets that value's fraction;
    per-tuple recipes need a derived single stratum column. Strata missing
    from the map default to 0 (dropped), and a NULL-valued stratum is always
    dropped (the target join is an equi-join, matching the map's no-NULL-key
    reality). Two passes over the frame: a map-side-combined
    count per stratum broadcast back, then the hash-rank slice — no collect
    of data rows."""
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_n"))
    if isinstance(fractions, Mapping):
        frac = F.lit(0.0)
        for key, f in fractions.items():
            frac = F.when(F.col(strata[0]) == key, F.lit(float(f))).otherwise(frac)
    else:
        frac = F.lit(float(fractions))
    targets = counts.select(
        *strata, F.floor(F.col("_n") * frac + 0.5).cast("long").alias("_target")
    )
    with_target = df.join(broadcast(targets), on=list(strata))
    return (
        _with_stratum_rank(with_target, strata, id_col, seed, portable)
        .filter(F.col("_rk") <= F.col("_target"))
        .drop("_rk", "_target")
    )
