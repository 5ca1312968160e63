"""Randomization-inference and assignment-strategy queries (SURVEY §2 T5, T7,
T8, T10, T12-T14, T18 + T2/T4/T6 statistics), each with a DuckDB oracle.

The seeded arm is the engine-portable md5-prefix hash
(``stats.permutation.portable_arm_sql``), so the *entire* multi-seed engine —
assignment, moment algebra, t statistics, FPR/power/coverage rates — is
value-diffed against DuckDB, not just row-counted.

The t critical value is a literal (1.959964, the normal/large-dof two-sided 5%
point) inlined into BOTH plans: the oracle stays SQL-pure and the parity check
is exact. Calibration against the *exact* t quantile for the actual dof is
covered by tests/test_inference.py using stats.special.t_ppf_two_sided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.plans.assignment import balanced_assignment
from switchback_test_dag_spark.queries import query
from switchback_test_dag_spark.stats import permutation as P
from switchback_test_dag_spark.stats.crse import crse_ols
from switchback_test_dag_spark.stats.ttests import welch_t_test

N_SEEDS = 200
CRIT = 1.959964
EFFECT = 3.0

# hourly epoch bucket, identical on both engines (integer division of the ns
# epoch; DuckDB reads the parquet ns timestamp µs-truncated, which cannot move
# an hour boundary)
_SPARK_BUCKET = "ts_ns div 3600000000000"
_DUCK_BUCKET = "epoch_ns(ts) // 3600000000000"

_DUCK_ARM = P.portable_arm_sql("bucket", "seed", 0.5)

# shared oracle CTE: per-bucket moments × seeds with portable arms
_DUCK_SEEDED = f"""
WITH m AS (
  SELECT {_DUCK_BUCKET} AS bucket, count(*) AS n,
         sum(value) AS s1, sum(value * value) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY bucket
), s AS (
  SELECT m.*, seed, {_DUCK_ARM} AS arm
  FROM m, (SELECT unnest(generate_series(0, {N_SEEDS - 1})) AS seed)
)"""

# bucket-level pooled t per seed from (possibly effect-injected) moments
def _duck_bucket_t(inject: float = 0.0) -> str:
    s1 = (
        f"CASE WHEN arm = 'On' THEN s1 + {inject} * n ELSE s1 END"
        if inject
        else "s1"
    )
    return f"""
, bm AS (
  SELECT seed, arm, ({s1}) * 1.0 / n AS bmean FROM s
), t AS (
  SELECT seed,
         count(*) FILTER (arm = 'On') AS g_on,
         count(*) FILTER (arm = 'Off') AS g_off,
         avg(bmean) FILTER (arm = 'On') AS m_on,
         avg(bmean) FILTER (arm = 'Off') AS m_off,
         coalesce(var_samp(bmean) FILTER (arm = 'On'), 0.0) AS v_on,
         coalesce(var_samp(bmean) FILTER (arm = 'Off'), 0.0) AS v_off
  FROM bm GROUP BY seed
), tt AS (
  SELECT seed, m_on - m_off AS mean_diff,
         CASE WHEN g_on > 1 AND g_off > 1
                   AND ((g_on-1)*v_on + (g_off-1)*v_off) > 0
              THEN sqrt(((g_on-1)*v_on + (g_off-1)*v_off) / (g_on + g_off - 2)
                        * (1.0/g_on + 1.0/g_off))
         END AS se
  FROM t
)"""


@query(
    "perm_mean_diff_dist",
    _DUCK_SEEDED
    + """
SELECT seed,
       CAST(sum(n) FILTER (arm = 'On') AS BIGINT) AS n_on,
       CAST(sum(n) FILTER (arm = 'Off') AS BIGINT) AS n_off,
       round(sum(s1) FILTER (arm = 'On') / sum(n) FILTER (arm = 'On')
             - sum(s1) FILTER (arm = 'Off') / sum(n) FILTER (arm = 'Off'), 6) AS mean_diff
FROM s GROUP BY seed
HAVING sum(n) FILTER (arm = 'On') > 0 AND sum(n) FILTER (arm = 'Off') > 0""",
)
def perm_mean_diff_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/T18: permutation distribution of the order-level mean difference over
    200 seeded re-randomizations of hourly buckets — the serial loop of
    method_evaluation.ipynb:269-300 as one distributed plan."""
    ev = load_table(spark, sf_dir, "events")
    d = P.permutation_mean_diffs(ev, "value", F.expr(_SPARK_BUCKET), N_SEEDS)
    return d.select("seed", "n_on", "n_off", F.round("mean_diff", 6).alias("mean_diff"))


@query(
    "perm_thresholds",
    _DUCK_SEEDED
    + """
, d AS (
  SELECT seed,
         sum(s1) FILTER (arm = 'On') / sum(n) FILTER (arm = 'On')
         - sum(s1) FILTER (arm = 'Off') / sum(n) FILTER (arm = 'Off') AS mean_diff
  FROM s GROUP BY seed
  HAVING sum(n) FILTER (arm = 'On') > 0 AND sum(n) FILTER (arm = 'Off') > 0
)
SELECT round(quantile_cont(mean_diff, 0.025), 6) AS lower,
       round(quantile_cont(mean_diff, 0.975), 6) AS upper,
       count(*) AS n_seeds
FROM d""",
)
def perm_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: adjusted-p significance thresholds = (2.5, 97.5) percentiles of the
    permutation distribution."""
    ev = load_table(spark, sf_dir, "events")
    d = P.permutation_mean_diffs(ev, "value", F.expr(_SPARK_BUCKET), N_SEEDS)
    t = P.permutation_thresholds(d)
    return t.select(
        F.round("lower", 6).alias("lower"),
        F.round("upper", 6).alias("upper"),
        "n_seeds",
    )


@query(
    "fpr_simulation",
    _DUCK_SEEDED
    + _duck_bucket_t()
    + f"""
SELECT round(avg(CASE WHEN se IS NOT NULL AND abs(mean_diff / se) > {CRIT}
                      THEN 1.0 ELSE 0.0 END), 6) AS fpr,
       count(*) AS n_sims
FROM tt""",
)
def fpr_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: A/A false-positive rate of the bucket-level t-test across 200
    re-randomizations — the reference's acceptance criterion (≈ 5%) computed in
    one plan instead of a serial scipy loop."""
    ev = load_table(spark, sf_dir, "events")
    r = P.fpr_simulation(ev, "value", F.expr(_SPARK_BUCKET), N_SEEDS, CRIT)
    return r.select(F.round("fpr", 6).alias("fpr"), "n_sims")


@query(
    "power_simulation",
    _DUCK_SEEDED
    + _duck_bucket_t(inject=EFFECT)
    + f"""
SELECT round(avg(CASE WHEN se IS NOT NULL AND abs(mean_diff / se) > {CRIT}
                      THEN 1.0 ELSE 0.0 END), 6) AS power,
       count(*) AS n_sims
FROM tt""",
)
def power_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: detection power for an injected +3.0 effect on the treated arm;
    injection is exact moment algebra (no second fact-table pass)."""
    ev = load_table(spark, sf_dir, "events")
    r = P.power_simulation(ev, "value", F.expr(_SPARK_BUCKET), N_SEEDS, EFFECT, CRIT)
    return r.select(F.round("power", 6).alias("power"), "n_sims")


@query(
    "ci_coverage_sim",
    _DUCK_SEEDED
    + _duck_bucket_t()
    + f"""
SELECT round(avg(CASE WHEN mean_diff - {CRIT} * se <= 0 AND mean_diff + {CRIT} * se >= 0
                      THEN 1.0 ELSE 0.0 END), 6) AS coverage,
       count(*) AS n_sims
FROM tt WHERE se IS NOT NULL""",
)
def ci_coverage_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: CI coverage under the null across re-randomizations (≈ 95% at the
    normal critical value)."""
    ev = load_table(spark, sf_dir, "events")
    r = P.ci_coverage(ev, "value", F.expr(_SPARK_BUCKET), N_SEEDS, CRIT)
    return r.select(F.round("coverage", 6).alias("coverage"), "n_sims")


# --------------------------------------------------------------------------- #
# assignment strategies (T12-T14)
# --------------------------------------------------------------------------- #


@query(
    "assign_random_portable",
    f"""WITH b AS (SELECT DISTINCT {_DUCK_BUCKET} AS bucket FROM events),
       a AS (SELECT bucket, {P.portable_arm_sql("bucket", "0", 0.5)} AS arm FROM b)
       SELECT arm, count(*) AS n_buckets FROM a GROUP BY arm""",
)
def assign_random_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: seeded Bernoulli(½) assignment per time unit (portable hash),
    value-diffed bucket-by-bucket via the arm histogram."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.select(F.expr(_SPARK_BUCKET).alias("bucket")).distinct()
    return (
        buckets.withColumn("arm", P.portable_arm("bucket", "0", 0.5))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )


@query(
    "assign_alternating",
    f"""WITH b AS (SELECT DISTINCT {_DUCK_BUCKET} AS bucket FROM events)
       SELECT CASE WHEN bucket % 2 = 0 THEN 'On' ELSE 'Off' END AS arm,
              count(*) AS n_buckets,
              CAST(min(bucket) AS BIGINT) AS first_bucket
       FROM b GROUP BY arm""",
)
def assign_alternating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14: strict deterministic On/Off alternation by bucket index
    (hr_interval_func_deterministic, deep_dive_analyses.ipynb:442-460)."""
    from switchback_test_dag_spark.plans.assignment import alternating_assignment

    ev = load_table(spark, sf_dir, "events")
    buckets = ev.select(F.expr(_SPARK_BUCKET).alias("bucket")).distinct()
    return (
        buckets.withColumn("arm", alternating_assignment("bucket"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("bucket").alias("first_bucket"),
        )
    )


@query(
    "assign_balanced_daily",
    f"""WITH b AS (SELECT DISTINCT CAST(ts AS DATE) AS day, {_DUCK_BUCKET} AS bucket FROM events),
       c AS (SELECT day, count(*) AS n FROM b GROUP BY day)
       SELECT strftime(day, '%Y-%m-%d') AS day,
              CAST(ceil(n / 2.0) AS BIGINT) AS n_on,
              CAST(floor(n / 2.0) AS BIGINT) AS n_off
       FROM c""",
)
def assign_balanced_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: balanced urn draw without replacement per day — exactly ⌈n/2⌉ On and
    ⌊n/2⌋ Off buckets per day (the oracle checks the balance invariant; the
    seeded shuffle itself is xxhash64-ordered, pytest-checked for determinism)."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr(_SPARK_BUCKET).alias("bucket"),
    ).distinct()
    assigned = balanced_assignment(buckets, "bucket", "day", seed=7)
    return assigned.groupBy("day").agg(
        F.count(F.when(F.col("assignment") == "On", 1)).alias("n_on"),
        F.count(F.when(F.col("assignment") == "Off", 1)).alias("n_off"),
    )


# --------------------------------------------------------------------------- #
# closed-form statistics with SQL oracles (T2/T4/T6 statistic halves)
# --------------------------------------------------------------------------- #


@query(
    "welch_by_event_type",
    f"""WITH lab AS (
         SELECT event_type, value,
                {P.portable_arm_sql(_DUCK_BUCKET, "0", 0.5)} AS arm
         FROM events WHERE value IS NOT NULL
       ), m AS (
         SELECT event_type,
                count(*) FILTER (arm = 'On') AS n_a,
                count(*) FILTER (arm = 'Off') AS n_b,
                avg(value) FILTER (arm = 'On') AS mean_a,
                avg(value) FILTER (arm = 'Off') AS mean_b,
                coalesce(var_samp(value) FILTER (arm = 'On'), 0.0) AS va_,
                coalesce(var_samp(value) FILTER (arm = 'Off'), 0.0) AS vb_
         FROM lab GROUP BY event_type
       )
       SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
              round(mean_a - mean_b, 6) AS mean_diff,
              round(sqrt(va_/n_a + vb_/n_b), 6) AS se,
              round((mean_a - mean_b) / sqrt(va_/n_a + vb_/n_b), 6) AS t_stat,
              round(pow(va_/n_a + vb_/n_b, 2)
                    / (pow(va_/n_a, 2)/(n_a-1) + pow(vb_/n_b, 2)/(n_b-1)), 6) AS dof
       FROM m WHERE n_a > 1 AND n_b > 1""",
)
def welch_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: Welch's t statistic (SQL-expressible half; the t-tail p-value is
    scipy-validated in tests/test_stats_reference.py) on portable-hash-labeled
    events per event_type."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "arm", P.portable_arm(_SPARK_BUCKET, "0", 0.5)
    )
    r = welch_t_test(
        ev, "value", "arm", "On", "Off", by=["event_type"], with_p=False
    )
    return r.filter((F.col("n_a") > 1) & (F.col("n_b") > 1)).select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_diff", 6).alias("mean_diff"),
        F.round("se", 6).alias("se"),
        F.round("t_stat", 6).alias("t_stat"),
        F.round("dof", 6).alias("dof"),
    )


@query(
    "crse_beta_se",
    f"""WITH lab AS (
         SELECT value AS y, {_DUCK_BUCKET} AS cluster,
                CASE WHEN {P.portable_arm_sql(_DUCK_BUCKET, "0", 0.5)} = 'On'
                     THEN 1.0 ELSE 0.0 END AS x
         FROM events WHERE value IS NOT NULL
       ), g AS (
         SELECT count(*) AS n, avg(x) AS xbar,
                avg(y) FILTER (x = 0.0) AS alpha,
                avg(y) FILTER (x = 1.0) - avg(y) FILTER (x = 0.0) AS beta
         FROM lab
       ), pc AS (
         SELECT cluster, sum((x - xbar) * (y - alpha - beta * x)) AS h
         FROM lab, g GROUP BY cluster, xbar, alpha, beta
       ), meat AS (
         SELECT sum(h * h) AS meat, count(*) AS n_clusters FROM pc
       )
       SELECT round(beta, 6) AS beta,
              round(sqrt((n_clusters * 1.0 / (n_clusters - 1)) * ((n - 1.0) / (n - 2))
                         * meat / pow(n * xbar * (1 - xbar), 2)), 6) AS se,
              CAST(n AS BIGINT) AS n, CAST(n_clusters AS BIGINT) AS n_clusters
       FROM g, meat""",
)
def crse_beta_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: cluster-robust OLS (CR1) beta and SE — the reference's recommended
    method — closed-form from two groupBys, value-diffed against the same
    algebra in SQL. dof/t/p halves are statsmodels-validated in tests."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "arm", P.portable_arm(_SPARK_BUCKET, "0", 0.5)
    ).withColumn("cluster", F.expr(_SPARK_BUCKET))
    r = crse_ols(ev, "value", "arm", "Off", "On", "cluster", with_p=False)
    return r.select(
        F.round("beta", 6).alias("beta"),
        F.round("se", 6).alias("se"),
        F.col("n").cast("long").alias("n"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
    )


# --------------------------------------------------------------------------- #
# assignment-strategy variants T15-T17 + split-balance T21
# --------------------------------------------------------------------------- #

_DUCK_BASE_ARM = P.portable_arm_sql("bucket", "0", 0.5)


@query(
    "assign_counterpart",
    f"""WITH b AS (SELECT DISTINCT {_DUCK_BUCKET} AS bucket, event_type AS city FROM events),
       a AS (SELECT city,
                    CASE WHEN city = 'error'
                         THEN (CASE WHEN {_DUCK_BASE_ARM} = 'On' THEN 'Off' ELSE 'On' END)
                         ELSE {_DUCK_BASE_ARM} END AS arm
             FROM b)
       SELECT city, arm, count(*) AS n_buckets FROM a GROUP BY city, arm""",
)
def assign_counterpart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15: counterpart (mirrored) assignment — the designated counterpart city
    runs the inverted arm of the shared per-bucket assignment
    (counterpart_method.ipynb:358-373). Value-diffed per (city, arm)."""
    from switchback_test_dag_spark.plans.assignment import counterpart_assignment

    ev = load_table(spark, sf_dir, "events")
    units = ev.select(
        F.expr(_SPARK_BUCKET).alias("bucket"), F.col("event_type").alias("city")
    ).distinct()
    arm = counterpart_assignment(P.portable_arm("bucket", "0", 0.5), "city", "error")
    return (
        units.withColumn("arm", arm)
        .groupBy("city", "arm")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )


_TC_UNIT = "concat(cast(bucket as string), '#', city)"


@query(
    "assign_time_city",
    f"""WITH b AS (SELECT DISTINCT {_DUCK_BUCKET} AS bucket, event_type AS city FROM events),
       a AS (SELECT city, {P.portable_arm_sql(_TC_UNIT, "0", 0.5)} AS arm FROM b)
       SELECT city, arm, count(*) AS n_buckets FROM a GROUP BY city, arm""",
)
def assign_time_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16: independent assignment per (time unit, city) pair
    (counterpart_method.ipynb:376-383) — the seeded hash keys on the composite
    unit, so two cities in the same bucket draw independently."""
    ev = load_table(spark, sf_dir, "events")
    units = ev.select(
        F.expr(_SPARK_BUCKET).alias("bucket"), F.col("event_type").alias("city")
    ).distinct()
    return (
        units.withColumn("arm", F.expr(P.portable_arm_sql(_TC_UNIT, "0", 0.5)))
        .groupBy("city", "arm")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )


@query(
    "assign_zone_flip",
    f"""WITH lab AS (
         SELECT event_type AS zone, value,
                CASE WHEN event_type = 'click'
                     THEN (CASE WHEN ({_DUCK_BUCKET}) % 2 = 0 THEN 'Off' ELSE 'On' END)
                     ELSE (CASE WHEN ({_DUCK_BUCKET}) % 2 = 0 THEN 'On' ELSE 'Off' END)
                END AS arm
         FROM events WHERE value IS NOT NULL
       )
       SELECT zone, arm, CAST(count(*) AS BIGINT) AS n_events,
              round(avg(value), 6) AS mean_value
       FROM lab GROUP BY zone, arm""",
)
def assign_zone_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17: 2-zone switchback flip — the designated zone runs the inverted
    status of the alternating bucket assignment, applied at fact-row grain
    (df_calc_func, deep_dive_analyses.ipynb:519-534)."""
    from switchback_test_dag_spark.plans.assignment import (
        alternating_assignment,
        zone_flip,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = alternating_assignment(F.expr(_SPARK_BUCKET))
    return (
        ev.select(
            F.col("event_type").alias("zone"),
            "value",
            zone_flip(base, F.col("event_type"), "click").alias("arm"),
        )
        .groupBy("zone", "arm")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("mean_value"),
        )
    )


@query(
    "split_balance_check",
    """WITH w AS (SELECT unnest([1, 4, 24]) AS window_hours),
       b AS (SELECT DISTINCT window_hours,
                    epoch_ns(ts) // (window_hours * 3600000000000) AS bucket
             FROM events, w),
       c AS (SELECT window_hours,
                    count(*) FILTER (bucket % 2 = 0) AS n_on,
                    count(*) FILTER (bucket % 2 != 0) AS n_off
             FROM b GROUP BY window_hours)
       SELECT window_hours, CAST(n_on AS BIGINT) AS n_on,
              CAST(n_off AS BIGINT) AS n_off,
              CAST(abs(n_on - n_off) AS BIGINT) AS imbalance
       FROM c""",
)
def split_balance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21: split-balance check — On vs Off bucket counts (and their imbalance)
    per switchback window size under the alternating assignment
    (split_check_func, deep_dive_analyses.ipynb:2619). One scan: window sizes
    exploded against the event stream, buckets deduped per size."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            "ts_ns",
            F.explode(F.array(F.lit(1), F.lit(4), F.lit(24))).alias("window_hours"),
        )
        .select(
            "window_hours",
            F.expr("ts_ns div (window_hours * 3600000000000)").alias("bucket"),
        )
        .distinct()
    )
    n_on = F.count(F.when(F.pmod("bucket", F.lit(2)) == 0, 1)).alias("n_on")
    n_off = F.count(F.when(F.pmod("bucket", F.lit(2)) != 0, 1)).alias("n_off")
    return b.groupBy("window_hours").agg(n_on, n_off).select(
        "window_hours",
        "n_on",
        "n_off",
        F.abs(F.col("n_on") - F.col("n_off")).alias("imbalance"),
    )
