"""Relational operator queries (SURVEY §2.2-§2.7) over the driver fixture tables,
each with a DuckDB oracle. Registered into ``queries.QUERIES`` on import.

Conventions: counts stay BIGINT on both engines (DuckDB ``count(...)`` not
``sum(case)``), doubles are rounded identically on both sides, timestamps are
output as epoch-second BIGINTs or DATE/strings (never raw timestamps — the events
fixture is ns-precision which Spark cannot represent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.operators import relational as R
from switchback_test_dag_spark.plans.buckets import hr_interval, time_bucket
from switchback_test_dag_spark.queries import query


# --- J1/J2/A7: array build + explode round-trips --------------------------------


@query(
    "region_nation_explode",
    """SELECT r_name, n_name FROM region JOIN nation ON r_regionkey = n_regionkey""",
)
def region_nation_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: CROSS JOIN UNNEST round-trip — collect nations per region into an
    array, explode back (ELT.sql:14,51)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    arrays = nation.groupBy("n_regionkey").agg(
        F.array_sort(F.collect_list("n_name")).alias("names")
    )
    joined = region.join(arrays, region.r_regionkey == arrays.n_regionkey)
    return R.explode_drop_empty(joined, "names", "n_name").select("r_name", "n_name")


@query(
    "region_nation_explode_outer",
    """SELECT r_name, n.n_name
       FROM region r LEFT JOIN nation n
         ON r.r_regionkey = n.n_regionkey AND n.n_nationkey % 7 = 0""",
)
def region_nation_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: LEFT JOIN UNNEST — regions whose array is empty survive with NULL
    (ELT.sql:15,52-53)."""
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") % 7 == 0)
    region = load_table(spark, sf_dir, "region")
    arrays = nation.groupBy("n_regionkey").agg(
        F.array_sort(F.collect_list("n_name")).alias("names")
    )
    joined = region.join(
        arrays, region.r_regionkey == arrays.n_regionkey, "left"
    )
    return R.explode_keep_empty(joined, "names", "n_name").select("r_name", "n_name")


# --- W1/W3: windows --------------------------------------------------------------


@query(
    "supplier_dense_rank_tg",
    """SELECT s_name,
              'TG' || CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS VARCHAR) AS tg_name
       FROM supplier""",
)
def supplier_dense_rank_tg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: DENSE_RANK target-group naming (ELT.sql:36)."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_name", R.dense_rank_name(["s_nationkey"], "s_suppkey").alias("tg_name")
    )


@query(
    "latest_event_per_user",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us
       FROM events
       QUALIFY epoch_us(ts) = max(epoch_us(ts)) OVER (PARTITION BY user_id)""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: MAX() OVER + QUALIFY — newest row per key (propagation notebook
    surge-config versioning). µs precision on both engines (DuckDB reads the
    parquet ns timestamp µs-truncated)."""
    # integer `div`, NOT float division: ns epochs exceed double's 53-bit mantissa
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    return R.qualify_latest(ev, ["user_id"], "ts_us").select(
        "user_id", "event_id", "ts_us"
    )


# --- J6: semi/anti joins ---------------------------------------------------------


@query(
    "orders_semi_join_rich_customers",
    """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
       GROUP BY o_orderpriority""",
)
def orders_semi_join_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: tuple semi-join replacing the reference's CONCAT-key IN-subquery
    (ELT.sql:337-352)."""
    orders = load_table(spark, sf_dir, "orders")
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return (
        R.semi_join_on_keys(orders, rich, ["o_custkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "orders_anti_join_poor_customers",
    """SELECT o_orderstatus, count(*) AS n
       FROM orders
       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
       GROUP BY o_orderstatus""",
)
def orders_anti_join_poor_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 complement: NOT-IN exclusion as a left-anti join (ELT.sql:345-346)."""
    orders = load_table(spark, sf_dir, "orders")
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return (
        R.anti_join_on_keys(orders, rich, ["o_custkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- J5: equi + range (temporal/conditional) join --------------------------------


@query(
    "temporal_range_join",
    """WITH e AS (
         SELECT event_type, user_id,
                DATE '1995-01-01' + CAST((epoch_ns(ts) // 86400000000000) % 2400 AS INT) AS ev_date
         FROM events
       )
       SELECT e.event_type, count(*) AS n_pairs,
              round(sum(o.o_totalprice), 2) AS total
       FROM e JOIN orders o
         ON o.o_custkey % 15 = e.user_id
        AND CAST(o.o_orderdate AS DATE) BETWEEN e.ev_date - 2 AND e.ev_date + 2
       GROUP BY e.event_type""",
)
def temporal_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: mixed equi + BETWEEN join (orders ↔ target-group schedule semantics,
    ELT.sql:313-326). The equi key keeps it a hash join; the range predicate is
    applied post-probe. Event days are mapped into the orders era (the fixtures'
    eras are disjoint) so the range predicate genuinely selects."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            (F.expr("ts_ns div 86400000000000") % 2400).cast("int"),
        ).alias("ev_date"),
    )
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (orders.o_custkey % 15 == ev.user_id)
        & F.to_date(orders.o_orderdate).between(
            F.date_sub(ev.ev_date, 2), F.date_add(ev.ev_date, 2)
        )
    )
    return (
        ev.join(orders, cond)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# --- J3/J8: multi-key joins + aggregation ---------------------------------------


@query(
    "revenue_by_segment",
    """SELECT c_mktsegment, count(*) AS n_lines,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: chained multi-key equi left joins to dimensions, broadcast small side
    (ELT.sql:297-312)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


# --- P3/P4: filters and distinct -------------------------------------------------


@query(
    "filters_conjunctive",
    """SELECT p_type, count(*) AS n, round(sum(l_quantity), 2) AS qty
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_returnflag = 'R'
         AND p_name LIKE '%widget%'
         AND p_brand NOT LIKE 'Brand#1%'
         AND l_quantity BETWEEN 5 AND 45
       GROUP BY p_type""",
)
def filters_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: conjunctive pushdown-style predicates — date ≥, equality, LIKE,
    NOT LIKE, BETWEEN (ELT.sql:16-19,191-196,334-354)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(5, 45)
        )
        .join(broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("p_name").like("%widget%") & ~F.col("p_brand").like("Brand#1%"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@query(
    "distinct_status_priority",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: SELECT DISTINCT dedup (ELT.sql:8,26,98,116)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


# --- P7/A11: IQR outlier removal -------------------------------------------------


@query(
    "iqr_filtered_stats",
    """WITH b AS (
         SELECT l_returnflag,
                quantile_cont(l_extendedprice, 0.25) AS q1,
                quantile_cont(l_extendedprice, 0.75) AS q3
         FROM lineitem GROUP BY l_returnflag
       )
       SELECT l.l_returnflag, count(*) AS n, round(avg(l_extendedprice), 2) AS avg_price
       FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
       WHERE l.l_extendedprice BETWEEN q1 - 1.5 * (q3 - q1) AND q3 + 1.5 * (q3 - q1)
       GROUP BY l.l_returnflag""",
)
def iqr_filtered_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/A11: per-group IQR fence filter then stats
    (deep_dive_analyses.ipynb:2410-2414)."""
    li = load_table(spark, sf_dir, "lineitem")
    kept = R.iqr_filter(li, ["l_extendedprice"], by=["l_returnflag"])
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
    )


# --- A7: sorted string aggregation ----------------------------------------------


@query(
    "nation_csv_per_region",
    """SELECT r_name, string_agg(n_name, ', ' ORDER BY n_name) AS nations
       FROM region JOIN nation ON r_regionkey = n_regionkey
       GROUP BY r_name""",
)
def nation_csv_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: ARRAY_AGG(... ORDER BY ...) + ARRAY_TO_STRING (ELT.sql:61,140,395)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .groupBy("r_name")
        .agg(R.string_agg_sorted("n_name", distinct=False).alias("nations"))
    )


# --- A12/A13: pivot + correlation ------------------------------------------------


@query(
    "pivot_flag_status",
    """SELECT l_returnflag,
              count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F,
              count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O
       FROM lineitem GROUP BY l_returnflag""",
)
def pivot_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: groupBy().pivot() matrix (propagation_effect_analysis.ipynb:483-484)."""
    li = load_table(spark, sf_dir, "lineitem")
    return R.pivot_matrix(li, "l_returnflag", "l_linestatus", ["F", "O"], F.count(F.lit(1)))


@query(
    "corr_qty_price",
    """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
       FROM lineitem GROUP BY l_returnflag""",
)
def corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: column correlation (counterpart_method.ipynb:299)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"))
    )


# --- A9/A10: grouped std-error, two-level aggregation ---------------------------


@query(
    "sem_by_event_type",
    """SELECT event_type, count(value) AS n,
              round(stddev_samp(value), 6) AS sd,
              round(stddev_samp(value) / sqrt(count(value)), 6) AS sem
       FROM events GROUP BY event_type""",
)
def sem_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: grouped std / standard-error-of-mean (method_evaluation.ipynb:679-699)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.stddev_samp("value") / F.sqrt(F.count("value")), 6).alias("sem"),
    )


@query(
    "bucket_means_two_level",
    """WITH b AS (
         SELECT event_type,
                CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
                avg(value) AS bucket_mean
         FROM events GROUP BY event_type, bucket
       )
       SELECT event_type, count(*) AS n_buckets,
              round(avg(bucket_mean), 6) AS mean_of_means,
              round(stddev_samp(bucket_mean), 6) AS sd_of_means
       FROM b GROUP BY event_type""",
)
def bucket_means_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 + F18: bucket means then mean/std across buckets — the time-unit
    aggregation at the heart of switchback inference
    (switchback_analysis.ipynb:~246-268)."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.withColumn(
            "bucket", (F.floor(F.col("ts_ns") / F.lit(3_600_000_000_000)) * 3600).cast("long")
        )
        .groupBy("event_type", "bucket")
        .agg(F.avg("value").alias("bucket_mean"))
    )
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.avg("bucket_mean"), 6).alias("mean_of_means"),
        F.round(F.stddev_samp("bucket_mean"), 6).alias("sd_of_means"),
    )


# --- A4/A8/A15 -------------------------------------------------------------------


@query(
    "ratio_of_aggregates",
    """SELECT event_type,
              round(sum(value) / count(DISTINCT event_id), 6) AS value_per_event
       FROM events GROUP BY event_type""",
)
def ratio_of_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: group sum / distinct count in one agg (deep_dive_analyses customer
    KPIs)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.sum("value") / F.countDistinct("event_id"), 6).alias(
            "value_per_event"
        )
    )


@query(
    "value_counts_by_day",
    """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, count(*) AS n
       FROM events GROUP BY event_type, day""",
)
def value_counts_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: value_counts per key/day (random_choice_of_zones, CI notebooks).
    Day as ISO string on both engines (pandas date-vs-timestamp hash parity)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "affected_share",
    """SELECT l_returnflag,
              round(avg(CASE WHEN l_discount = 0 THEN 1.0 ELSE 0.0 END), 6) AS zero_discount_share
       FROM lineitem GROUP BY l_returnflag""",
)
def affected_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: share of affected rows via avg(indicator)
    (CI_for_different_datasets.ipynb:873)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.avg(F.when(F.col("l_discount") == 0, 1.0).otherwise(0.0)), 6
            ).alias("zero_discount_share")
        )
    )


# --- O2/O3: top-k, union ---------------------------------------------------------


@query(
    "topk_customers",
    """SELECT c_custkey, round(sum(o_totalprice), 2) AS spend
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_custkey
       ORDER BY spend DESC, c_custkey LIMIT 10""",
)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: deterministic top-k (sort_values + head) with key tiebreak
    (random_choice_of_zones_question.ipynb:~104-110)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .orderBy(F.desc("spend"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "union_order_slices",
    """SELECT o_orderstatus, count(*) AS n FROM (
         SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000
         UNION ALL
         SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
       ) GROUP BY o_orderstatus""",
)
def union_order_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: pd.concat row-stack ≡ unionByName (automated_...py:147-150)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 200000).select("o_orderstatus")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus")
    return a.unionByName(b).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


# --- F6-F9, F18-F19, F24, F4/F5, F1, P9 -----------------------------------------


@query(
    "weekday_orders",
    """SELECT dayname(o_orderdate) AS weekday,
              CAST(day(o_orderdate) % 2 AS BIGINT) AS even_day,
              count(*) AS n
       FROM orders GROUP BY weekday, even_day""",
)
def weekday_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F9: FORMAT_DATE('%A') weekday name + MOD(day, 2) even/odd split
    (ELT.sql:205,208,319)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format("o_orderdate", "EEEE").alias("weekday"),
        (F.dayofmonth("o_orderdate") % 2).cast("long").alias("even_day"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "bucket_4h_counts",
    """SELECT CAST(FLOOR(epoch_ns(ts) / 14400000000000) * 14400 AS BIGINT) AS bucket_epoch,
              count(*) AS n, round(sum(value), 4) AS total_value
       FROM events GROUP BY bucket_epoch ORDER BY bucket_epoch LIMIT 50""",
)
def bucket_4h_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18: arbitrary tumbling window (dt.floor('4H')) via epoch arithmetic
    (method_evaluation.ipynb:~397)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.floor(F.col("ts_ns") / F.lit(14_400_000_000_000)) * 14400)
            .cast("long")
            .alias("bucket_epoch")
        )
        .agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
        )
        .orderBy("bucket_epoch")
        .limit(50)
    )


@query(
    "hr_interval_labels",
    """SELECT '[' || printf('%.2f', FLOOR((hour(ts) + minute(ts)/60.0 + second(ts)/3600.0) / 0.5) * 0.5)
              || ', ' || printf('%.2f', FLOOR((hour(ts) + minute(ts)/60.0 + second(ts)/3600.0) / 0.5) * 0.5 + 0.5)
              || ')' AS interval_label,
              count(*) AS n
       FROM events GROUP BY interval_label""",
)
def hr_interval_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19: pd.cut(right=False) half-open hour-of-day intervals as O(1) arithmetic
    (deep_dive_analyses.ipynb:371-462)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(hr_interval("ts", 0.5).alias("interval_label")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "minmax_norm_by_type",
    """WITH m AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
       SELECT event_type, round(avg((value - lo) / (hi - lo)), 6) AS avg_norm
       FROM events, m GROUP BY event_type""",
)
def minmax_norm_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24: global min-max normalization then per-group mean
    (deep_dive_analyses.ipynb:~2739)."""
    ev = load_table(spark, sf_dir, "events")
    normed = R.minmax_normalize_global(ev, "value", "norm")
    return normed.groupBy("event_type").agg(
        F.round(F.avg("norm"), 6).alias("avg_norm")
    )


@query(
    "regexp_customer_ids",
    """SELECT CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS cust_num,
              c_mktsegment
       FROM customer
       WHERE CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) % 2 = 0""",
)
def regexp_customer_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: regexp_extract id parsing (ELT.sql:72-90; automated_...py:35-36)."""
    cust = load_table(spark, sf_dir, "customer")
    num = F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long")
    return cust.select(num.alias("cust_num"), "c_mktsegment").filter(
        F.col("cust_num") % 2 == 0
    )


@query(
    "concat_composite_keys",
    """SELECT c_mktsegment || ' | ' || n_name AS seg_nation_key, count(*) AS n
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY seg_nation_key""",
)
def concat_composite_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: CONCAT(a, ' | ', b) composite keys (ELT.sql:36,123,140,295)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.concat_ws(" | ", "c_mktsegment", "n_name").alias("seg_nation_key")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "case_price_tiers",
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                   WHEN o_totalprice < 150000 THEN 'mid'
                   ELSE 'high' END AS tier,
              count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
       FROM orders GROUP BY tier""",
)
def case_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P10: np.select / np.where multi-branch conditional
    (automated_...py:115-121)."""
    orders = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return orders.groupBy(tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@query(
    "sof_formula",
    """SELECT l_returnflag,
              round(sum(CASE WHEN l_extendedprice >= 1000 THEN 0.0
                             ELSE 1000.0 - l_extendedprice END), 2) AS sof_total
       FROM lineitem GROUP BY l_returnflag""",
)
def sof_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: small-order-fee formula IF(gfv − mov ≥ 0, 0, mov − gfv)
    (ELT.sql:264)."""
    li = load_table(spark, sf_dir, "lineitem")
    sof = F.when(F.col("l_extendedprice") >= 1000, 0.0).otherwise(
        F.lit(1000.0) - F.col("l_extendedprice")
    )
    return li.groupBy("l_returnflag").agg(F.round(F.sum(sof), 2).alias("sof_total"))


@query(
    "json_props_extract",
    """SELECT event_type,
              round(avg(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)), 6) AS avg_k
       FROM events GROUP BY event_type""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: extract a typed field from the JSON-ish props payload (regexp
    on both engines; Spark's get_json_object would also work)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    return ev.groupBy("event_type").agg(F.round(F.avg(k), 6).alias("avg_k"))


# --- S2/P2/P8/F21: script runner, * EXCEPT, keep/drop flag, number format ------


_SCRIPT = """
DECLARE status_var ARRAY<STRING>;
SET status_var = ['F', 'O'];
-- stage 1: filtered projection (pushdown-friendly)
CREATE OR REPLACE TABLE stage_filtered AS
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE o_orderstatus IN UNNEST(status_var);
-- stage 2: aggregate over stage 1
CREATE OR REPLACE TABLE stage_agg AS
  SELECT o_orderpriority, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price
  FROM stage_filtered GROUP BY o_orderpriority;
SELECT * FROM stage_agg
"""


@query(
    "sql_script_stages",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
              round(sum(o_totalprice), 2) AS total_price
       FROM orders WHERE o_orderstatus IN ('F', 'O')
       GROUP BY o_orderpriority""",
)
def sql_script_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S6: multi-statement script runner with DECLARE/SET array variables and
    staged CREATE OR REPLACE TABLE materialization (run_sql_queries.py:5-18,
    ELT.sql:3-4). The oracle is the fused single-statement equivalent — Catalyst
    collapses the temp-view chain to the same plan."""
    from switchback_test_dag_spark.sql_script import run_script

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return run_script(spark, _SCRIPT)


@query(
    "region_except_comment",
    """SELECT r_regionkey, r_name FROM region""",
)
def region_except_comment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: SELECT * EXCEPT(...) — re-materialize minus excluded columns
    (ELT.sql:60,427-430)."""
    return load_table(spark, sf_dir, "region").drop("r_comment")


@query(
    "keep_drop_flag_clean",
    """WITH valid AS (
         SELECT string_agg(DISTINCT o_orderpriority || ' | ' || CAST(o_custkey % 400 AS VARCHAR), ', '
                           ORDER BY o_orderpriority || ' | ' || CAST(o_custkey % 400 AS VARCHAR)) AS combos
         FROM orders WHERE o_totalprice > 400000
       ), flagged AS (
         SELECT CASE WHEN v.combos LIKE '%' || (o.o_orderpriority || ' | ' || CAST(o.o_custkey % 400 AS VARCHAR)) || '%'
                     THEN 'Keep' ELSE 'Drop' END AS keep_drop_flag
         FROM orders o, valid v
       )
       SELECT keep_drop_flag, CAST(count(*) AS BIGINT) AS n_orders
       FROM flagged GROUP BY keep_drop_flag""",
)
def keep_drop_flag_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/A7: keep/drop flag built by LIKE-matching each row's composite key
    against a sorted string-agg of valid combos (ELT.sql:295,436-442 — the
    CONCAT-hack preserved for parity; the semi-join re-expression is
    orders_semi_join_rich_customers)."""
    orders = load_table(spark, sf_dir, "orders")
    combo = F.concat_ws(
        " | ", F.col("o_orderpriority"), (F.col("o_custkey") % 400).cast("string")
    )
    valid = orders.filter(F.col("o_totalprice") > 400000).select(
        F.array_join(
            F.array_sort(F.collect_set(combo)), ", "
        ).alias("combos")
    )
    return (
        orders.crossJoin(broadcast(valid))
        .select(
            F.when(F.col("combos").contains(combo), F.lit("Keep"))
            .otherwise(F.lit("Drop"))
            .alias("keep_drop_flag")
        )
        .groupBy("keep_drop_flag")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "totals_formatted",
    """SELECT o_orderpriority,
              format('{:,}', CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)) AS BIGINT)) AS total_fmt
       FROM orders GROUP BY o_orderpriority""",
)
def totals_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21: thousands-separator display formatting of grouped totals
    (automated_...py:152-153 '{:,}'.format). Exact decimal sum keeps the
    rounded total order-independent across engines."""
    orders = load_table(spark, sf_dir, "orders")
    total = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    return orders.groupBy("o_orderpriority").agg(
        F.format_number(F.round(total, 0), 0).alias("total_fmt")
    )


@query(
    "orders_rollup_counts",
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
              coalesce(o_orderstatus, 'ALL') AS status,
              count(*) AS n,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
       FROM orders
       GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def orders_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotal rollup (priority → status → grand total) — the
    grouping-sets extension SURVEY §2.4 flags as available beyond the
    reference. One shuffle computes all three levels; NULL grouping keys are
    labeled 'ALL' so the output is oracle-comparable."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "n_customers",
        )
    )


@query(
    "events_asof_latest_order",
    """WITH o AS (
         SELECT o_custkey, epoch_us(o_orderdate) AS o_us,
                max(o_orderkey) AS o_orderkey,
                round(arg_max(o_totalprice, o_orderkey), 2) AS o_totalprice
         FROM orders GROUP BY o_custkey, o_us
       ), e AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
       )
       SELECT e.event_id, e.user_id, e.ts_us, o.o_orderkey, o.o_totalprice
       FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts_us >= o.o_us""",
)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the issuing customer's most recent order
    at-or-before the event time — the operator the brief's custom-op list
    names (Spark lacks ASOF JOIN; DuckDB's native ASOF is the oracle).
    Implemented as the union + sort-window composition
    (operators/relational.asof_join_backward): one shuffle on the key, no
    range-join pair explosion. Right side pre-deduped per (key, time) with a
    max-orderkey keeper so both engines' tie handling is pinned."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id"),
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey"),
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
            ).alias("o_us"),
        )
        .agg(
            F.max(F.struct("o_orderkey", "o_totalprice")).alias("_m"),
        )
        .select(
            "o_custkey",
            "o_us",
            F.col("_m.o_orderkey").alias("o_orderkey"),
            F.round("_m.o_totalprice", 2).alias("o_totalprice"),
        )
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = R.asof_join_backward(
        ev, orders, on="user_id", left_time="ts_us", right_time="o_us",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select("event_id", "user_id", "ts_us", "o_orderkey", "o_totalprice")


@query(
    "event_sessions",
    """WITH e AS (
         SELECT user_id, epoch_us(ts) AS us FROM events
       ), m AS (
         SELECT user_id, us,
                CASE WHEN us - lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
       ), s AS (
         SELECT user_id,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS UNBOUNDED PRECEDING) AS sid
         FROM m
       ), per_session AS (
         SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY user_id, sid
       )
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
              CAST(max(n_events) AS BIGINT) AS max_session_events
       FROM per_session GROUP BY user_id""",
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: events within a 30-minute inactivity gap merge
    into one session (``session_window`` — dynamic-length windows merged by the
    aggregation itself, the streaming-ready form). The oracle is the classic
    gaps-and-islands lag/cumsum SQL; a new session starts when the gap is
    ≥ 30 min, matching session_window's [start, last+gap) close rule. One
    shuffle keyed on user; session merge is per-key sort logic."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    per_session = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
    )
