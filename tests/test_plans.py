"""Physical-plan audits: pin the scale-critical properties of headline plans.

These guard the 100 TB design contract, not correctness: dimension joins must
broadcast (no shuffle of the fact side), parquet scans must receive pushed
filters and pruned schemas, and JVM-path queries must stay out of Python
(no ArrowEvalPython / BatchEvalPython nodes). A refactor that silently turns a
broadcast join into a sort-merge shuffle or drops pushdown fails here long
before it shows up in a benchmark.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from switchback_test_dag_spark import queries as q


def _plan(spark, name, sf_dir):
    df = q.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "revenue_by_segment", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_stays_hash_join(spark, sf_dir):
    # J5: equi keys must keep the temporal-range join a hash join, never a
    # cartesian/nested-loop over the fact table
    plan = _plan(spark, "temporal_range_join", sf_dir)
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    # aggregate pushdown pin: the BROADCAST side must be the (key, order-date)
    # pre-aggregation of orders — its grain is independent of |orders|, which
    # is what keeps it broadcastable and kills the K² pair expansion (the
    # un-pushed expanded form measured 188.7 s at the 100x point)
    import re

    bx = plan.index("BroadcastExchange")
    assert re.search(r"HashAggregate\(keys=\[jk#\d+L?, o_date#\d+", plan[bx:]), (
        "broadcast side is not the pre-aggregated orders frame"
    )


def test_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "filters_conjunctive", sf_dir)
    assert "PushedFilters: [" in plan
    # at least one concrete predicate reached the parquet reader
    assert "PushedFilters: []" not in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    # 2-column projection must not scan all 9 orders columns
    plan = _plan(spark, "topk_union_customers", sf_dir)
    start = plan.index("ReadSchema")
    read_schema = plan[start : plan.index("\n", start)]
    assert "o_comment" not in read_schema
    assert "o_orderdate" not in read_schema


def test_jvm_path_queries_have_no_python_nodes(spark, sf_dir):
    # Everything except the sanctioned Pandas-UDF operators must run entirely
    # JVM-side (whole-stage codegen territory). Sanctioned grouped-map ops
    # (FlatMapGroupsInPandas, e.g. doc_text_profile's packing contract) are
    # allowed; what this pins is that no SCALAR expression work fell off the
    # JVM path into per-row/ArrowEval Python
    for name in [
        "sb_metrics",
        "revenue_by_segment",
        "iqr_filtered_stats",
        "perm_dist_thresholds",
        "doc_text_profile",
        "doc_minhash_lsh_pairs",
    ]:
        plan = _plan(spark, name, sf_dir)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_aggregations_are_partial(spark, sf_dir):
    # map-side combine: two HashAggregate nodes (partial + final) around the
    # exchange, so the shuffle moves group aggregates, not raw rows
    plan = _plan(spark, "revenue_by_segment", sf_dir)
    assert plan.count("HashAggregate") >= 2


def test_elt_composition_plan_is_join_clean(spark, sf_dir):
    # the 8-stage ELT chain must fuse into broadcast/hash/SMJ joins only:
    # no cartesian or nested-loop anywhere in the composed tree, and the
    # point-in-zone append must ride the grid-cell equi-join, JVM-side
    plan = _plan(spark, "elt_orders_fact", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_sweep_and_finder_scan_once(spark, sf_dir):
    # the window-size sweep explodes windows onto ONE fact scan and pins the
    # moments frame so both method branches (bucket-t, order-t) read the
    # cache; the counterpart finder persists its means frame so its three
    # consumers (two self-join sides + per-city std) share a single fact scan
    try:
        plan = _plan(spark, "fpr_by_window_size", sf_dir)
        # fused_sweep_stats collapses the sweep to ONE aggregation over the
        # seeded frame, so the only pinned frame is the tiny (window, seed)
        # stats table, read exactly twice: the adjusted-p threshold
        # percentiles and the rate aggregation's join side. What matters at
        # 100 TB: the PARQUET fact scan, its moments shuffle, AND the
        # windows × buckets × seeds aggregation all run exactly once, at
        # cache materialization — nothing at the seeded grain is cached.
        assert plan.count("InMemoryTableScan") == 2
        assert "EvalPython" not in plan
    finally:
        from switchback_test_dag_spark.caching import release_all

        release_all()
    try:
        plan = _plan(spark, "counterpart_city_finder", sf_dir)
        # all three means consumers must read the persisted frame (the cached
        # subtree's printed description repeats the parquet text; the runtime
        # fact scan happens once, on first cache materialization)
        assert plan.count("InMemoryTableScan") == 3
        assert "CartesianProduct" not in plan
    finally:
        from switchback_test_dag_spark.design.counterpart import release_caches

        release_caches()


def test_date_partitioned_orders_prunes(spark, sf_dir, tmp_path):
    """SURVEY §4 layout: orders partitioned by order month must turn a date
    window into PartitionFilters (directory pruning at listing time), and the
    pruned read must return exactly the rows a full-scan filter returns."""
    from switchback_test_dag_spark.io import load_table
    from switchback_test_dag_spark.plans.layouts import (
        read_month_range,
        write_date_partitioned,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_month")
    write_date_partitioned(orders, path)

    win = read_month_range(spark, path, "1995-01", "1995-03")
    plan = win._jdf.queryExecution().executedPlan().toString()
    start = plan.index("PartitionFilters")
    pf = plan[start : plan.index("]", start) + 1]
    assert "order_month" in pf and pf != "PartitionFilters: []"

    expect = orders.filter(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").between(
            "1995-01", "1995-03"
        )
    ).count()
    assert win.count() == expect > 0


def test_time_clustered_events_have_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Range-clustered events must land in files whose [min ts, max ts]
    footer stats are pairwise disjoint — the property that lets a time-window
    scan skip whole files on stats alone (the switchback access pattern)."""
    import glob

    import pyarrow.parquet as pq

    from switchback_test_dag_spark.io import load_table
    from switchback_test_dag_spark.plans.layouts import write_time_clustered

    # cluster on the exact ts_ns long: int64 columns always carry footer
    # min/max stats (timestamp_ntz stats are writer-dependent)
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts_ns", "value")
    path = str(tmp_path / "events_by_ts")
    write_time_clustered(ev, path, ts_col="ts_ns", n_files=8)

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "ts_ns"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"file ranges overlap: {hi_a} > {lo_b}"
    # round-trip: no rows lost by the re-layout
    assert spark.read.parquet(path).count() == ev.count()


def test_welch_mde_single_fact_scan(spark, sf_dir):
    # welch_mde_by_event_type: the whole-group MDE moments ride the same
    # groupBy as the per-arm Welch moments — exactly one events scan, no join
    # back to a second aggregation of the fact
    plan = _plan(spark, "welch_mde_by_event_type", sf_dir)
    assert plan.count("Scan parquet") == 1
    assert "EvalPython" not in plan


def test_lineitem_stats_shares_cell_frame(spark, sf_dir):
    # lineitem_stats_suite: partial-aggregates at (flag, status) grain feed
    # BOTH the pivot and the flag-grain stats from one pinned ≤6-row frame
    try:
        plan = _plan(spark, "lineitem_stats_suite", sf_dir)
        # both consumers read the pinned cell frame (the cached subtree's
        # printed description repeats the parquet text per consumer; the
        # runtime fact scan happens once, on first cache materialization)
        assert plan.count("InMemoryTableScan") == 2  # pivot side + stats side
    finally:
        from switchback_test_dag_spark.caching import release_all

        release_all()


def test_winnow_plan_shares_fingerprint_scan(spark, sf_dir):
    # the winnow pair join persists the fingerprint frame: one documents scan,
    # all-JVM arrays, no cartesian
    try:
        plan = _plan(spark, "doc_winnow_pairs", sf_dir)
        # the pair self-join reads the BARRIERED capped-postings frame on
        # both sides (caching.barrier: the frame is rooted directly at its
        # InMemoryRelation, so the md5/winnowing work, the documents scan,
        # and the df-cap stage materialize once and are served from cache
        # per side; the parquet text below appears only inside the cached
        # subtree's printed description)
        assert plan.count("InMemoryTableScan") >= 2
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan
    finally:
        from switchback_test_dag_spark.text.dedup import release_caches

        release_caches()


def test_salted_join_keys_include_salt(spark, sf_dir):
    # the salted low-cardinality join must key on (jk, _salt) — widening the
    # reduce-task ceiling — and stay an equi join (never cartesian/NLJ)
    plan = _plan(spark, "salted_range_join_totals", sf_dir)
    assert "_salt" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_eliminates_shuffle(spark, sf_dir):
    # the 100-TB strategy for recurring big-x-big joins: both sides bucketed
    # by the join key -> SortMergeJoin with ZERO Exchange (and, with sorted
    # buckets, no Sort either); broadcast disabled to force the general case
    from switchback_test_dag_spark.io import load_table
    from switchback_test_dag_spark.plans.bucketing import (
        co_located_join,
        exchange_count,
        write_bucketed,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            ),
            "bkt_orders",
            ["o_custkey"],
            8,
            sort_keys=["o_custkey"],
        )
        write_bucketed(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ).withColumnRenamed("c_custkey", "o_custkey"),
            "bkt_customer",
            ["o_custkey"],
            8,
            sort_keys=["o_custkey"],
        )
        joined = co_located_join(spark, "bkt_orders", "bkt_customer", ["o_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert exchange_count(joined) == 0, plan
        # and it actually computes the right thing
        assert joined.count() == load_table(spark, sf_dir, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_cleaning_pipeline_plan_is_jvm_and_broadcasts_eval(spark, sf_dir):
    # the composed cleaning pipeline (quality -> dedup -> near-dup ->
    # decontamination -> weighted sample) must stay JVM-side end to end, keep
    # the eval gram set on a broadcast join, and never go cartesian
    plan = _plan(spark, "corpus_clean_stats", sf_dir)
    assert "EvalPython" not in plan, "cleaning pipeline fell off the JVM path"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# Queries whose plan CONTAINS a BroadcastNestedLoopJoin by design: each is a
# bounded scalar attach — crossJoin(broadcast(X)) where X is a 1-row (or
# metadata-bounded) aggregate — which is linear in the probe side. The
# forbidden shape is an UNBOUNDED nested-loop (both sides data-sized); any
# query not on this list growing a BNLJ is a defect (round 9 caught exactly
# that in dsir_select's constant-key max attach, since fixed).
_SCALAR_ATTACH_BNLJ = {
    "emb_near_dup_pairs",   # query vector / threshold scalar (vectors/similarity.py)
    "emb_cosine_topk",      # broadcast query-vector frame
    "emb_lsh_topk",         # broadcast query-vector frame
    "emb_ivf_topk",         # broadcast query-vector + probed-centroid set
    "perm_dist_thresholds", # global observed-stat scalar (queries_inference.py:123)
    "power_ci_sim",         # global power scalar attach (queries_inference.py:410)
    "crse_beta_se",         # no-group global moments attach (stats/crse.py:132,149)
    "events_scalar_suite",  # global min-max bounds attach (operators/relational.py:324)
    "keep_drop_flag_clean", # 16MB-capped combo-string scalar (documented exhibit)
}


def test_registry_wide_no_unbounded_nested_loop_joins(spark, sf_dir):
    """Every registry query's executed plan: CartesianProduct never appears,
    and BroadcastNestedLoopJoin appears only in the allowlisted bounded
    scalar-attach plans above — a new unintended nested loop anywhere in the
    50-query surface fails here, not in a 100 TB run."""
    unexpected = {}
    for name in q.QUERIES:
        plan = _plan(spark, name, sf_dir)
        if "CartesianProduct" in plan:
            unexpected[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in _SCALAR_ATTACH_BNLJ:
            unexpected[name] = "BroadcastNestedLoopJoin"
    assert not unexpected, unexpected


def test_single_scan_contracts(spark, sf_dir):
    """Queries whose round-10 audit removed duplicated scan subtrees must
    keep their scan counts: the IQR query is two passes over the fact
    (quantile fences, then filter+aggregate — exact_quantiles itself no
    longer re-evaluates its distinct-count scan for group totals), and the
    CRSE fit is two passes (global means, then residual scores — the fit
    constants ride the aggregations instead of re-joining the glob
    aggregate). Neither query caches anything, so raw text counts are
    runtime scan counts."""
    plan = _plan(spark, "iqr_filtered_stats", sf_dir)
    assert plan.count("Scan parquet") == 2
    assert "InMemoryTableScan" not in plan
    plan = _plan(spark, "crse_beta_se", sf_dir)
    assert plan.count("Scan parquet") == 2
    assert "InMemoryTableScan" not in plan


def test_no_new_duplicated_scans(spark, sf_dir):
    """The round-10 duplicated-scan sweep (tools/scan_audit.py), frozen as a
    regression gate: every registry query with an UNCACHED duplicated scan
    (imts=0 — the trustworthy suspects; cached plans over-count by printing
    each InMemoryRelation's child) must appear in the allowlist below with
    at most its audited excess. A NEW uncached duplicated-scan row, or an
    allowlisted query's excess GROWING, fails — registry changes must update
    the allowlist explicitly, with a reason.

    Allowlist reasons (the round-10 verdict's documented categories):
    - recall contracts scan the corpus for the approximate AND the exact
      path by design (emb_lsh_topk, emb_ivf_topk, emb_cosine_topk);
    - the ELT stage chain re-reads temp views by documented semantics
      (elt_orders_fact), and its tiny dims re-scan harmlessly
      (sb_metrics / sb_mwu_pvalues: nation);
    - two-branch exhibits read the same table once per contrasted mode
      (region_nation_explode_modes, orders_semi_anti_join,
      topk_union_customers, events_scalar_suite, keep_drop_flag_clean,
      doc_fingerprint_dups: corpus + planted-dup union);
    - two-pass statistics whose first pass produces a broadcast scalar
      (iqr_filtered_stats: fences then filter; crse_beta_se: means then
      scores; assign_spatial_battery: city set then assignment).
    """
    import sys as _sys

    _sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools")
    )
    from scan_audit import audit_registry

    ALLOWED_UNCACHED_EXCESS = {
        "emb_lsh_topk": 3,
        "emb_ivf_topk": 3,
        "emb_cosine_topk": 1,
        "elt_orders_fact": 2,
        "region_nation_explode_modes": 2,
        "orders_semi_anti_join": 2,
        "sb_mwu_pvalues": 1,
        "sb_metrics": 1,
        "topk_union_customers": 1,
        "keep_drop_flag_clean": 1,
        "iqr_filtered_stats": 1,
        "events_scalar_suite": 1,
        "doc_fingerprint_dups": 1,
        "crse_beta_se": 1,
        "assign_spatial_battery": 1,
    }
    errors: list[str] = []
    rows = audit_registry(
        spark, sf_dir,
        on_error=lambda name, exc: errors.append(f"{name}: {exc}"),
    )
    assert not errors, errors
    violations = {}
    for excess, _scans, _ntab, imts, name, dup in rows:
        if imts:
            continue  # cached plans over-count; eyeball via --show
        if excess > ALLOWED_UNCACHED_EXCESS.get(name, 0):
            violations[name] = (excess, dup)
    assert not violations, (
        "new or grown uncached duplicated scans (fix the plan or extend the "
        f"allowlist with a reason): {violations}"
    )


def test_no_window_partitioned_by_content_hash(spark, sf_dir):
    """Registry-wide pin (round-12): no WindowExec may partition by a
    CONTENT-HASH column. Content hashes (shingle hashes, fingerprints,
    minhash/simhash signatures, LSH band keys) are NATURAL keys with Zipfian
    skew — a boilerplate shingle can occur in a large fraction of all
    documents — and WindowExec routes every row of a partition key to ONE
    task with no skew mitigation (unlike groupBy, which partial-aggregates
    map-side, or joins, which AQE skew-splits). The round-11 audit found
    exactly one such stage (ngram_jaccard_pairs' df-count window, since
    replaced by groupBy + join); this test keeps the whole 50-query surface
    clean. Entity keys (doc, user_id, query_id, strata, ...) are fine —
    their per-key row counts are bounded by per-entity data, not by corpus-
    wide token popularity."""
    import re

    # base names (case-insensitive) that identify a content-derived hash key
    content_hash = re.compile(
        r"^(h|sh|fp|fingerprint|sig\w*|minh\w*|simhash\w*|band\w*|shingle\w*"
        r"|\w*hash\w*)$",
        re.IGNORECASE,
    )
    offenders: dict[str, set[str]] = {}
    for name in q.QUERIES:
        plan = _plan(spark, name, sf_dir)
        for line in plan.splitlines():
            if "Window " not in line:
                continue
            # physical text: Window [funcs], [partSpec](, [orderSpec])? —
            # bracket group 1 (0-based) is the partition spec; group 0 (the
            # window functions) never nests square brackets in this codebase
            groups = re.findall(r"\[([^\[\]]*)\]", line)
            if len(groups) < 2:
                continue
            for col in groups[1].split(","):
                base = col.strip().split("#")[0]
                if base and content_hash.match(base):
                    offenders.setdefault(name, set()).add(base)
    assert not offenders, (
        "WindowExec partitioned by a content-hash column (Zipf-skewed natural "
        "key through an unmitigated single-task-per-key operator — use "
        f"groupBy + join instead): {offenders}"
    )


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The Z-order layout's whole point, MEASURED from written footers: with
    two independent filter columns, every file's (min, max) stats box is
    small in BOTH dimensions, so a slice predicate on EITHER column can
    skip most files on stats alone — where single-column range clustering
    prunes its own column and nothing else. Computed as the stats-based
    skipping set (files whose box intersects the predicate), the honest
    quantity a reader's footer filter uses."""
    import glob

    import pyarrow.parquet as pq

    from switchback_test_dag_spark.plans.layouts import (
        write_time_clustered,
        write_zorder_clustered,
    )

    n = 20_000
    df = spark.range(n).selectExpr(
        "id",
        "id % 1000 AS x",
        "CAST(pmod(id * 2654435761, 1000) AS BIGINT) AS y",  # independent of x
    )
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xrange")
    write_zorder_clustered(df, zpath, "x", "y", n_files=16)
    write_time_clustered(df, xpath, ts_col="x", n_files=16)

    def boxes(path, cols):
        out = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            box = {}
            for c in cols:
                ci = next(
                    i for i in range(md.num_columns)
                    if md.row_group(0).column(i).path_in_schema == c
                )
                stats = [
                    md.row_group(rg).column(ci).statistics
                    for rg in range(md.num_row_groups)
                ]
                box[c] = (min(s.min for s in stats), max(s.max for s in stats))
            out.append(box)
        return out

    def touched(bxs, col, lo, hi):
        return sum(1 for b in bxs if not (b[col][1] < lo or b[col][0] > hi))

    zb = boxes(zpath, ["x", "y"])
    xb = boxes(xpath, ["x", "y"])
    assert len(zb) == len(xb) == 16
    # 10%-of-range slices on each dimension
    z_x, z_y = touched(zb, "x", 100, 199), touched(zb, "y", 100, 199)
    x_x, x_y = touched(xb, "x", 100, 199), touched(xb, "y", 100, 199)
    # single-column layout: perfect on its own column, useless on the other
    assert x_x <= 3
    assert x_y == 16
    # z-order: BOTH dimensions prune (Morton locality: ~sqrt-fraction of
    # files per 1-D slice; deterministic data, so exact counts are stable)
    assert z_x <= 8 and z_y <= 8, (z_x, z_y)
    # and nothing was lost in the re-layout
    assert spark.read.parquet(zpath).count() == n


def test_barrier_truncates_plan_and_releases_cache(spark):
    """caching.barrier — the plan-size primitive behind the dedup/pipeline
    pins: (1) rows match the plain-pin path exactly; (2) the returned frame
    is rooted directly at the CacheManager's InMemoryRelation LEAF, so a
    self-join of the barriered frame analyzes O(1) nodes instead of copying
    the upstream lineage per side; (3) release_all unpersists the underlying
    cache entry (the registry holds the ORIGINAL persisted frame)."""
    from switchback_test_dag_spark.caching import barrier, pin, release_all

    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("v")
    )
    chained = base.filter(F.col("v") % 2 == 0).groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    expected = {(r["k"], r["s"], r["n"]) for r in pin(chained).collect()}
    release_all()

    b = barrier(chained)
    plan = b._jdf.queryExecution().logical()
    assert plan.getClass().getSimpleName() == "InMemoryRelation"
    assert plan.children().size() == 0  # a leaf: downstream ops walk O(1)
    # self-join of the barriered frame: the analyzed tree holds exactly the
    # two cache leaves — the upstream lineage (range/filter/aggregate) is
    # not IN this plan, so DeduplicateRelations has nothing to deep-copy
    joined = b.alias("a").join(b.alias("b"), "k").where("a.s = b.s")
    leaves = joined._jdf.queryExecution().analyzed().collectLeaves()
    assert leaves.size() == 2
    for i in range(2):
        assert leaves.apply(i).getClass().getSimpleName() == "InMemoryRelation"
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert jplan.count("InMemoryTableScan") == 2
    assert {(r["k"], r["s"], r["n"]) for r in b.collect()} == expected

    # the cache is registered (and therefore releasable) through the
    # CacheManager; release_all must leave it empty, not leak the entry
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty()
    release_all()
    assert cm.isEmpty(), "release_all must unpersist the barriered cache entry"


def test_barrier_reroot_canary_fails_loud_on_fallback(spark):
    """CANARY, not a skip: caching.barrier's plan re-root reaches Spark
    internals (``sql.classic.Dataset.ofRows`` + ``CacheManager
    .lookupCachedData``), and its fallback silently returns the un-truncated
    pin — semantics identical, but the corpus pipeline's driver-side plan
    build re-inflates by ~10 s with no other test going red. This test FAILS
    the moment the internal path stops resolving (e.g. a Spark upgrade moving
    the package), naming the exact mechanism, so the regression is loud."""
    from switchback_test_dag_spark.caching import barrier, release_all

    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("k"))
    try:
        b = barrier(df.groupBy("k").count())
        root = b._jdf.queryExecution().logical()
        assert root.getClass().getSimpleName() == "InMemoryRelation", (
            "caching.barrier FELL BACK to the plain pin: the re-root through "
            "org.apache.spark.sql.classic.Dataset.ofRows / "
            "CacheManager.lookupCachedData no longer resolves on this Spark "
            "version — the plan-size truncation is silently lost (see "
            "OPTIMIZATION_r13.md §9); update caching.barrier for the new "
            "internal API instead of relying on the fallback"
        )
    finally:
        release_all()


def test_doc_text_profile_text_pin_gate_paths_agree(spark, sf_dir):
    """The size gate (queries_documents._TEXT_PIN_MAX_BYTES) switches
    doc_text_profile between pinning the text column (small inputs) and
    per-branch pruned parquet scans (large inputs / unknown size). Both
    paths must produce IDENTICAL rows — the gate is a physical-plan choice,
    never a result choice."""
    import switchback_test_dag_spark.queries_documents as QD
    from switchback_test_dag_spark.caching import release_all

    old = QD._TEXT_PIN_MAX_BYTES
    try:
        QD._TEXT_PIN_MAX_BYTES = 1 << 62  # force the pin path
        pinned = {tuple(r) for r in QD.doc_text_profile(spark, sf_dir).collect()}
        release_all()
        QD._TEXT_PIN_MAX_BYTES = 0  # force the scan path
        scanned = {tuple(r) for r in QD.doc_text_profile(spark, sf_dir).collect()}
        release_all()
    finally:
        QD._TEXT_PIN_MAX_BYTES = old
        release_all()
    assert pinned == scanned and len(pinned) > 0
