#!/usr/bin/env python
"""Benchmark harness — runs EVERY registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with a count() (full evaluation, no driver transfer cost);
a warmup query amortizes JVM/codegen startup so timings reflect plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from switchback_test_dag_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# per-query wall cap (seconds; 0 disables): a hung or runaway query at a big
# scale factor must cost its own slot, not the whole benchmark — the partial
# marker already makes an incomplete battery honest
QUERY_TIMEOUT = float(os.environ.get("SPARK_GRAFT_BENCH_TIMEOUT", "900"))


def _timed_count(spark, fn, name: str, timeout_s: float) -> int:
    """Run fn(spark, SF_DIR).count() with a wall cap, cancelling the query's
    job group on expiry (thread-local job groups — pinned-thread mode)."""
    import threading

    if not timeout_s:
        return fn(spark, SF_DIR).count()
    result: dict = {}

    def run() -> None:
        try:
            spark.sparkContext.setJobGroup(name, f"bench:{name}", True)
            result["n"] = fn(spark, SF_DIR).count()
        except Exception as exc:  # noqa: BLE001 - re-raised on the main thread
            result["exc"] = exc

    t = threading.Thread(target=run, daemon=True, name=f"bench-{name}")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(name)
        t.join(30)
        raise TimeoutError(f"exceeded {timeout_s:.0f}s; job group cancelled")
    if "exc" in result:
        raise result["exc"]
    return result["n"]

# The benched set IS the registry: every queries() entry runs, so a new
# operator can never silently drift out of the benchmark. The flagship runs
# first (it doubles as the warmup plan family); its name comes from the
# registry so bench.py can never drift from what entry() actually runs.
from switchback_test_dag_spark.queries import FLAGSHIP  # noqa: E402


def _host_probe(trials: int = 2) -> dict:
    """Compact tools/boxprobe.py twin: this box's memory subsystem has shown
    10-100x transient swings on identical plans (SCALE.md round-7 audits), so
    every recorded benchmark carries its own environment control — min times
    for a fixed BLAS matmul and a fixed 200 MB first-touch allocation.
    Healthy ballpark: matmul ~0.01 s, alloc ~0.1 s."""
    import numpy as np

    mm, al = [], []
    for _ in range(trials):
        a = np.random.rand(4000, 64)
        t0 = time.monotonic()
        s = a @ a.T
        mm.append(time.monotonic() - t0)
        t0 = time.monotonic()
        buf = np.ones(200_000_000 // 8)
        al.append(time.monotonic() - t0)
        del s, buf
    return {"matmul_s": round(min(mm), 3), "alloc200mb_s": round(min(al), 3)}


def main() -> None:
    import __spark_entry__ as entry_mod

    probe_start = _host_probe()
    spark = get_spark(app_name="switchback-bench", cpus=CPUS, shuffle_partitions=CPUS)
    queries = entry_mod.queries()
    # optional exclusions (comma-separated) for big-scale-factor runs where a
    # query's cost is quadratic BY DESIGN (e.g. the document-pair queries at
    # 100×, whose oracle replay is itself the all-pairs side) — excluded names
    # are recorded in the output so a smaller battery is never silent
    requested_excl = [
        n for n in os.environ.get("SPARK_GRAFT_BENCH_EXCLUDE", "").split(",") if n
    ]
    excluded = sorted(n for n in requested_excl if n in queries)
    # a typo'd exclusion must not silently run the heavy query anyway — warn
    # and record the unmatched names so the recorded intent is auditable
    unmatched_excl = sorted(n for n in requested_excl if n not in queries)
    for n in unmatched_excl:
        print(
            f"bench: SPARK_GRAFT_BENCH_EXCLUDE entry {n!r} matches no "
            "registered query — ignored",
            file=sys.stderr,
        )
    names = [FLAGSHIP] + sorted(
        n for n in queries if n != FLAGSHIP and n not in excluded
    )

    # warmup: JVM, parquet footer reads, codegen, and Python/Arrow UDF workers
    # (first mapInPandas call spawns 32 workers importing pandas/numpy — that
    # one-time cost belongs to session startup, not whichever query hits it
    # first). Routed through _timed_count so a hung flagship at a big scale
    # factor costs one cancelled job group, not the whole benchmark; expiry
    # here is non-fatal — the measured runs below carry their own caps.
    try:
        _timed_count(spark, queries[names[0]], "warmup", QUERY_TIMEOUT)
    except Exception as exc:  # noqa: BLE001 - warmup is best-effort
        print(f"warmup: {type(exc).__name__}: {exc}", file=sys.stderr)
    spark.range(0, 1 << 10, 1, CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # best-of-N (default 3): single runs on this box show up to 20x variance
    # from transient system noise on identical plans; the min measures plan
    # execution (the round-5 n=3 audit showed best-of-2 still conflates
    # first-touch warmup with plan cost — e.g. assignment_battery 3.45→0.63 s).
    # All raw runs are persisted under "runs" so the variance itself is
    # auditable. A query that errors is recorded (not fatal): the rest of the
    # battery still produces timings — a partial benchmark beats a crashed one.
    from switchback_test_dag_spark.caching import release_all

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in names:
        runs[name] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            try:
                _timed_count(spark, queries[name], name, QUERY_TIMEOUT)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
            finally:
                runs[name].append(round(time.perf_counter() - t0, 3))
                # operators pin persisted intermediates (CollapseProject
                # barriers, shared-consumer frames); release so later runs
                # time the real plan and caches don't accumulate
                release_all()
        if name not in errors:
            timings[name] = min(runs[name])

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "registry_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        # a total summed over a partial battery is not comparable across runs
        # with different error sets — carry an explicit marker next to value
        "partial": bool(errors),
        "n_errors": len(errors),
        "queries": timings,
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    # environment control bracketing the run (see _host_probe)
    out["host"] = {"start": probe_start, "end": _host_probe()}
    if excluded:
        out["excluded"] = excluded
    if unmatched_excl:
        out["excluded_unmatched"] = unmatched_excl
    if errors:
        out["errors"] = errors
    # round-4 capture truncated the recorded line from the FRONT, losing the
    # leading headline fields; repeat them as the LAST key so any front-
    # truncated tail still carries the totals
    out["headline"] = {
        "value": out["value"],
        "n_queries": out["n_queries"],
        "partial": out["partial"],
        "n_errors": out["n_errors"],
        "sf": out["sf"],
    }
    # the round-6 artifact lost the first ~8 queries' run arrays to the
    # driver's bounded stdout capture: persist the COMPLETE artifact to a
    # file as the durable record (committed per round), and keep the stdout
    # line compact (separators strip ~15%) so the capture has the best shot
    # at parsing whole too
    try:
        with open(os.path.join(_REPO_DIR, "BENCH_full.json"), "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError as exc:
        print(f"bench: could not write BENCH_full.json: {exc}", file=sys.stderr)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
