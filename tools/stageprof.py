#!/usr/bin/env python
"""Dev tool: per-stage executor-CPU attribution for one registry query.

Runs the named query ``--runs`` times (count() action, like bench.py) with the
UI status store on, then prints every completed stage of the LAST run with its
executor CPU, run time, shuffle read/write bytes, records and task count —
the measurement §1/§7 of the optimization guide asks for before touching a
plan. First run(s) warm codegen/caches; the last run is reported.

Usage: python tools/stageprof.py [--sf DIR] [--runs 3] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from switchback_test_dag_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("name")
    args = ap.parse_args()

    from switchback_test_dag_spark import queries as q
    from switchback_test_dag_spark.caching import release_all

    spark = get_spark(
        app_name="stageprof",
        cpus=args.cpus,
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.load(resp)

    fn = q.QUERIES[args.name]
    wall = []
    for i in range(args.runs):
        before = {(s["stageId"], s["attemptId"]) for s in stages()}
        t0 = time.perf_counter()
        n = fn(spark, args.sf).count()
        wall.append(time.perf_counter() - t0)
        release_all()
        time.sleep(0.5)
        after = stages()
        new = [s for s in after if (s["stageId"], s["attemptId"]) not in before]
        if i < args.runs - 1:
            continue
        new.sort(key=lambda s: -s.get("executorCpuTime", 0))
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
        print(f"\n{args.name}: rows={n} run_walls={[round(w,2) for w in wall]} "
              f"last-run stages={len(new)} cpu_total={tot_cpu:.3f}s")
        print(f"{'cpu_s':>8} {'run_s':>7} {'tasks':>5} {'in_MB':>8} {'sh_r_MB':>8} "
              f"{'sh_w_MB':>8} {'out_rows':>9}  name")
        for s in new:
            cpu = s.get("executorCpuTime", 0) / 1e9
            runt = s.get("executorRunTime", 0) / 1e3
            nm = (s.get("description") or s.get("name", ""))[:100]
            print(
                f"{cpu:8.3f} {runt:7.2f} {s.get('numCompleteTasks',0):5d} "
                f"{s.get('inputBytes',0)/1e6:8.2f} {s.get('shuffleReadBytes',0)/1e6:8.2f} "
                f"{s.get('shuffleWriteBytes',0)/1e6:8.2f} {s.get('outputRecords',0) or s.get('shuffleWriteRecords',0):9d}  {nm}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
