#!/usr/bin/env python
"""Split a registry query's wall time into driver-side phases.

For each named query (args), times separately, over N repeats:
  build    — fn(spark, SF_DIR): Python-side DataFrame construction (py4j chatter)
  analyze  — df.schema touch (Catalyst analysis)
  optimize — queryExecution().optimizedPlan() (Catalyst optimizer)
  execute  — .count() (physical planning + AQE + jobs)

Usage: python tools/wallprof.py corpus_clean_stats [more ...]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from switchback_test_dag_spark.session import get_spark  # noqa: E402
from switchback_test_dag_spark.caching import release_all  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(os.environ.get("WALLPROF_RUNS", "3"))


def main() -> None:
    import __spark_entry__ as entry_mod

    names = sys.argv[1:]
    spark = get_spark(
        app_name="wallprof", cpus=CPUS, shuffle_partitions=CPUS
    )
    queries = entry_mod.queries()
    # warmup: JVM + Arrow workers
    queries[names[0]](spark, SF_DIR).count()
    release_all()
    spark.range(0, 1 << 10, 1, CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    for name in names:
        fn = queries[name]
        for i in range(N):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            _ = df.schema
            t2 = time.perf_counter()
            df._jdf.queryExecution().optimizedPlan()
            t3 = time.perf_counter()
            df.count()
            t4 = time.perf_counter()
            release_all()
            print(
                f"{name} run{i}: build={t1-t0:6.2f}s analyze={t2-t1:6.2f}s "
                f"optimize={t3-t2:6.2f}s execute={t4-t3:6.2f}s "
                f"total={t4-t0:6.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
