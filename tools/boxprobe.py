#!/usr/bin/env python
"""Measure the host's transient compute/memory health — the control any
benchmark comparison on this box needs.

Round-7 context: identical plans measured 2–10× apart hours apart (e.g. the
pure-JVM `filters_conjunctive` 1.5 s vs 14.7 s at sf10 with zero code
change), and the same 4000×4000 numpy matmul measured 0.07–80 s across
trials. This probe times three fixed micro-workloads (BLAS matmul, bulk
allocation/first-touch, a JVM-free pure-Python loop) n times and prints one
JSON line; run it next to any benchmark so the recorded numbers carry their
own environment control.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import numpy as np

    out: dict = {"trials": []}
    for _ in range(3):
        t = {}
        a = np.random.rand(4000, 64)
        t0 = time.monotonic()
        s = a @ a.T
        t["matmul_4kx64_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        buf = np.ones(200_000_000 // 8)  # 200 MB fresh allocation + first touch
        t["alloc200mb_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        acc = 0
        for i in range(2_000_000):
            acc += i & 7
        t["pyloop2m_s"] = round(time.monotonic() - t0, 3)
        del s, buf, acc
        out["trials"].append(t)
    for k in out["trials"][0]:
        out[f"min_{k}"] = min(tr[k] for tr in out["trials"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
