#!/usr/bin/env python
"""Mechanical round-over-round BENCH comparison on executor CPU.

Reads two BENCH artifacts (as written by bench.py: per-query ``queries``
wall seconds and ``cpu`` executor-CPU seconds) and prints per-query **cpu**
ratios — the box-independent signal on this chronically degraded host —
with wall ratios alongside, explicitly labeled as noise (BASELINE.md: wall
here measures the allocator; same-code runs have shown per-query wall
swings up to 70× while cpu_total reproduced within 0.24%).

The headline ratios are computed over the INTERSECTION of queries present
in both artifacts, so scope growth (a new query) or a differing exclusion
set can never masquerade as a regression of existing plans; queries only
in one artifact are listed separately with their own subtotals.

Usage: python tools/bench_delta.py OLD.json NEW.json [--top N] [--json]
  --top N   show only the N largest |cpu| movers (default: all)
  --json    emit one machine-readable JSON line instead of the table
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as fh:
        art = json.load(fh)
    for key in ("queries", "cpu"):
        if key not in art:
            raise SystemExit(
                f"{path}: no {key!r} key — not a bench.py artifact "
                "(CPU-carrying artifacts exist from round 9 on)"
            )
    return art


def ratio(new: float, old: float) -> float | None:
    return round(new / old, 3) if old else None


def delta(old: dict, new: dict) -> dict:
    common = sorted(set(old["cpu"]) & set(new["cpu"]))
    only_old = sorted(set(old["cpu"]) - set(new["cpu"]))
    only_new = sorted(set(new["cpu"]) - set(old["cpu"]))
    rows = []
    for q in common:
        co, cn = old["cpu"][q], new["cpu"][q]
        wo = old["queries"].get(q)
        wn = new["queries"].get(q)
        rows.append(
            {
                "query": q,
                "cpu_old": co,
                "cpu_new": cn,
                "cpu_ratio": ratio(cn, co),
                "wall_old": wo,
                "wall_new": wn,
                "wall_ratio": ratio(wn, wo) if wo is not None and wn is not None else None,
            }
        )
    # sort by how far the cpu ratio moved from 1 (None ratios last)
    rows.sort(
        key=lambda r: abs((r["cpu_ratio"] or 1.0) - 1.0), reverse=True
    )
    c_old = sum(old["cpu"][q] for q in common)
    c_new = sum(new["cpu"][q] for q in common)
    return {
        "common_queries": len(common),
        "cpu_common_old": round(c_old, 3),
        "cpu_common_new": round(c_new, 3),
        "cpu_common_ratio": ratio(c_new, c_old),
        "cpu_total_old": old.get("cpu_total"),
        "cpu_total_new": new.get("cpu_total"),
        "wall_total_old": old.get("value"),
        "wall_total_new": new.get("value"),
        "degraded_old": old.get("degraded"),
        "degraded_new": new.get("degraded"),
        "only_old": {q: old["cpu"][q] for q in only_old},
        "only_new": {q: new["cpu"][q] for q in only_new},
        "rows": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    d = delta(load(args.old), load(args.new))
    if args.json:
        print(json.dumps(d, separators=(",", ":")))
        return
    print(
        f"cpu over {d['common_queries']} common queries: "
        f"{d['cpu_common_old']} -> {d['cpu_common_new']} s "
        f"(ratio {d['cpu_common_ratio']})"
    )
    print(
        f"artifact cpu_total: {d['cpu_total_old']} -> {d['cpu_total_new']} s"
        f"   wall (NOISE on this box): {d['wall_total_old']} -> "
        f"{d['wall_total_new']} s   degraded: {d['degraded_old']} -> "
        f"{d['degraded_new']}"
    )
    rows = d["rows"][: args.top] if args.top else d["rows"]
    print("\n| query | cpu old (s) | cpu new (s) | cpu ratio | wall ratio (noise) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['cpu_old']} | {r['cpu_new']} | "
            f"{r['cpu_ratio']} | {r['wall_ratio']} |"
        )
    for label, extra in (("only in OLD", d["only_old"]), ("only in NEW", d["only_new"])):
        if extra:
            tot = round(sum(extra.values()), 3)
            print(f"\n{label} ({tot} s cpu): " + ", ".join(
                f"{q}={v}" for q, v in extra.items()
            ))


if __name__ == "__main__":
    main()
