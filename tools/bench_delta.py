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


def _flat_object_at(s: str, start: int) -> dict | None:
    """Parse the flat JSON object beginning at s[start] == '{' whose values
    contain no nested '}' except inside further objects/arrays — sufficient
    for bench.py's ``cpu`` / ``queries`` (number values) and ``headline``
    (flat scalars). Walks brace depth so a nested object (host probes) is
    also handled."""
    depth = 0
    in_str = False
    esc = False
    for i in range(start, len(s)):
        c = s[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(s[start : i + 1])
                except json.JSONDecodeError:
                    return None
    return None


_ARRAY_PAIR = None  # compiled lazily (regex import kept local to the helper)


def _recover_from_tail(tail: str, path: str) -> dict:
    """Reconstruct a comparable artifact from a driver BENCH_r*.json wrapper
    whose ``tail`` is the LAST ~2000 chars of bench.py stdout (front-
    truncated). bench.py's key order is queries, runs, cpu, cpu_runs,
    cpu_total, ..., headline — so what survives is the trailing ``headline``
    (totals: always) plus, when the cut landed inside ``cpu_runs``, the
    alphabetically-late queries' raw CPU arrays. Per-query cpu for those is
    min(array) — bench.py's own definition — and the artifact is marked
    ``partial_recovery`` with the surviving-query count so a subtotal over
    a fragment can never read as the full battery."""
    import re

    art: dict = {"queries": {}}
    idx = tail.rfind('"headline":{')
    if idx != -1:
        obj = _flat_object_at(tail, idx + len('"headline":'))
        if obj:
            for k in ("value", "cpu_total", "degraded", "sf",
                      "n_queries", "partial", "n_errors", "cpu_complete"):
                if k in obj:
                    art[k] = obj[k]
    # full per-query cpu object survived? (longer tails / parsed captures)
    cpu_idx = tail.rfind('"cpu":{')
    if cpu_idx != -1:
        obj = _flat_object_at(tail, cpu_idx + len('"cpu":'))
        if obj:
            art["cpu"] = obj
    if "cpu" not in art:
        # the region before "cpu_total" is inside cpu_runs (its immediate
        # predecessor key): every COMPLETE "name":[nums] pair there is one
        # query's raw best-of-N CPU array. Scope the scan to AFTER the last
        # structural marker that precedes cpu_runs ("cpu_runs":, or the
        # "cpu":{ object that failed to parse above) — otherwise, when
        # "cpu":{ is present-but-unparsable, the fragment before it still
        # holds trailing "runs" WALL-time arrays, which the name:[nums]
        # regex would harvest as per-query CPU numbers
        end = tail.find('"cpu_total":')
        frag = tail[:end] if end != -1 else ""
        runs_idx = frag.rfind('"cpu_runs":')
        if runs_idx != -1:
            frag = frag[runs_idx + len('"cpu_runs":'):]
        elif cpu_idx != -1 and cpu_idx < len(frag):
            frag = frag[cpu_idx + len('"cpu":'):]
        pairs = re.findall(r'"([A-Za-z0-9_]+)":\[([0-9.,eE+-]+)\]', frag)
        cpu = {}
        for name, nums in pairs:
            try:
                vals = [float(x) for x in nums.split(",")]
            except ValueError:
                continue
            if vals:
                cpu[name] = round(min(vals), 3)
        art["cpu"] = cpu
        art["partial_recovery"] = True
        art["recovered_queries"] = len(cpu)
    if not art["cpu"] and "cpu_total" not in art:
        raise SystemExit(
            f"{path}: driver wrapper tail too truncated — neither a cpu "
            "table nor a headline is recoverable (CPU-carrying artifacts "
            "exist from round 9 on)"
        )
    return art


def load(path: str) -> dict:
    with open(path) as fh:
        art = json.load(fh)
    # driver wrapper (BENCH_r{N}.json): {n, rc, cpus, sf, tail, parsed} —
    # parsed is the full bench line when the capture held it whole, else
    # null and the per-query cpu table is recovered from the tail string
    if "tail" in art and "rc" in art:
        if isinstance(art.get("parsed"), dict) and "cpu" in art["parsed"]:
            art = art["parsed"]
        else:
            art = _recover_from_tail(art.get("tail") or "", path)
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
        # set when an artifact was rebuilt from a truncated driver tail:
        # the per-query table then covers only the surviving fragment and
        # cpu_common_* is a SUBTOTAL — read cpu_total_old/new (from the
        # headline, always whole) for the round-over-round gate
        "partial_recovery_old": old.get("partial_recovery", False),
        "partial_recovery_new": new.get("partial_recovery", False),
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
    frag = ""
    if d["partial_recovery_old"] or d["partial_recovery_new"]:
        frag = (
            " [PARTIAL: per-query table recovered from a truncated driver "
            "tail — subtotal only; gate on cpu_total below]"
        )
    print(
        f"cpu over {d['common_queries']} common queries: "
        f"{d['cpu_common_old']} -> {d['cpu_common_new']} s "
        f"(ratio {d['cpu_common_ratio']}){frag}"
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
