"""bench.py environment control: the probe bounds and the wait-for-healthy
loop (pure driver-side logic — no Spark session)."""

from __future__ import annotations

import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_probe_degraded_bounds():
    b = _bench()
    assert not b._probe_degraded({"matmul_s": 0.01, "alloc200mb_s": 0.1})
    assert b._probe_degraded({"matmul_s": 0.06, "alloc200mb_s": 0.1})
    assert b._probe_degraded({"matmul_s": 0.01, "alloc200mb_s": 0.31})
    # exactly on the bounds is healthy (bounds are exclusive)
    assert not b._probe_degraded(
        {"matmul_s": b._HEALTHY_MATMUL_S, "alloc200mb_s": b._HEALTHY_ALLOC_S}
    )


def test_wait_for_healthy_host_zero_budget_probes_once(monkeypatch):
    b = _bench()
    calls = []

    def fake_probe(trials: int = 2):
        calls.append(1)
        return {"matmul_s": 9.9, "alloc200mb_s": 9.9}

    monkeypatch.setattr(b, "_host_probe", fake_probe)
    probe = b._wait_for_healthy_host(0.0)
    assert len(calls) == 1 and b._probe_degraded(probe)


def test_wait_for_healthy_host_retries_until_healthy(monkeypatch):
    b = _bench()
    seq = [
        {"matmul_s": 9.9, "alloc200mb_s": 9.9},
        {"matmul_s": 9.9, "alloc200mb_s": 9.9},
        {"matmul_s": 0.01, "alloc200mb_s": 0.05},
    ]
    calls = []
    monkeypatch.setattr(b, "_host_probe", lambda trials=2: (calls.append(1), seq[len(calls) - 1])[1])
    monkeypatch.setattr(b.time, "sleep", lambda s: None)
    probe = b._wait_for_healthy_host(600.0)
    assert len(calls) == 3 and not b._probe_degraded(probe)


def test_wait_for_healthy_host_budget_expires(monkeypatch):
    b = _bench()
    calls = []

    def fake_probe(trials: int = 2):
        calls.append(1)
        return {"matmul_s": 9.9, "alloc200mb_s": 9.9}

    slept = []
    monkeypatch.setattr(b, "_host_probe", fake_probe)
    monkeypatch.setattr(b.time, "sleep", lambda s: slept.append(s))
    probe = b._wait_for_healthy_host(65.0)
    # 30 + 30 + 5 second steps, then gives up still-degraded
    assert slept == [30.0, 30.0, 5.0]
    assert b._probe_degraded(probe)


def test_cpu_reader_none_when_ui_off_and_delta_semantics():
    """_make_cpu_reader returns None without a UI URL (bench then records no
    cpu fields rather than crashing), and the per-query attribution is the
    sum over NEW stage ids only — old-stage eviction between reads must not
    perturb it."""
    b = _bench()

    class _SC:
        uiWebUrl = None

    class _Ctx:
        sparkContext = _SC()

    assert b._make_cpu_reader(_Ctx()) is None
    # delta semantics (the logic bench's main loop applies to two reads)
    before = {(1, 0): 100, (2, 0): 50}
    after = {(2, 0): 50, (3, 0): 700, (4, 1): 300}  # stage 1 evicted; 3,4 new
    delta = sum(v for k, v in after.items() if k not in before)
    assert delta == 1000


def test_stdout_payload_slims_raw_arrays_only():
    """The stdout JSON line must parse whole inside the driver's bounded
    capture: the raw best-of-N arrays are file-only, every contract key
    (metric/value/unit/queries/sf + the cpu series and headline) survives."""
    b = _bench()
    out = {
        "metric": "registry_queries_total",
        "value": 1.0,
        "unit": "sec",
        "n_queries": 2,
        "partial": False,
        "n_errors": 0,
        "queries": {"a": 0.4, "b": 0.6},
        "runs": {"a": [0.5, 0.4], "b": [0.7, 0.6]},
        "cpu": {"a": 0.1, "b": 0.2},
        "cpu_runs": {"a": [0.2, 0.1], "b": [0.3, 0.2]},
        "cpu_total": 0.3,
        "cpu_complete": True,
        "sf": 0.1,
        "host": {"start": {}, "end": {}},
        "degraded": False,
        "headline": {"value": 1.0},
    }
    slim = b._stdout_payload(out)
    assert "runs" not in slim and "cpu_runs" not in slim
    assert set(out) - set(slim) == {"runs", "cpu_runs"}
    # the full artifact is untouched (file keeps the arrays)
    assert "runs" in out and "cpu_runs" in out
    # size sanity at 50 queries: a slim line stays within a bounded capture
    import json

    big = dict(out)
    big["queries"] = {f"q{i:02d}_some_query_name": 1.234 for i in range(50)}
    big["cpu"] = {f"q{i:02d}_some_query_name": 0.123 for i in range(50)}
    big["runs"] = {k: [1.3, 1.25, 1.234] for k in big["queries"]}
    big["cpu_runs"] = {k: [0.14, 0.13, 0.123] for k in big["queries"]}
    line = json.dumps(b._stdout_payload(big), separators=(",", ":"))
    assert len(line) < 4000
