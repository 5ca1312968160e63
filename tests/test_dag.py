"""Orchestration shim tests: dependency order, bounded retries with delay,
success callbacks, cycle/unknown-dep detection, and the daily chain end-to-end
on the sf0.001 fixtures (`dag.py`, mirroring the reference's
dags/switchback_test_dag.py:14-29 semantics)."""

from __future__ import annotations

import pytest

from switchback_test_dag_spark.dag import Task, run_dag, run_daily

SF = "/root/testdata/sf0.001"


def test_dependency_order_and_callbacks():
    seen, msgs = [], []
    tasks = [
        Task("c", lambda: seen.append("c"), depends_on=("b",)),
        Task("a", lambda: seen.append("a")),
        Task("b", lambda: seen.append("b"), depends_on=("a",)),
    ]
    res = run_dag(tasks, on_success=msgs.append)
    assert seen == ["a", "b", "c"]
    assert res.succeeded == ["a", "b", "c"]
    assert msgs == ["a", "b", "c"]


def test_retry_then_succeed_and_fail_after_budget():
    slept = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return "ok"

    res = run_dag(
        [Task("t", flaky, retries=1, retry_delay_sec=6.0)], sleep=slept.append
    )
    assert res.outputs["t"] == "ok"
    assert res.attempts["t"] == 2
    assert slept == [6.0]  # the reference's 0.1-minute retry delay

    def always_bad():
        raise RuntimeError("permanent")

    ran = []
    with pytest.raises(RuntimeError, match="permanent"):
        run_dag(
            [
                Task("bad", always_bad, retries=1, retry_delay_sec=0.0),
                Task("down", lambda: ran.append("down"), depends_on=("bad",)),
            ],
            sleep=lambda _s: None,
        )
    assert ran == []  # downstream never runs after upstream exhausts retries


def test_cycle_and_unknown_dependency_detected():
    with pytest.raises(ValueError, match="cycle"):
        run_dag(
            [
                Task("a", lambda: None, depends_on=("b",)),
                Task("b", lambda: None, depends_on=("a",)),
            ]
        )
    with pytest.raises(ValueError, match="unknown"):
        run_dag([Task("a", lambda: None, depends_on=("ghost",))])


def test_run_daily_chain(spark):
    msgs = []
    res = run_daily(spark, SF, on_success=msgs.append)
    assert res.succeeded == ["run_queries", "run_analysis_script"]
    assert res.outputs["run_queries"] > 0
    analysis = res.outputs["run_analysis_script"]
    assert set(analysis) == {"per_order", "totals", "p_values"}
    assert all(n > 0 for n in analysis.values())
    assert msgs == ["run_queries", "run_analysis_script"]
