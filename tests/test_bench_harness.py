"""Unit tests for bench.py's outlier-selection logic (the fresh-JVM
re-measurement triggers, VERDICT r7 #1) — pure-Python, no Spark."""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import select_outliers  # noqa: E402


def test_spread_trigger_with_small_median_floor():
    timings = {"big_noisy": 2.0, "tiny_noisy": 0.05, "steady": 3.0}
    spreads = {"big_noisy": 0.8, "tiny_noisy": 2.0, "steady": 0.1}
    out = select_outliers(timings, spreads, {}, 0.5)
    assert out == ["big_noisy"]  # tiny jitter exempt, steady untouched


def test_regression_trigger_needs_2x_and_absolute_excess():
    timings = {"regressed": 1.2, "doubled_but_tiny": 0.15, "flat": 1.0}
    spreads = dict.fromkeys(timings, 0.1)
    prev = {"regressed": 0.5, "doubled_but_tiny": 0.05, "flat": 1.0}
    out = select_outliers(timings, spreads, prev, 0.5)
    # regressed: 1.2 > 2*0.5 and excess 0.7 > 0.3 -> in.
    # doubled_but_tiny: 3x prev but only +0.10 absolute -> out.
    assert out == ["regressed"]


def test_worst_excess_first_ordering():
    timings = {"a": 10.0, "b": 1.0}
    spreads = {"a": 0.6, "b": 3.0}
    # a: excess (0.6-0.5)*10 = 1.0; b: (3.0-0.5)*1 = 2.5 -> b first
    assert select_outliers(timings, spreads, {}, 0.5) == ["b", "a"]


def test_errors_and_clean_queries_excluded():
    timings = {"err": -1.0, "ok": 0.5}
    spreads = {"err": -1.0, "ok": 0.2}
    assert select_outliers(timings, spreads, {"ok": 0.5}, 0.5) == []


def test_regression_without_previous_baseline_ignored():
    # no prev medians (e.g. first run at this sf): only spread triggers
    timings = {"q": 5.0}
    spreads = {"q": 0.2}
    assert select_outliers(timings, spreads, {}, 0.5) == []


def test_fresh_rerun_escalates_then_annotates_unsettled(monkeypatch):
    """A fresh re-measure still above the spread bar gets one escalated
    retry with more runs; if still noisy, the row is committed with
    unsettled=True instead of bare (the artifact's invariant is
    enforced, not asserted)."""
    import bench

    calls = []

    def fake_once(name, runs):
        calls.append((name, runs))
        if name == "settles":
            # noisy at 3 runs, clean at 7
            return (
                {"median": 1.0, "spread": 0.8, "runs": runs}
                if runs == 3
                else {"median": 1.0, "spread": 0.1, "runs": runs}
            )
        return {"median": 1.0, "spread": 0.9, "runs": runs}  # never settles

    monkeypatch.setattr(bench, "_fresh_once", fake_once)
    out = bench._fresh_rerun(["settles", "bimodal"], 3, 0.5)
    assert calls == [("settles", 3), ("settles", 7), ("bimodal", 3), ("bimodal", 7)]
    assert out["settles"] == {"median": 1.0, "spread": 0.1, "runs": 7}
    assert out["bimodal"]["unsettled"] is True


def test_fresh_rerun_keeps_better_attempt_and_fast_rows_exempt(monkeypatch):
    import bench

    def fake_once(name, runs):
        if name == "fast":  # sub-0.15s medians exempt from the bar
            return {"median": 0.05, "spread": 2.0, "runs": runs}
        # retry comes back WORSE: keep the first attempt
        return (
            {"median": 1.0, "spread": 0.6, "runs": runs}
            if runs == 3
            else {"median": 1.2, "spread": 0.9, "runs": runs}
        )

    monkeypatch.setattr(bench, "_fresh_once", fake_once)
    out = bench._fresh_rerun(["fast", "worse"], 3, 0.5)
    assert "unsettled" not in out["fast"]
    assert out["worse"]["median"] == 1.0 and out["worse"]["unsettled"] is True


def test_classify_machine_state_ok_and_degraded():
    import bench

    ref = {"python_loop_s": 0.2, "numpy_matmul_s": 0.1}
    ok = bench.classify_machine_state(ref, {"python_loop_s": 0.21, "numpy_matmul_s": 0.11})
    assert ok["state"] == "ok"
    assert ok["ratios"]["python_loop_s"] == 1.05
    bad = bench.classify_machine_state(ref, {"python_loop_s": 0.4, "numpy_matmul_s": 0.1})
    assert bad["state"] == "degraded"
    # per-probe tolerance: a 5x matmul is within ITS (oscillating)
    # band while a 2x python loop is degraded
    assert bench.classify_machine_state(ref, {"python_loop_s": 0.2, "numpy_matmul_s": 0.5})["state"] == "ok"
    assert bench.classify_machine_state(ref, {"python_loop_s": 0.2, "numpy_matmul_s": 0.9})["state"] == "degraded"


def test_classify_machine_state_unreferenced_and_partial():
    import bench

    assert bench.classify_machine_state(None, {"python_loop_s": 0.2})["state"] == "unreferenced"
    assert bench.classify_machine_state({}, {"python_loop_s": 0.2})["state"] == "unreferenced"
    # a probe missing from the reference (e.g. numpy import failed at
    # capture time) is skipped, not treated as degraded
    part = bench.classify_machine_state(
        {"python_loop_s": 0.2}, {"python_loop_s": 0.2, "numpy_matmul_s": None}
    )
    assert part["state"] == "ok" and list(part["ratios"]) == ["python_loop_s"]


def test_classify_machine_state_faster_box_is_ok():
    import bench

    # a box FASTER than the reference is fine — only slowness pollutes
    fast = bench.classify_machine_state(
        {"python_loop_s": 0.2}, {"python_loop_s": 0.1}
    )
    assert fast["state"] == "ok"


def test_canary_new_probes_classified_and_referenced():
    """Round 12: the A/B adjudication showed byte-identical code 10-16%
    slower while BOTH CPU probes read faster than reference — the
    canary's blind spot. The memory-bandwidth and disk-write probes
    must be measured, carried in the committed reference, and
    classified with their own tolerance bands."""
    import json

    import bench

    ref = json.loads((bench.REPO / "BENCH_CANARY_REF.json").read_text())
    for k in ("mem_bw_s", "disk_write_s"):
        assert isinstance(ref["canary"].get(k), (int, float)), k
        assert k in bench.CANARY_TOL

    base = {"mem_bw_s": 0.02, "disk_write_s": 0.1}
    # within band: ok even when one CPU probe is absent (1.2x mem_bw is
    # inside the healthy ~10% jitter x2.5 margin)
    ok = bench.classify_machine_state(
        base, {"mem_bw_s": 0.024, "disk_write_s": 0.3}
    )
    assert ok["state"] == "ok"
    # r13 band decision (VERDICT r12 #4): the measured slow state —
    # mem_bw ratio 1.3x alongside +15-30% suite totals with CPU probes
    # flat — must flag, so past 1.25x is degraded
    bad = bench.classify_machine_state(base, {"mem_bw_s": 0.027})
    assert bad["state"] == "degraded"
    # disk oscillates legitimately — 3x is ambient, past 4x flags
    assert bench.classify_machine_state(base, {"disk_write_s": 0.3})["state"] == "ok"
    assert bench.classify_machine_state(base, {"disk_write_s": 0.5})["state"] == "degraded"
    assert bench.classify_machine_state(base, {"disk_write_s": 1.5})["state"] == "degraded"


@pytest.mark.slow
def test_canary_measures_all_probes():
    import bench

    s = bench._canary()
    for k in ("python_loop_s", "numpy_matmul_s", "mem_bw_s", "disk_write_s"):
        assert isinstance(s.get(k), (int, float)) and s[k] > 0, k
