"""Unit tests for bench.py's clean-window measurement state machine
(no Spark): contaminated attempts must never enter the published
median, retries must stop once enough clean iterations exist, and a
window-starved query must end up short (-> published as unmeasured by
the caller)."""

from __future__ import annotations

import bench
from kgflow.audit import CpuWindow


def _fake_windows(monkeypatch, windows):
    """Feed timed_audited a scripted sequence of (elapsed, window)."""
    seq = iter(windows)

    def fake_timed_audited(fn, max_retries=0):
        elapsed, window = next(seq)
        return elapsed, window, fn()

    monkeypatch.setattr(bench, "timed_audited", fake_timed_audited)
    monkeypatch.setattr(bench, "RETRY_SLEEP_SEC", 0)


def _clean(sec):
    return (sec, CpuWindow(available=True))


def _dirty(sec):
    return (sec, CpuWindow(steal_pct=5.0, available=True))


def test_measure_pass_collects_only_clean(monkeypatch):
    _fake_windows(
        monkeypatch, [_clean(1.0), _dirty(9.0), _clean(1.1), _clean(1.2)]
    )
    state = {"clean": [], "attempts": []}
    bench._measure_pass(lambda: None, state, needed=3, extra=3)
    assert [r["sec"] for r in state["clean"]] == [1.0, 1.1, 1.2]
    assert len(state["attempts"]) == 4
    assert [a["contaminated"] for a in state["attempts"]] == [
        False, True, False, False,
    ]


def test_measure_pass_stops_at_needed(monkeypatch):
    calls = []
    _fake_windows(monkeypatch, [_clean(1.0)] * 10)
    state = {"clean": [], "attempts": []}
    bench._measure_pass(lambda: calls.append(1), state, needed=3, extra=3)
    assert len(state["clean"]) == 3 and len(calls) == 3


def test_measure_pass_budget_exhaustion_leaves_short(monkeypatch):
    # every window contaminated: the pass burns needed+extra attempts
    # and publishes NO clean iterations — the caller then marks the
    # row unmeasured instead of publishing a dirty median
    _fake_windows(monkeypatch, [_dirty(9.0)] * 20)
    state = {"clean": [], "attempts": []}
    bench._measure_pass(lambda: None, state, needed=3, extra=3)
    assert state["clean"] == []
    assert len(state["attempts"]) == 6  # needed(3) + extra(3)


def test_measure_pass_resumes_partial_state(monkeypatch):
    # a requeue pass tops up an earlier pass's clean iterations; the
    # budget counts only what is still missing (plus extra)
    _fake_windows(monkeypatch, [_clean(2.0), _clean(2.1)])
    state = {
        "clean": [{"sec": 1.0, "steal_pct": 0.0, "iowait_pct": 0.0,
                   "other_busy_pct": 0.0, "load1": 0.0, "own_cpu_s": 0.0,
                   "contaminated": False}],
        "attempts": [],
    }
    bench._measure_pass(lambda: None, state, needed=3, extra=0)
    assert len(state["clean"]) == 3
    assert len(state["attempts"]) == 2


def test_measure_pass_sec_of_and_annotate(monkeypatch):
    # kg path: the published sec comes from the subprocess summary (not
    # wall, which includes JVM startup) and stage telemetry rides along
    _fake_windows(monkeypatch, [_clean(99.0)])
    state = {"clean": [], "attempts": []}
    bench._measure_pass(
        lambda: {"elapsed_sec": 42.5, "stages": {"x": 1}},
        state, needed=1, extra=0,
        sec_of=lambda s: s["elapsed_sec"],
        annotate=lambda s: {"stages": s["stages"]},
    )
    assert state["clean"][0]["sec"] == 42.5
    assert state["clean"][0]["stages"] == {"x": 1}
    assert state["last_result"]["elapsed_sec"] == 42.5


def test_kg_stall_survivors_filters_inflated_cpu():
    def rec(sec, own):
        return {"sec": sec, "own_cpu_s": own}

    clean = [rec(246.9, 4148.6), rec(104.0, 1542.4), rec(76.7, 1128.1)]
    surv = bench._kg_stall_survivors(clean)
    # floor 1128.1; 1.5x floor = 1692 -> the 4148.6 attempt is stalled
    assert [r["sec"] for r in surv] == [104.0, 76.7]
    # fewer than 2 usable attempts: no floor, nothing filtered
    assert bench._kg_stall_survivors([rec(100.0, 2000.0)]) == [rec(100.0, 2000.0)]
    # own-CPU unavailable (0.0) never establishes or breaks the floor
    mixed = [rec(10.0, 0.0), rec(11.0, 100.0), rec(12.0, 105.0)]
    assert len(bench._kg_stall_survivors(mixed)) == 3
