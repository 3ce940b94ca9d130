"""Unit tests for the /proc/stat steal-audit helper (pure Python)."""

from __future__ import annotations

from kgflow.audit import CpuAudit, CpuWindow, timed_audited


def test_window_math_from_synthetic_ticks():
    # cpu user nice system idle iowait irq softirq steal ...
    before = [100, 0, 100, 700, 50, 0, 0, 50]
    after = [200, 0, 200, 1200, 150, 0, 0, 250]
    audit = CpuAudit(before)
    audit_stop = CpuAudit.stop.__get__(audit)

    # monkey-free: feed "after" by temporarily patching _cpu_ticks
    import kgflow.audit as mod

    orig = mod._cpu_ticks
    mod._cpu_ticks = lambda: after
    try:
        w = audit_stop()
    finally:
        mod._cpu_ticks = orig
    total = sum(b - a for a, b in zip(before, after))  # 1000
    assert w.available
    assert w.steal_pct == round(100 * 200 / total, 3)  # 20%
    assert w.iowait_pct == round(100 * 100 / total, 3)  # 10%
    assert w.contaminated()


def test_unavailable_never_contaminated():
    w = CpuWindow()
    assert not w.available and not w.contaminated()
    # degenerate: zero delta
    a = CpuAudit([1, 2, 3])
    import kgflow.audit as mod

    orig = mod._cpu_ticks
    mod._cpu_ticks = lambda: [1, 2, 3]
    try:
        assert not a.stop().contaminated()
    finally:
        mod._cpu_ticks = orig


def test_timed_audited_runs_and_returns_result():
    import os
    import time

    # the window must span at least a few jiffies (10ms ticks) or the
    # /proc/stat delta is zero and the window reports unavailable
    elapsed, window, result = timed_audited(lambda: (time.sleep(0.05), 42)[1])
    assert result == 42
    assert elapsed >= 0.05
    if os.path.exists("/proc/stat"):
        assert window.available


def test_contamination_thresholds():
    assert CpuWindow(steal_pct=1.5, iowait_pct=0, available=True).contaminated()
    assert CpuWindow(steal_pct=0.5, iowait_pct=6.0, available=True).contaminated()
    assert not CpuWindow(steal_pct=0.5, iowait_pct=0.5, available=True).contaminated()
