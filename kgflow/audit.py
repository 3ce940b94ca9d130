"""Host-noise audit for benchmark iterations.

Round 3's verdict: the published bench snapshot was the worst of three
same-day runs because a hypervisor-steal window landed on it (one query
swung 22.2 -> 8.8 s across iterations on identical code and data). The
fix is procedural — every timed iteration records the /proc/stat
steal + iowait fraction over exactly its own window, and the harness
re-runs iterations whose window was contaminated, so a noisy host can
cost wall-clock but can no longer fake a regression.

/proc/stat is Linux-only; on other hosts the audit degrades to zeros
(never blocks a measurement).
"""

from __future__ import annotations

from dataclasses import dataclass

# /proc/stat cpu line: user nice system idle iowait irq softirq steal ...
_IDX_IOWAIT = 4
_IDX_STEAL = 7


def _cpu_ticks() -> "list[int] | None":
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu "):
                    return [int(x) for x in line.split()[1:]]
    except OSError:
        return None
    return None


@dataclass
class CpuWindow:
    """steal/iowait percentages over a start()..stop() window.

    load1 is the 1-min load average sampled at stop() — diagnostic
    only, never gates: this host shows 2-3x run-time swings with
    steal<0.3% (co-tenant disk/memory-bus contention the steal counter
    cannot see), and publishing the load alongside each iteration lets
    a reader attribute an outlier without re-running."""

    steal_pct: float = 0.0
    iowait_pct: float = 0.0
    load1: float = 0.0
    available: bool = False

    def contaminated(self, steal_limit: float = 1.0, iowait_limit: float = 5.0) -> bool:
        """True when the window saw enough hypervisor steal or IO stall
        to distrust a timing taken inside it. Limits are percentages of
        TOTAL host CPU time (32-way average — 1% average steal means
        ~1/3 of one core stolen continuously, measured in round 3 to
        shift short runs by 2x+)."""
        return self.available and (
            self.steal_pct > steal_limit or self.iowait_pct > iowait_limit
        )


class CpuAudit:
    """Snapshot /proc/stat around a timed region:

        audit = CpuAudit.start()
        ... timed work ...
        window = audit.stop()
    """

    def __init__(self, before: "list[int] | None"):
        self._before = before

    @classmethod
    def start(cls) -> "CpuAudit":
        return cls(_cpu_ticks())

    def stop(self) -> CpuWindow:
        import os

        try:
            load1 = round(os.getloadavg()[0], 2)
        except OSError:
            load1 = 0.0
        after = _cpu_ticks()
        if self._before is None or after is None:
            return CpuWindow(load1=load1)
        delta = [b - a for a, b in zip(self._before, after)]
        total = sum(delta)
        if total <= 0:
            return CpuWindow(load1=load1)
        return CpuWindow(
            steal_pct=round(100.0 * delta[_IDX_STEAL] / total, 3),
            iowait_pct=round(100.0 * delta[_IDX_IOWAIT] / total, 3),
            load1=load1,
            available=True,
        )


def timed_audited(fn, max_retries: int = 2):
    """Run ``fn`` timed; if the host window was contaminated, re-run up
    to ``max_retries`` times and keep the LAST (cleanest-available)
    measurement. Returns (elapsed_sec, CpuWindow, result_of_fn)."""
    import time

    window = CpuWindow()
    elapsed, result = 0.0, None
    for _ in range(max_retries + 1):
        audit = CpuAudit.start()
        t0 = time.monotonic()
        result = fn()
        elapsed = time.monotonic() - t0
        window = audit.stop()
        if not window.contaminated():
            break
    return elapsed, window, result
