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
_IDX_IDLE = 3
_IDX_IOWAIT = 4
_IDX_IRQ = 5
_IDX_SOFTIRQ = 6
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


def _own_cpu_seconds() -> "float | None":
    """CPU seconds consumed by THIS process tree: utime+stime+cutime+
    cstime of self and every visible descendant. The cutime/cstime
    terms make the snapshot-delta exact across reaps: when a process
    reaps a child mid-window (the fresh-subprocess pipeline iterations
    exit inside the timed window), the dead child's utime+stime+cutime+
    cstime leave /proc and roll into its parent's cutime/cstime, so the
    tree total is invariant to the handoff. NOTE: do NOT also add
    getrusage(RUSAGE_CHILDREN) — that is the same counter as self's
    cutime/cstime, and adding both double-counts every reaped child
    (measured: a reaped 3.2 CPU-s child showed as 6.3 s own), which
    deflates other_busy_pct and lets contaminated subprocess windows
    publish as clean.

    Co-tenant containers share this kernel, so their CPU shows in
    /proc/stat's totals but their pids are invisible in our namespace —
    subtracting our own tree from host busy time is therefore a DIRECT
    measure of co-tenant CPU, which the steal counter cannot see
    (round-4 verdict item 2: 2-3x swings at near-zero steal).

    Known attribution caveat at SUB-window (per-stage) granularity:
    when an intermediate parent (a pyspark.daemon) is torn down while
    its worker children still hold accumulated CPU, the workers
    re-parent outside this tree and their ticks leave the visible
    total — a stage boundary can then show a small NEGATIVE delta
    (measured: -116 to -138 s right after the sha-UDF ingest stage,
    ~5% of the run total, timing-dependent). Whole-run deltas are
    unaffected when children are reaped normally (ticks roll into
    cutime up the chain)."""
    import os

    try:
        hz = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        ppid_of: dict[int, int] = {}
        ticks_of: dict[int, int] = {}
        for ent in os.listdir("/proc"):
            if not ent.isdigit():
                continue
            try:
                with open(f"/proc/{ent}/stat") as fh:
                    rest = fh.read().rsplit(")", 1)[1].split()
                ppid_of[int(ent)] = int(rest[1])
                # utime+stime of the process itself PLUS cutime/cstime
                # (children it has already reaped): when a live child
                # reaps its own JVM mid-window, those ticks move from
                # the JVM's utime into the child's cutime — summing
                # both keeps the start/stop delta exact across reaps
                ticks_of[int(ent)] = (
                    int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
                )
            except (OSError, IndexError, ValueError):
                continue
        kids: dict[int, list[int]] = {}
        for pid, ppid in ppid_of.items():
            kids.setdefault(ppid, []).append(pid)
        total_ticks, stack = 0, [me]
        while stack:
            pid = stack.pop()
            total_ticks += ticks_of.get(pid, 0)
            stack.extend(kids.get(pid, ()))
        return total_ticks / hz
    except (OSError, ValueError):
        return None


def jvm_gc_ms(spark) -> "int | None":
    """Cumulative stop-the-world GC time (ms) of the driver JVM via its
    GarbageCollectorMXBeans. In local[N] mode the driver JVM IS the
    entire Spark runtime (executors are driver threads), so a delta
    across a stage is the stage's total GC cost; in local-cluster or
    real cluster mode executor JVMs are NOT covered — use the Spark
    metrics system there. Used by the pipeline's per-stage telemetry to
    attribute own-CPU variance (round-5 verdict item 2: clean-gated
    iterations burned 2160-4982 CPU-s on identical input — constant
    useful work, variable GC/memory-stall work)."""
    try:
        beans = (
            spark._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        total = 0
        for b in beans:
            t = b.getCollectionTime()
            if t > 0:
                total += t
        return int(total)
    except Exception:
        return None


@dataclass
class CpuWindow:
    """steal/iowait/other-process percentages over a start()..stop()
    window.

    other_busy_pct is the share of TOTAL host CPU time burned by
    processes OUTSIDE this process tree — the co-tenant load the steal
    counter cannot see (round-4 verdict item 2: this host swings 2-3x
    at near-zero steal). It now GATES alongside steal/iowait; load1 is
    kept as a human-readable diagnostic (the 1-min average decays too
    slowly to gate: after our own 32-core iteration it stays elevated
    for a minute and would spuriously flag the next one)."""

    steal_pct: float = 0.0
    iowait_pct: float = 0.0
    other_busy_pct: float = 0.0
    load1: float = 0.0
    # CPU-seconds burned by THIS process tree inside the window.
    # Interpretation (corrected round 6 after a measured triplicate —
    # BENCH/HEADLINE.md "own-CPU reconciliation"): own_cpu_s is
    # invariant to SCHEDULING contention (time-slicing: our threads
    # simply run later) but NOT to memory-subsystem contention —
    # cycles stalled on a co-tenant-saturated memory bus or SMT
    # sibling are still scheduled and still charged as CPU time, so
    # heavy co-tenant load inflates own_cpu_s roughly in proportion to
    # wall (measured: 500k-file pipeline burns a stable ~2200-2400
    # CPU-s on a quiet host, 1.09x spread, but up to 4982 CPU-s at
    # load1~24 with the own_cpu/wall ratio near-constant). Read it as
    # a ratio: constant own_cpu_s with rising wall = pure scheduling
    # steal; own_cpu_s rising WITH wall at ~constant own_cpu/wall =
    # memory-stall inflation (co-tenant) — either way host noise, not
    # a code regression, which shows as more CPU at UNCHANGED wall
    # conditions. Never gates here; bench.py promotes it to a gate for
    # the kg_pipeline row only (within-run inflation vs the smallest
    # clean attempt — sound there because that job's work-constancy is
    # measured and its CPU totals dwarf tick granularity).
    own_cpu_s: float = 0.0
    available: bool = False

    def contaminated(
        self,
        steal_limit: float = 1.0,
        iowait_limit: float = 5.0,
        other_busy_limit: float = 10.0,
    ) -> bool:
        """True when the window saw enough hypervisor steal, IO stall,
        or co-tenant CPU to distrust a timing taken inside it. Limits
        are percentages of TOTAL host CPU time (32-way average — 1%
        average steal means ~1/3 of one core stolen continuously,
        measured in round 3 to shift short runs by 2x+; the 10%
        other-busy default is >3 co-tenant cores sustained, while idle
        system daemons measure <1%)."""
        return self.available and (
            self.steal_pct > steal_limit
            or self.iowait_pct > iowait_limit
            or self.other_busy_pct > other_busy_limit
        )


class CpuAudit:
    """Snapshot /proc/stat around a timed region:

        audit = CpuAudit.start()
        ... timed work ...
        window = audit.stop()
    """

    def __init__(self, before: "list[int] | None", own_before: "float | None"):
        self._before = before
        self._own_before = own_before

    @classmethod
    def start(cls) -> "CpuAudit":
        return cls(_cpu_ticks(), _own_cpu_seconds())

    def stop(self) -> CpuWindow:
        import os

        try:
            load1 = round(os.getloadavg()[0], 2)
        except OSError:
            load1 = 0.0
        after = _cpu_ticks()
        own_after = _own_cpu_seconds()
        if self._before is None or after is None:
            return CpuWindow(load1=load1)
        delta = [b - a for a, b in zip(self._before, after)]
        total = sum(delta)
        if total <= 0:
            return CpuWindow(load1=load1)
        # busy host ticks not attributable to our own process tree;
        # clamped at 0 (tick/rusage granularity can put ours slightly
        # above host busy on near-idle windows)
        other_pct = 0.0
        own_s = 0.0
        if own_after is not None and self._own_before is not None:
            hz = os.sysconf("SC_CLK_TCK")
            # process-attributable busy time only: idle/iowait are not
            # busy; steal is gated by its own threshold (leaving it here
            # double-counted it as co-tenant CPU); irq/softirq are
            # kernel interrupt work no process owns — this tree's own
            # heavy shuffle/disk I/O raises softirq, which would then be
            # misattributed to 'co-tenants' and spuriously reject
            # genuinely clean windows near the 10% limit (round-5
            # advice).
            busy = (
                total
                - delta[_IDX_IDLE]
                - delta[_IDX_IOWAIT]
                - delta[_IDX_STEAL]
                - delta[_IDX_IRQ]
                - delta[_IDX_SOFTIRQ]
            )
            own_s = max(0.0, own_after - self._own_before)
            own_ticks = own_s * hz
            other_pct = round(max(0.0, 100.0 * (busy - own_ticks) / total), 3)
        return CpuWindow(
            steal_pct=round(100.0 * delta[_IDX_STEAL] / total, 3),
            iowait_pct=round(100.0 * delta[_IDX_IOWAIT] / total, 3),
            other_busy_pct=other_pct,
            load1=load1,
            own_cpu_s=round(own_s, 2),
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
