#!/usr/bin/env python
"""Throughput-scaling evidence: the same KG pipeline on the same input
at two executor-process counts — PRIMARY pairing local-cluster[1,1]
(N executors) vs local-cluster[4,1] (4N), single-core executors — per
the BASELINE.md §3 protocol, the sandbox substitute for the
north_rule's N vs 4N executor criterion. The WIDE 2-core pairing
([1,2] vs [4,2]) is also measured and published as a caveat row: its
4N level runs 8 concurrent streams, which saturates this host's
~17 GB/s memory bus, so it measures the shared bus, not the pipeline —
publishing both every round keeps the protocol change auditable.

The corpus is generated ONCE to parquet (untimed) and read by every
run, so the measurement is pipeline throughput over a stored table.
Every run is a fresh set of JVMs (subprocess). One warm-up per level is
discarded, then N and 4N runs are interleaved (shared-host load drift
hits both levels equally) and medians reported. Writes BENCH/BASELINE.md.

Set KGFLOW_SCALE_CORPUS=/path to reuse an existing corpus parquet.

Usage:  python BENCH/scaling.py [--files 300000] [--runs 3] [--wide-runs 1]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # hoisted: run_once used to prepend per call
    sys.path.insert(0, REPO)
from kgflow.audit import CpuAudit  # noqa: E402


def generate_corpus(files: int, path: str) -> None:
    """Fresh-JVM corpus materialization (exits so its memory is freed)."""
    code = (
        "from kgflow.session import get_spark\n"
        "from kgflow import fixtures\n"
        "spark = get_spark('corpus-gen', cores=32)\n"
        f"fixtures.source_files(spark, {files}).write.mode('overwrite').parquet({path!r})\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], cwd=REPO, check=True, timeout=3600)


def run_once(label: str, master: str, corpus: str, max_retries: int = 2) -> dict:
    """One fresh-JVM pipeline run; returns the CLI's JSON summary plus
    the /proc/stat steal/iowait percentages over the run's own window.

    Runs whose window saw >1% hypervisor steal (or >5% iowait) are
    re-run up to max_retries times — round 3 showed a steal window
    landing on one short 4N run drops the published efficiency from
    0.70 to 0.45 on identical code (BASELINE.md round-3 addendum); the
    audit makes every published number carry its own contamination
    evidence."""
    for attempt in range(max_retries + 1):
        out_dir = tempfile.mkdtemp(prefix=f"kgflow_scale_{label}_")
        try:
            audit = CpuAudit.start()
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "run_pipeline.py"),
                    "--input", corpus,
                    "--output", out_dir,
                    "--master", master,
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=7200,
            )
            window = audit.stop()
            if proc.returncode != 0:
                raise RuntimeError(f"pipeline failed at {master}:\n{proc.stderr[-2000:]}")
            payload = json.loads(proc.stdout[proc.stdout.index("{"):])
            # run_pipeline's own summary now carries own_cpu_s (pipeline
            # window, measured inside the subprocess) — keep it under
            # its own key; this harness's own_cpu_s is the parent-side
            # whole-run tree measure (includes JVM startup)
            payload["pipeline_own_cpu_s"] = payload.pop("own_cpu_s", None)
            payload["steal_pct"] = window.steal_pct
            payload["iowait_pct"] = window.iowait_pct
            payload["other_busy_pct"] = window.other_busy_pct
            payload["own_cpu_s"] = window.own_cpu_s
            if not window.contaminated() or attempt == max_retries:
                if window.contaminated():
                    print(
                        f"# WARNING {label}: window still contaminated after "
                        f"{max_retries} retries (steal={window.steal_pct}%)",
                        file=sys.stderr,
                    )
                return payload
            print(
                f"# {label}: steal={window.steal_pct}% iowait={window.iowait_pct}% "
                f"— contaminated window, re-running",
                file=sys.stderr,
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


# N executors vs 4N executors. Executor *processes* (local-cluster),
# not driver threads: a single JVM's threads anti-scale on this host
# (measured: pure-CPU xxhash job, local[8]=134s vs local[32]=246s), and
# separate processes also match a real cluster's topology.
# SINGLE-core executors: the host's memory-copy bandwidth saturates at
# ~8 concurrent streams (~17 GB/s measured), so the 2-core [1,2]/[4,2]
# pairing puts the 4N level (8 streams) into bus saturation and the
# measurement becomes one of the shared memory bus, not of the
# pipeline's scaling (round-1 vs round-2 comparison on identical code
# showed the [x,2] ratio swinging 0.87 -> 0.75 with host load alone).
# [1,1] vs [4,1] is literally 1 executor vs 4 executors, with the 4N
# level at 4 streams — below saturation. See BASELINE.md §3.
LEVELS = {
    "N": "local-cluster[1,1,4096]",
    "4N": "local-cluster[4,1,4096]",
}

# the bus-bound 2-core pairing, published as the caveat/ablation row
WIDE_LEVELS = {
    "N": "local-cluster[1,2,4096]",
    "4N": "local-cluster[4,2,4096]",
}


def measure(corpus: str, runs: int, levels: dict[str, str], warmup: bool = True) -> dict:
    # warm-ups (page cache, JIT profiles) — discarded. Skippable for
    # full-size corpora where a run is ~30 min and JIT warms within it.
    if warmup:
        for label, master in levels.items():
            run_once(label, master, corpus)
    # interleave N / 4N runs so slow drift in host load (shared VM,
    # noisy neighbors) hits both levels equally
    raw: dict[str, list[float]] = {label: [] for label in levels}
    steals: dict[str, list[float]] = {label: [] for label in levels}
    iowaits: dict[str, list[float]] = {label: [] for label in levels}
    others: dict[str, list[float]] = {label: [] for label in levels}
    owns: dict[str, list[float]] = {label: [] for label in levels}
    gcs: dict[str, list] = {label: [] for label in levels}
    triples = None
    for _ in range(runs):
        for label, master in levels.items():
            r = run_once(label, master, corpus)
            raw[label].append(r["elapsed_sec"])
            steals[label].append(r.get("steal_pct", -1.0))
            iowaits[label].append(r.get("iowait_pct", -1.0))
            others[label].append(r.get("other_busy_pct", -1.0))
            owns[label].append(r.get("own_cpu_s", -1.0))
            gcs[label].append(r.get("gc_ms"))
            triples = r["triples"]
            print(
                f"# run {label} {r['elapsed_sec']}s steal={r.get('steal_pct')}% "
                f"iowait={r.get('iowait_pct')}%",
                file=sys.stderr,
            )
    out = {}
    for label in levels:
        med = statistics.median(raw[label])
        out[label] = {
            "master": levels[label],
            "runs": sorted(raw[label]),
            "steal_pct": steals[label],
            "iowait_pct": iowaits[label],
            "other_busy_pct": others[label],
            # own-tree CPU-seconds per run: constant work at varying
            # wall-clock distinguishes host slowness from a regression
            "own_cpu_s": owns[label],
            # driver-JVM stop-the-world GC ms per run (executor JVMs
            # not covered in local-cluster mode — see audit.jvm_gc_ms)
            "gc_ms": gcs[label],
            "median_sec": med,
            "triples": triples,
            "triples_per_sec": round(triples / med, 1),
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=2400000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--wide-runs", type=int, default=1,
        help="interleaved runs for the 2-core caveat pairing (0 = skip)",
    )
    ap.add_argument(
        "--skip-warmup", action="store_true",
        help="skip the discarded warm-up run per level (full-size corpora)",
    )
    args = ap.parse_args()

    corpus = os.environ.get("KGFLOW_SCALE_CORPUS") or tempfile.mkdtemp(
        prefix="kgflow_scale_corpus_"
    )
    cleanup = "KGFLOW_SCALE_CORPUS" not in os.environ
    try:
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            generate_corpus(args.files, corpus)
        res = measure(corpus, args.runs, LEVELS, warmup=not args.skip_warmup)
        n, n4 = res["N"], res["4N"]
        wide = (
            measure(corpus, args.wide_runs, WIDE_LEVELS, warmup=not args.skip_warmup)
            if args.wide_runs
            else None
        )
    finally:
        if cleanup:
            shutil.rmtree(corpus, ignore_errors=True)
    efficiency = (n4["triples_per_sec"] / n["triples_per_sec"]) / 4
    if wide:
        wn, wn4 = wide["N"], wide["4N"]
        wide_eff = (wn4["triples_per_sec"] / wn["triples_per_sec"]) / 4
        wide_rows = (
            f"| N (wide) | {wn['master']} | {wn['median_sec']:.2f} | "
            f"{wn['triples']:,} | {wn['triples_per_sec']:,} |\n"
            f"| 4N (wide) | {wn4['master']} | {wn4['median_sec']:.2f} | "
            f"{wn4['triples']:,} | {wn4['triples_per_sec']:,} |"
        )
        wide_md = f"""
## Caveat pairing: 2-core executors (bus-bound ablation)

{wide_rows}

Wide-pairing efficiency = {wide_eff:.3f} (median of {args.wide_runs}
interleaved run(s)). The 4N level here runs 8 concurrent streams, past
this host's ~17 GB/s memory-copy saturation point, so the ratio
measures the shared memory bus rather than pipeline scaling — it is
published every round so the round-2 protocol change (2-core → 1-core
pairing) stays auditable and cannot drift into threshold-shopping.
"""
    else:
        wide_md = "\n(wide 2-core caveat pairing skipped: --wide-runs 0)\n"

    md = f"""# BENCH/BASELINE.md — throughput scaling evidence

Protocol: BASELINE.md §3. Identical deterministic synthetic corpus
({args.files:,} files, seed=42) materialized once to parquet; identical
full pipeline (ingest → extract → link → canonicalize → materialize)
reading that parquet; two executor-process counts (local-cluster mode —
the faithful analogue of N vs 4N executors; driver-thread local[N] mode
is NOT used because single-JVM threads anti-scale on this host).
{'One warm-up per level discarded, ' if not args.skip_warmup else 'Warm-up skipped (full-size runs self-warm), '}N/4N runs interleaved
against host-load drift, median of {args.runs}.

| level | master (executor processes x cores) | median sec | triples | triples/sec | steal% per run | iowait% per run | other-busy% per run |
|---|---|---|---|---|---|---|---|
| N  | {n['master']} | {n['median_sec']:.2f} | {n['triples']:,} | {n['triples_per_sec']:,} | {n['steal_pct']} | {n['iowait_pct']} | {n['other_busy_pct']} |
| 4N | {n4['master']} | {n4['median_sec']:.2f} | {n4['triples']:,} | {n4['triples_per_sec']:,} | {n4['steal_pct']} | {n4['iowait_pct']} | {n4['other_busy_pct']} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {efficiency:.3f}**
(north_rule target >= 0.8 — note a single shared-memory host under-states
true cluster scaling: all 32 threads contend for one memory bus and one
shuffle disk, costs a real 4x-executor cluster does not pay.)

Raw run times (sec): N={n['runs']}, 4N={n4['runs']}
Own-tree CPU-seconds per run: N={n['own_cpu_s']}, 4N={n4['own_cpu_s']}
Driver-JVM GC ms per run: N={n['gc_ms']}, 4N={n4['gc_ms']}
(constant own-CPU at varying wall-clock distinguishes host slowness
from a code regression; shared-host variance is large and interleaving
keeps the comparison fair).
Every run is noise-audited via /proc/stat around its own window;
windows with >1% hypervisor steal, >5% iowait, or >10% co-tenant CPU
(host busy time minus this process tree — the round-5 gate for the
near-zero-steal load swings round 4 documented) are re-run up to twice
and the per-run percentages above are published with the result — a
contaminated publish is self-describing (round-3 verdict item 2/3,
round-4 item 2).
{wide_md}
The per-round throughput headline (bench.py's kg row) and its
fixed-cost reconciliation live in BENCH/HEADLINE.md.

Environment: {platform.platform()}, Python {platform.python_version()},
Spark local-cluster mode (separate executor JVMs + per-executor Python
workers), 8 GiB per executor.
"""
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(md)
    result = {"n": n, "n4": n4, "efficiency": round(efficiency, 3)}
    if wide:
        result["wide"] = wide
        result["wide_efficiency"] = round(wide_eff, 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
