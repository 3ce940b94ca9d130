#!/usr/bin/env python
"""Throughput-scaling evidence: the same KG pipeline on the same input
at two parallelism levels (local[8] = N, local[32] = 4N), per the
BASELINE.md §3 protocol — the sandbox substitute for the north_rule's
N vs 4N executor criterion.

The corpus is generated ONCE to parquet (untimed) and read by every
run, so the measurement is pipeline throughput over a stored table.
Each level runs in a fresh JVM (subprocess) so core counts are really
independent. Per level: 1 discarded warm-up, then median of --runs
timed runs. Writes BENCH/BASELINE.md.

Usage:  python BENCH/scaling.py [--files 60000] [--runs 3]
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


def run_once(cores: int, corpus: str) -> dict:
    """One fresh-JVM pipeline run; returns the CLI's JSON summary."""
    out_dir = tempfile.mkdtemp(prefix=f"kgflow_scale_{cores}_")
    try:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "run_pipeline.py"),
                "--input", corpus,
                "--output", out_dir,
                "--cores", str(cores),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=3600,
        )
        if proc.returncode != 0:
            raise RuntimeError(f"pipeline failed at cores={cores}:\n{proc.stderr[-2000:]}")
        payload = proc.stdout[proc.stdout.index("{"):]
        return json.loads(payload)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def measure(cores: int, corpus: str, runs: int) -> dict:
    run_once(cores, corpus)  # warm-up (page cache, JIT profiles) — discarded
    results = [run_once(cores, corpus) for _ in range(runs)]
    times = sorted(r["elapsed_sec"] for r in results)
    med = statistics.median(times)
    triples = results[0]["triples"]
    return {
        "cores": cores,
        "runs": times,
        "median_sec": med,
        "triples": triples,
        "triples_per_sec": round(triples / med, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=60000)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    corpus = tempfile.mkdtemp(prefix="kgflow_scale_corpus_")
    try:
        generate_corpus(args.files, corpus)
        n = measure(8, corpus, args.runs)
        n4 = measure(32, corpus, args.runs)
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
    efficiency = (n4["triples_per_sec"] / n["triples_per_sec"]) / 4

    md = f"""# BENCH/BASELINE.md — throughput scaling evidence

Protocol: BASELINE.md §3. Identical deterministic synthetic corpus
({args.files:,} files, seed=42) materialized once to parquet; identical
full pipeline (ingest → extract → link → canonicalize → materialize)
reading that parquet; two fresh-JVM parallelism levels. 1 warm-up
discarded, median of {args.runs} timed runs.

| level | cores | median sec | triples | triples/sec |
|---|---|---|---|---|
| N  | 8  | {n['median_sec']:.2f} | {n['triples']:,} | {n['triples_per_sec']:,} |
| 4N | 32 | {n4['median_sec']:.2f} | {n4['triples']:,} | {n4['triples_per_sec']:,} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {efficiency:.3f}**
(north_rule target >= 0.8 — note a single shared-memory host under-states
true cluster scaling: all 32 threads contend for one memory bus and one
shuffle disk, costs a real 4x-executor cluster does not pay.)

Raw run times (sec): N={n['runs']}, 4N={n4['runs']}

Environment: {platform.platform()}, Python {platform.python_version()},
local-mode Spark (single JVM), shuffle partitions = 2x cores.
"""
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(md)
    print(json.dumps({"n": n, "n4": n4, "efficiency": round(efficiency, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
