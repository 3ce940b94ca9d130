#!/usr/bin/env python
"""Run the FULL test suite (no -x) and append a timestamped record to
PROGRESS.jsonl — the formal evidence trail for "suite green twice
consecutively on the round snapshot" (round-3 ask, closed per round-4
verdict item 5 by recording runs instead of asserting them).

Usage: python tools/green_suite.py [pytest-args...]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *sys.argv[1:]],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    elapsed = round(time.monotonic() - t0, 1)
    with open("/tmp/kgflow_suite_last.log", "w") as fh:  # full output, for triage
        fh.write(proc.stdout + proc.stderr)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    counts = {
        k: int(n)
        for n, k in re.findall(r"(\d+) (passed|failed|error|skipped|xfailed)", tail)
    }
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "event": "full_suite",
        "commit": head,
        "green": proc.returncode == 0,
        "counts": counts,
        "elapsed_sec": elapsed,
        "summary": tail,
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
