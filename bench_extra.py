#!/usr/bin/env python
"""Round-7 per-query measurement + plan capture (guide §1). bench.py is
FROZEN for the driver's measurement; this harness exists so the
optimization loop can time individual queries with the noop sink and
dump .explain("formatted") to plans/r07/<query>_<tag>.txt without
touching the frozen protocol.

Usage:
  python bench_extra.py plans <tag> [query ...]   # capture explain output
  python bench_extra.py time [query ...]          # min/median-of-N noop timings
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("KGFLOW_EXTRA_REPS", "4"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]

    from kgflow.analytics import relational
    from kgflow.analytics.registry import QUERIES
    from kgflow.session import get_spark

    spark = get_spark("kgflow-bench-extra", cores=CPUS)

    if mode == "plans":
        if not rest or rest[0] in QUERIES:
            # a missing tag would crash (or silently eat the first query
            # name as the tag) after Spark startup — fail fast instead
            raise SystemExit("usage: bench_extra.py plans <tag> [query ...]")
        tag = rest[0]
        names = rest[1:] or sorted(QUERIES)
        os.makedirs(PLANS_DIR, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            relational.release_caches()
            print(f"wrote {out}")
        return 0

    names = rest or sorted(QUERIES)
    results = {}
    for name in names:
        run = lambda: _force(QUERIES[name](spark, SF_DIR))  # noqa: E731
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        run()  # warm-up (codegen compile, page cache) — excluded
        relational.release_caches()
        samples = []
        for _ in range(REPS):
            t0 = time.monotonic()
            run()
            samples.append(round(time.monotonic() - t0, 3))
            relational.release_caches()
        spark.catalog.clearCache()
        results[name] = {
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
            "samples": samples,
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)
    total_min = round(sum(r["min"] for r in results.values()), 3)
    print(json.dumps({"total_min": total_min, "sf_dir": SF_DIR, "cpus": CPUS}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
