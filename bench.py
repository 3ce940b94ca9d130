#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
full KG-construction pipeline throughput on the synthetic corpus.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "kg": {...}}

Each query is forced end-to-end with a noop-format write (full compute,
no sink cost) and timed KGFLOW_BENCH_ITERS times (default 3) after ONE
discarded, recorded warm-up execution (first-run codegen compile +
page-cache fill are deterministic cold costs, not steady-state
variance); the reported number is the MEDIAN, so one GC pause can't
fake a regression. One JVM for everything — per-query numbers exclude
Spark startup.

Every iteration is noise-audited (kgflow.audit): /proc/stat is
snapshotted around the timed window and iterations whose window saw
>1% hypervisor steal, >5% iowait, or >10% co-tenant CPU
(other_busy_pct — host busy time minus this process tree, the signal
that catches the load1 12-16 co-tenant windows round 4 published
through at near-zero steal) are REJECTED and re-attempted; rejected
attempts are recorded in history but excluded from the median, so the
published spread reflects clean windows only and the rejection rule is
pre-declared, not curated. The kg_pipeline headline is median-of-3
under the same audit, each iteration a fresh subprocess JVM over one
shared pre-materialized corpus (scaling.py protocol). The JSON carries
max observed steal/iowait/other-busy and a per-iteration contaminated
flag so a still-contaminated publish is self-describing.

The kg headline runs at 500k files (round-4 verdict item 3: at 60k the
~54 s fixed cost — link/canonicalize driver-side loops, stage
scheduling floors, eager checkpoints — dominated and the number
understated the engine). Fixed cost measured by a two-point fit on
this host (clean windows, 2026-08-17): 69.5 s at 60k vs 132.4 s at
300k files -> slope 0.262 ms/file, fixed ~53.8 s; at 500k the
projected ~185 s median is >=3x that fixed cost. The JSON publishes
the estimate and the ratio (kg.fixed_cost_est_sec, kg.vs_fixed_cost)
so the meaningfulness criterion is checkable from the artifact.

Every run also appends one record per query to BENCH/history.jsonl
(ts, sf, cpus, per-iteration timings) so cross-round comparisons are
per-query, not total-only.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_FILES = int(os.environ.get("KGFLOW_BENCH_FILES", "500000"))
ITERS = int(os.environ.get("KGFLOW_BENCH_ITERS", "3"))
# two-point fit on clean windows (see module docstring); scaled to the
# benched corpus size purely for the vs_fixed_cost ratio readout
KG_FIXED_COST_EST_SEC = 53.8
MAX_ATTEMPTS_PER_ITER = 3  # 1 measurement + up to 2 clean-window retries
HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "history.jsonl")

BENCH_QUERIES = [
    # scan + agg
    "pricing_summary",
    "customer_order_metrics",
    "part_count_distinct",
    "orders_by_quarter",
    # joins / windows / graph re-expressions
    "join_orders_customers",
    "copurchase_pairs",
    "copurchase_recommendations",
    "combined_recommendations",
    "supplier_risk",
    "customer_360",
    "topk_orders_per_customer",
    "customer_rfm",
    "customer_recency",
    "sql_api_revenue_by_nation",
    "graph_edges_per_type",
    "graph_enrich_customer_props",
    "theta_join_category_candidates",
    "events_sessionization",
    # training-data ops
    "dedup_exact",
    "dedup_normalized",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "langid_predict",
    "text_quality",
    "token_stats_by_lang",
]


from kgflow.audit import timed_audited


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    from kgflow.analytics import relational
    from kgflow.analytics.registry import QUERIES
    from kgflow import fixtures
    from kgflow.session import get_spark

    spark = get_spark("kgflow-bench", cores=CPUS)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    run_ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())

    # warm the JVM + parquet footers once
    _force(QUERIES["pricing_summary"](spark, SF_DIR))

    timings: dict[str, float] = {}
    history: list[dict] = []
    max_steal = max_iowait = max_other = 0.0
    n_contaminated = 0
    for name in BENCH_QUERIES:
        # Per-query discarded warm-up: caches are dropped between
        # queries (below), so each query's first execution pays one-time
        # costs the steady state never repeats — whole-stage codegen
        # compile, parquet footer reads, OS page-cache fill (measured:
        # dedup_exact first-iter 2.5 s vs 0.44 s warm, in every recorded
        # session). The warm-up is timed, recorded (warmup_sec), and
        # excluded from the median — pre-declared protocol, applied to
        # every query uniformly, so the published spread reflects
        # steady-state variance (the <2x criterion) rather than a known
        # deterministic cold cost.
        t0 = time.monotonic()
        _force(QUERIES[name](spark, SF_DIR))
        warmup_sec = round(time.monotonic() - t0, 3)
        iters, steals, iowaits, others, loads, flags = [], [], [], [], [], []
        owns: list[float] = []
        rejected: list[dict] = []
        for _ in range(ITERS):
            # re-attempt contaminated windows; keep the LAST attempt
            # (flagged) if none comes clean within the budget
            for attempt in range(MAX_ATTEMPTS_PER_ITER):
                elapsed, window, _ = timed_audited(
                    lambda: _force(QUERIES[name](spark, SF_DIR)), max_retries=0
                )
                if not window.contaminated() or attempt == MAX_ATTEMPTS_PER_ITER - 1:
                    break
                rejected.append(
                    {"sec": round(elapsed, 3), "steal_pct": window.steal_pct,
                     "iowait_pct": window.iowait_pct,
                     "other_busy_pct": window.other_busy_pct,
                     "own_cpu_s": window.own_cpu_s}
                )
            iters.append(round(elapsed, 3))
            steals.append(window.steal_pct)
            iowaits.append(window.iowait_pct)
            others.append(window.other_busy_pct)
            loads.append(window.load1)
            owns.append(window.own_cpu_s)
            flags.append(window.contaminated())
            max_steal = max(max_steal, window.steal_pct)
            max_iowait = max(max_iowait, window.iowait_pct)
            max_other = max(max_other, window.other_busy_pct)
            n_contaminated += int(window.contaminated())
        # drop caches BETWEEN queries (iterations of one query may share
        # them — a disclosed warm-cache median) so no query inherits
        # another's storage-memory pressure; measured: leftover persists
        # from 28 queries double the kg_pipeline stage times.
        # release_caches() unpersists the tracked CTE persists (which
        # clearCache alone leaves registered in the CacheManager).
        relational.release_caches()
        spark.catalog.clearCache()
        # GC hygiene: collect the evicted cache blocks + earlier
        # queries' garbage NOW, between queries, so an old-gen pause
        # does not land inside a later query's timed window (observed:
        # a 2.7 s iteration on the 0.4 s dedup_exact, 19 queries into
        # the run, on a steal/iowait/co-tenant-clean window — JVM debt,
        # not host noise). Uniform, pre-declared, outside every window.
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        timings[name] = round(statistics.median(iters), 3)
        history.append(
            {"ts": run_ts, "sf": sf, "cpus": CPUS, "query": name, "iters": iters,
             "median": timings[name], "warmup_sec": warmup_sec,
             "steal_pct": steals, "iowait_pct": iowaits,
             "other_busy_pct": others, "load1": loads, "own_cpu_s": owns,
             "contaminated": flags, "rejected": rejected}
        )

    # KG pipeline throughput (the BASELINE.json headline metric).
    # The synthetic corpus is materialized to parquet FIRST (untimed):
    # the measured number is pipeline throughput over a stored table,
    # not Python generator speed. Median-of-3 like every other query
    # (round 3 published a single contaminated iteration as the
    # headline). Each iteration runs in a FRESH subprocess JVM — the
    # long-lived bench JVM carries heap/GC debris from the 27-query
    # suite that measurably bimodalizes in-process pipeline runs
    # (observed same-JVM iters [44.7, 11.6, 42.4]s vs a fresh JVM's
    # stable 21-27s at 60k files); subprocess isolation is also exactly
    # the BENCH/scaling.py protocol, so the two artifacts compare.
    # run_pipeline.py's elapsed_sec excludes JVM/session startup.
    import subprocess

    kg_dir = tempfile.mkdtemp(prefix="kgflow_bench_")
    kg_iters, kg_steals, kg_iowaits, kg_others, kg_loads, kg_flags = (
        [], [], [], [], [], []
    )
    kg_owns: list[float] = []
    kg_rejected: list[dict] = []
    kg_triples = 0
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        corpus_path = os.path.join(kg_dir, "corpus")
        fixtures.source_files(spark, KG_FILES).write.parquet(corpus_path)

        def one_run(run_dir: str) -> dict:
            proc = subprocess.run(
                [sys.executable, os.path.join(repo, "run_pipeline.py"),
                 "--input", corpus_path, "--output", run_dir,
                 "--cores", str(CPUS)],
                capture_output=True, text=True, cwd=repo, timeout=3600,
            )
            if proc.returncode != 0:
                raise RuntimeError(f"pipeline failed:\n{proc.stderr[-2000:]}")
            return json.loads(proc.stdout[proc.stdout.index("{"):])

        for i in range(ITERS):
            for attempt in range(MAX_ATTEMPTS_PER_ITER):
                run_dir = os.path.join(kg_dir, f"run{i}a{attempt}")
                _, window, summary = timed_audited(
                    lambda: one_run(run_dir), max_retries=0
                )
                shutil.rmtree(run_dir, ignore_errors=True)
                if not window.contaminated() or attempt == MAX_ATTEMPTS_PER_ITER - 1:
                    break
                kg_rejected.append(
                    {"sec": summary["elapsed_sec"], "steal_pct": window.steal_pct,
                     "iowait_pct": window.iowait_pct,
                     "other_busy_pct": window.other_busy_pct,
                     "own_cpu_s": window.own_cpu_s}
                )
            kg_iters.append(summary["elapsed_sec"])
            kg_steals.append(window.steal_pct)
            kg_iowaits.append(window.iowait_pct)
            kg_others.append(window.other_busy_pct)
            kg_loads.append(window.load1)
            kg_owns.append(window.own_cpu_s)
            kg_flags.append(window.contaminated())
            kg_triples = summary["triples"]
            max_steal = max(max_steal, window.steal_pct)
            max_iowait = max(max_iowait, window.iowait_pct)
            max_other = max(max_other, window.other_busy_pct)
            n_contaminated += int(window.contaminated())
    finally:
        shutil.rmtree(kg_dir, ignore_errors=True)
    kg_elapsed = statistics.median(kg_iters)
    timings["kg_pipeline"] = round(kg_elapsed, 3)
    history.append(
        {"ts": run_ts, "sf": sf, "cpus": CPUS, "query": "kg_pipeline",
         "iters": kg_iters, "median": timings["kg_pipeline"],
         "steal_pct": kg_steals, "iowait_pct": kg_iowaits,
         "other_busy_pct": kg_others, "load1": kg_loads,
         "own_cpu_s": kg_owns, "contaminated": kg_flags,
         "rejected": kg_rejected,
         "n_files": KG_FILES, "triples": kg_triples}
    )

    try:
        os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
        with open(HISTORY, "a") as fh:
            for rec in history:
                fh.write(json.dumps(rec) + "\n")
    except OSError:
        pass  # history is best-effort; the stdout contract is what matters

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "iters": ITERS,
                "max_steal_pct": round(max_steal, 3),
                "max_iowait_pct": round(max_iowait, 3),
                "max_other_busy_pct": round(max_other, 3),
                "contaminated_iters": n_contaminated,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "kg": {
                    "n_files": KG_FILES,
                    "triples": kg_triples,
                    "elapsed_sec": round(kg_elapsed, 2),
                    "triples_per_sec": round(kg_triples / kg_elapsed, 1),
                    # headline-meaningfulness readout (round-4 verdict
                    # item 3): median vs the measured fixed-cost floor;
                    # >=3.0 means throughput, not startup, is measured
                    "fixed_cost_est_sec": KG_FIXED_COST_EST_SEC,
                    "vs_fixed_cost": round(kg_elapsed / KG_FIXED_COST_EST_SEC, 2),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
