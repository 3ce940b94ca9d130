#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
full KG-construction pipeline throughput on the synthetic corpus.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "kg": {...}}

Each query is forced end-to-end with a noop-format write (full compute,
no sink cost). One JVM for everything — per-query numbers exclude Spark
startup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_FILES = int(os.environ.get("KGFLOW_BENCH_FILES", "60000"))

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
    "supplier_risk",
    "customer_360",
    "topk_orders_per_customer",
    "customer_rfm",
    "customer_recency",
    "sql_api_revenue_by_nation",
    "graph_edges_per_type",
    # training-data ops
    "dedup_exact",
    "dedup_normalized",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
    "token_stats_by_lang",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    from kgflow.analytics.registry import QUERIES
    from kgflow.pipeline import run_pipeline
    from kgflow import fixtures
    from kgflow.session import get_spark

    spark = get_spark("kgflow-bench", cores=CPUS)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")

    # warm the JVM + parquet footers once
    _force(QUERIES["pricing_summary"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        _force(QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    # KG pipeline throughput (the BASELINE.json headline metric).
    # The synthetic corpus is materialized to parquet FIRST (untimed):
    # the measured number is pipeline throughput over a stored table,
    # not Python generator speed.
    kg_dir = tempfile.mkdtemp(prefix="kgflow_bench_")
    try:
        corpus_path = os.path.join(kg_dir, "corpus")
        fixtures.source_files(spark, KG_FILES).write.parquet(corpus_path)
        src = spark.read.parquet(corpus_path)
        t0 = time.monotonic()
        report = run_pipeline(
            spark,
            src,
            os.path.join(kg_dir, "run"),
            corpus_fingerprint=f"bench-{KG_FILES}",
            validate=False,
        )
        kg_elapsed = time.monotonic() - t0
    finally:
        shutil.rmtree(kg_dir, ignore_errors=True)
    timings["kg_pipeline"] = round(kg_elapsed, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "kg": {
                    "n_files": KG_FILES,
                    "triples": report.triples_emitted,
                    "elapsed_sec": round(kg_elapsed, 2),
                    "triples_per_sec": round(report.triples_emitted / kg_elapsed, 1),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
