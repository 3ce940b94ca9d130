#!/usr/bin/env python
"""Round-7 measurement harness (guide §1): decompose the kg_pipeline's
two dominant stages (ingested ~50-190 s, triples ~30-70 s of the ~130-210 s
total at 500k files — BENCH/history.jsonl per-stage telemetry) into their
constituent costs with noop-sink isolation. Bench.py itself is FROZEN;
this file only informs the optimization and is cited from
OPTIMIZATION_r07.md.

Usage: python tools/profile_kg.py [n_files] [step ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ONLY = set(sys.argv[2:])

from pyspark.sql import functions as F

from kgflow import fixtures
from kgflow.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("kgflow-profile", cores=CPUS)

corpus_path = f"/tmp/kgprof_corpus_{N}"
if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
    fixtures.source_files(spark, N).write.mode("overwrite").parquet(corpus_path)

src = spark.read.parquet(corpus_path)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(name, fn, reps=2):
    if ONLY and name not in ONLY:
        return
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"step": name, "n_files": N, "best_sec": round(best, 2)}),
          flush=True)


spark.sparkContext.setJobDescription("A: scan corpus only")
timed("A_scan_only", lambda: noop(src))

spark.sparkContext.setJobDescription("B: scan + arrow sha256")
# the REAL Arrow pandas-UDF sha (inlined: kgflow.functions.sha256_hex
# now points at the JVM builtin, so importing it here would silently
# measure the same implementation as step B2)
import hashlib

import pandas as _pd


@F.pandas_udf("string")
def _arrow_sha(s: _pd.Series) -> _pd.Series:
    return s.map(lambda t: hashlib.sha256(t.encode()).hexdigest())


timed("B_scan_sha_arrow", lambda: noop(
    src.select(_arrow_sha(F.coalesce(F.col("content"), F.lit(""))).alias("s"))
))

spark.sparkContext.setJobDescription("B2: scan + JVM sha2")
timed("B2_scan_sha_jvm", lambda: noop(
    src.select(F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("s"))
))

spark.sparkContext.setJobDescription("C: full ingest projection, noop")
from kgflow.stages.ingest import ingest_manifest

timed("C_ingest_noop", lambda: noop(ingest_manifest(src)))

spark.sparkContext.setJobDescription("C2: full ingest projection, parquet write")
timed("C2_ingest_write", lambda: ingest_manifest(src).write.mode("overwrite")
      .parquet(f"/tmp/kgprof_manifest_{N}"))

spark.sparkContext.setJobDescription("D: native extraction, inline file_id, noop")
from kgflow.stages.extract import extract, extract_with_manifest

keyed = src.select(
    "repo", "path", "commit", "lang", "content",
    F.concat(
        F.lpad(F.hex(F.xxhash64("repo", "path", "commit")), 16, "0"),
        F.lpad(F.hex(F.xxhash64("commit", "path", "repo")), 16, "0"),
    ).alias("content_sha"),
)
timed("D_extract_native_noop", lambda: noop(extract(keyed, engine="native")))

spark.sparkContext.setJobDescription("E: extract_with_manifest broadcast, noop")
if not ONLY or "E_extract_manifest_noop" in ONLY:
    # guard: step E needs C2's manifest on disk (a fresh host running a
    # filtered step list would otherwise crash on the unconditional read)
    import os as _os

    mpath = f"/tmp/kgprof_manifest_{N}"
    if not _os.path.exists(mpath):
        ingest_manifest(src).write.mode("overwrite").parquet(mpath)
    manifest = spark.read.parquet(mpath)
    timed("E_extract_manifest_noop", lambda: noop(
        extract_with_manifest(src, manifest, engine="native", broadcast=True)
    ))

spark.sparkContext.setJobDescription(None)
