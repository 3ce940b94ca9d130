"""End-to-end pipeline: triples match golden, resume skips stages,
materialization is idempotent, lineage is recorded per partition.

One full pipeline run is shared module-wide; resume/invalidation tests
work on copies of its run directory instead of recomputing.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from kgflow import fixtures, lineage as lin
from kgflow.pipeline import run_pipeline

N_FILES = 150
FP = f"fixture-n{N_FILES}"


def _run(spark, run_dir):
    src = fixtures.source_files(spark, N_FILES)
    return run_pipeline(spark, src, run_dir, corpus_fingerprint=FP)


@pytest.fixture(scope="module")
def base_run(spark, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("kg") / "run")
    report = _run(spark, run_dir)
    return run_dir, report


@pytest.fixture()
def run_copy(base_run, tmp_path):
    src_dir, _ = base_run
    dst = str(tmp_path / "run")
    shutil.copytree(src_dir, dst)
    return dst


def test_end_to_end_triples_match_golden(spark, base_run):
    run_dir, report = base_run
    assert report.triples_emitted > 0
    got = {
        (r.subj, r.pred, r.obj)
        for r in lin.read_stage(spark, run_dir, "triples")
        .select("subj", "pred", "obj")
        .distinct()
        .collect()
    }
    want = {
        (r.subj, r.pred, r.obj)
        for r in fixtures.golden_triples(spark, N_FILES).collect()
    }
    tp = len(got & want)
    assert tp / len(got) >= 0.95
    assert tp / len(want) >= 0.95


def test_resume_skips_completed_stages(spark, run_copy):
    second = _run(spark, run_copy)
    assert set(second.skipped_stages()) == {
        "ingested", "triples", "alias_edges", "canonical_map", "nodes", "edges",
    }
    # simulate a failed materialize: wipe 'edges', re-run — only it recomputes
    shutil.rmtree(os.path.join(run_copy, "edges"))
    third = _run(spark, run_copy)
    assert "edges" not in third.skipped_stages()
    assert "triples" in third.skipped_stages()


def test_resume_output_identical(spark, base_run, run_copy):
    base_dir, _ = base_run
    before = sorted(
        (r.subj, r.pred, r.obj)
        for r in lin.read_stage(spark, base_dir, "triples").select("subj", "pred", "obj").collect()
    )
    shutil.rmtree(os.path.join(run_copy, "triples"))
    _run(spark, run_copy)
    after = sorted(
        (r.subj, r.pred, r.obj)
        for r in lin.read_stage(spark, run_copy, "triples").select("subj", "pred", "obj").collect()
    )
    assert before == after


def test_corpus_change_invalidates_downstream(spark, run_copy):
    src = fixtures.source_files(spark, N_FILES)
    report = run_pipeline(spark, src, run_copy, corpus_fingerprint="v2")
    assert report.skipped_stages() == []


def test_lineage_per_partition_counts_sum_to_total(spark, base_run):
    run_dir, _ = base_run
    lineage = spark.read.parquet(os.path.join(run_dir, "triples", "lineage"))
    total = lineage.agg(F.sum("row_count")).collect()[0][0]
    with open(os.path.join(run_dir, "triples", "_MANIFEST.json")) as f:
        assert json.load(f)["row_count"] == total
    assert lineage.count() >= 1


def test_materialized_graph_constraints(spark, base_run):
    run_dir, _ = base_run  # run_pipeline validates uniqueness + endpoints itself
    nodes = lin.read_stage(spark, run_dir, "nodes")
    edges = lin.read_stage(spark, run_dir, "edges")
    labels = {r[0] for r in nodes.select(":LABEL").distinct().collect()}
    assert {"File", "Language", "Repo", "Symbol", "Module"} <= labels
    types = {r[0] for r in edges.select(":TYPE").distinct().collect()}
    assert {"WRITTEN_IN", "DECLARES", "IMPORTS"} <= types


def test_alias_variants_share_canonical_node(spark, base_run):
    run_dir, _ = base_run
    cmap = lin.read_stage(spark, run_dir, "canonical_map")
    by_member = {r.member: r.canonical for r in cmap.collect()}
    groups: dict[str, set[str]] = {}
    for base in fixtures.BASE_SYMBOLS:
        variants = {style(base) for style in fixtures.ALIAS_STYLES}
        present = [v for v in variants if v in by_member]
        if len(present) >= 2:
            canon = {by_member[v] for v in present}
            assert len(canon) == 1, f"{base}: variants {present} map to {canon}"
            groups[base] = canon
    assert groups, "fixture corpus produced no alias groups — test vacuous"
