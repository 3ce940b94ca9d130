"""End-to-end pipeline: triples match golden, resume skips stages,
materialization is idempotent, lineage is recorded per partition."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from kgflow import fixtures, lineage as lin
from kgflow.pipeline import run_pipeline

N_FILES = 200


@pytest.fixture()
def run_dir(tmp_path):
    return str(tmp_path / "run")


def _run(spark, run_dir, **kw):
    src = fixtures.source_files(spark, N_FILES)
    return run_pipeline(
        spark, src, run_dir, corpus_fingerprint=f"fixture-n{N_FILES}", **kw
    )


def test_end_to_end_triples_match_golden(spark, run_dir):
    report = _run(spark, run_dir)
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


def test_resume_skips_completed_stages(spark, run_dir):
    first = _run(spark, run_dir)
    assert first.skipped_stages() == []
    second = _run(spark, run_dir)
    assert set(second.skipped_stages()) == {
        "ingested", "triples", "alias_edges", "canonical_map", "nodes", "edges",
    }
    # simulate a failed materialize: wipe 'edges', re-run — only it recomputes
    shutil.rmtree(os.path.join(run_dir, "edges"))
    third = _run(spark, run_dir)
    assert "edges" not in third.skipped_stages()
    assert "triples" in third.skipped_stages()


def test_resume_output_identical(spark, run_dir):
    _run(spark, run_dir)
    before = sorted(
        (r.subj, r.pred, r.obj)
        for r in lin.read_stage(spark, run_dir, "triples").select("subj", "pred", "obj").collect()
    )
    shutil.rmtree(os.path.join(run_dir, "triples"))
    _run(spark, run_dir)
    after = sorted(
        (r.subj, r.pred, r.obj)
        for r in lin.read_stage(spark, run_dir, "triples").select("subj", "pred", "obj").collect()
    )
    assert before == after


def test_corpus_change_invalidates_downstream(spark, run_dir):
    src = fixtures.source_files(spark, N_FILES)
    run_pipeline(spark, src, run_dir, corpus_fingerprint="v1")
    report = run_pipeline(spark, src, run_dir, corpus_fingerprint="v2")
    assert report.skipped_stages() == []


def test_lineage_per_partition_counts_sum_to_total(spark, run_dir):
    _run(spark, run_dir)
    lineage = spark.read.parquet(os.path.join(run_dir, "triples", "lineage"))
    total = lineage.agg(F.sum("row_count")).collect()[0][0]
    with open(os.path.join(run_dir, "triples", "_MANIFEST.json")) as f:
        assert json.load(f)["row_count"] == total
    assert lineage.count() >= 1


def test_materialized_graph_constraints(spark, run_dir):
    _run(spark, run_dir)  # run_pipeline validates uniqueness + endpoints itself
    nodes = lin.read_stage(spark, run_dir, "nodes")
    edges = lin.read_stage(spark, run_dir, "edges")
    labels = {r[0] for r in nodes.select(":LABEL").distinct().collect()}
    assert {"File", "Language", "Repo", "Symbol", "Module"} <= labels
    types = {r[0] for r in edges.select(":TYPE").distinct().collect()}
    assert {"WRITTEN_IN", "DECLARES", "IMPORTS"} <= types


def test_alias_variants_share_canonical_node(spark, run_dir):
    _run(spark, run_dir)
    cmap = lin.read_stage(spark, run_dir, "canonical_map")
    by_member = {r.member: r.canonical for r in cmap.collect()}
    # every styled variant of the same base symbol that appears maps together
    groups: dict[str, set[str]] = {}
    for base in fixtures.BASE_SYMBOLS:
        variants = {style(base) for style in fixtures.ALIAS_STYLES}
        present = [v for v in variants if v in by_member]
        if len(present) >= 2:
            canon = {by_member[v] for v in present}
            assert len(canon) == 1, f"{base}: variants {present} map to {canon}"
            groups[base] = canon
    assert groups, "fixture corpus produced no alias groups — test vacuous"
