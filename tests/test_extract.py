"""Extraction correctness: golden P/R, engine equivalence, sha invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgflow import fixtures
from kgflow.stages.extract import extract
from kgflow.stages.ingest import ingest

N_FILES = 150


def _distinct_triples(df):
    return {(r.subj, r.pred, r.obj) for r in df.select("subj", "pred", "obj").distinct().collect()}


def test_extraction_precision_recall_vs_golden(spark):
    src = fixtures.source_files(spark, N_FILES)
    got = _distinct_triples(extract(ingest(src), engine="native"))
    want = {
        (r.subj, r.pred, r.obj)
        for r in fixtures.golden_triples(spark, N_FILES).collect()
    }
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.4f}; extras: {sorted(got - want)[:10]}"
    assert recall >= 0.95, f"recall {recall:.4f}; missing: {sorted(want - got)[:10]}"


def test_native_and_pandas_engines_identical(spark):
    src = fixtures.source_files(spark, N_FILES)
    ing = ingest(src)
    native = extract(ing, engine="native")
    pandas = extract(ing, engine="pandas")
    # exact multiset equality, both directions
    assert native.exceptAll(pandas).isEmpty()
    assert pandas.exceptAll(native).isEmpty()


def test_content_sha_preserved_through_extraction(spark):
    """BASELINE.json input_hint invariant: sha2(content,256) equality
    from ingest through extraction — every triple's src_sha must exist
    in the ingested table, and every non-empty file must be represented."""
    src = fixtures.source_files(spark, N_FILES)
    ing = ingest(src).cache()
    triples = extract(ing, engine="native")
    orphans = triples.select("src_sha").distinct().join(
        ing.select(F.col("content_sha").alias("src_sha")).distinct(),
        "src_sha",
        "left_anti",
    )
    assert orphans.isEmpty()
    # every file emits at least its WRITTEN_IN triple
    missing = ing.select(F.col("content_sha").alias("src_sha")).distinct().join(
        triples.select("src_sha").distinct(), "src_sha", "left_anti"
    )
    assert missing.isEmpty()
    ing.unpersist()


def test_unicode_identifiers_extracted(spark):
    src = fixtures.source_files(spark, 10)
    got = _distinct_triples(extract(ingest(src), engine="native"))
    assert any(o == "café_handler" for _, p, o in got if p == "DECLARES")
    assert any(o == "übermodel" for _, p, o in got if p == "DECLARES")


def test_empty_and_mentionless_files_emit_only_written_in(spark):
    src = fixtures.source_files(spark, 3)  # includes i=1 (empty), i=2 (filler)
    triples = extract(ingest(src), engine="native")
    per_file = (
        triples.groupBy("src_sha", "pred").count().collect()
    )
    # no DECLARES/IMPORTS from the empty or filler files beyond file 0's
    rec1 = fixtures._file_record(1, 3)
    rec2 = fixtures._file_record(2, 3)
    assert rec1["golden"] == [(f"{rec1['repo']}/{rec1['path']}", "WRITTEN_IN", rec1["lang"])]
    assert rec2["golden"] == [(f"{rec2['repo']}/{rec2['path']}", "WRITTEN_IN", rec2["lang"])]
    assert per_file  # sanity


def test_manifest_join_path_identical_to_inline(spark):
    """extract_with_manifest (hash-once, sha propagated by file_id)
    must emit exactly the same triples as inline-sha extraction."""
    from kgflow.stages.extract import extract_with_manifest
    from kgflow.stages.ingest import ingest_manifest

    src = fixtures.source_files(spark, 120)
    inline = extract(ingest(src), engine="native")
    joined = extract_with_manifest(src, ingest_manifest(src), engine="native")
    assert inline.exceptAll(joined).isEmpty()
    assert joined.exceptAll(inline).isEmpty()


def test_calls_predicate_extracted(spark):
    """CALLS rules (schemas.py predicate, previously dead) emit
    (file_ref, CALLS, callee) for python/javascript/go call sites in
    both engines; P/R golden covers exactness."""
    src = fixtures.source_files(spark, N_FILES)
    for engine in ("native", "pandas"):
        got = _distinct_triples(extract(ingest(src), engine=engine))
        calls = {(s, o) for s, p, o in got if p == "CALLS"}
        assert calls, f"{engine}: no CALLS triples"
        # every CALLS subj is a file_ref (contains a path), never a repo
        assert all("/src/" in s for s, _ in calls)


def test_null_content_emits_written_in_both_engines(spark):
    """NULL content must behave like empty content (round-1 advice):
    both engines emit the WRITTEN_IN triple, nothing else."""
    src = fixtures.source_files(spark, 10)  # includes i=9 (NULL content)
    rec9 = fixtures._file_record(9, 10)
    assert rec9["content"] is None
    ref9 = f"{rec9['repo']}/{rec9['path']}"
    for engine in ("native", "pandas"):
        got = extract(ingest(src), engine=engine)
        mine = [
            (r.subj, r.pred, r.obj)
            for r in got.where(F.col("subj") == ref9).collect()
        ]
        assert mine == [(ref9, "WRITTEN_IN", rec9["lang"])], f"{engine}: {mine}"


def test_bucketed_manifest_join_no_broadcast(spark):
    """broadcast=False (the 10^12-file path): byte-identical triples,
    and the physical plan must contain no BroadcastExchange."""
    from kgflow.stages.extract import extract_with_manifest
    from kgflow.stages.ingest import ingest_manifest

    src = fixtures.source_files(spark, 120)
    bcast = extract_with_manifest(src, ingest_manifest(src), engine="native")
    bucketed = extract_with_manifest(
        src, ingest_manifest(src), engine="native", broadcast=False
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, plan
    assert bcast.exceptAll(bucketed).isEmpty()
    assert bucketed.exceptAll(bcast).isEmpty()


def test_manifest_duplicates_do_not_fan_out(spark):
    """A duplicated manifest row must not duplicate triples (round-1
    advice: inner join on non-unique file_id fans out every triple)."""
    from kgflow.stages.extract import extract_with_manifest
    from kgflow.stages.ingest import ingest_manifest

    src = fixtures.source_files(spark, 40)
    man = ingest_manifest(src)
    doubled = man.unionByName(man)  # every file_id twice
    clean = extract_with_manifest(src, man, engine="native")
    dirty = extract_with_manifest(src, doubled, engine="native")
    assert clean.exceptAll(dirty).isEmpty()
    assert dirty.exceptAll(clean).isEmpty()
