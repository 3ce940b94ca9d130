"""Tests for the IVF-PQ index family (kgflow.ops.pq): encoding
determinism, ADC recall against the exact baseline, and the at-rest
IVF-PQ layout including the append path and partition pruning."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kgflow.ops import pq, similarity

from test_ops import _pseudo_vectors  # deterministic clustered corpus


def _queries(vdf, n=4):
    return vdf.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_pq_encode_shapes_and_determinism(spark):
    vectors = _pseudo_vectors(spark)
    codes = pq.pq_encode(vectors, dim=16)
    rows = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert len(rows) == vectors.count()
    assert all(len(c) == pq.PQ_SUBSPACES for c in rows.values())
    assert all(0 <= x < pq.PQ_CODES for c in rows.values() for x in c)
    again = {r.vec_id: list(r.codes) for r in pq.pq_encode(vectors, dim=16).collect()}
    assert rows == again  # deterministic given fixed (seeded) codebooks


def test_pq_identical_vectors_share_codes(spark):
    """Scale-invariant + clone-consistent: an exact duplicate (and any
    positive scaling of it, since vectors are unit-normalized first)
    must encode to the identical code word."""
    vectors = _pseudo_vectors(spark)
    clones = vectors.where(F.col("vec_id") == 0).select(
        F.lit(999_999).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
        "label",
    )
    planted = vectors.unionByName(clones)
    rows = {r.vec_id: list(r.codes) for r in pq.pq_encode(planted, dim=16).collect()}
    assert rows[999_999] == rows[0]


def test_pq_topk_recall_floor_and_cluster_locality(spark):
    """ADC top-k must recover a reasonable share of the exact cosine
    top-k on clustered data, and each query's nearest ADC hit must
    come from its own semantic cluster (labels encode the cluster)."""
    vectors = _pseudo_vectors(spark)
    queries = _queries(vectors)
    cb = pq.train_pq_codebooks(vectors, dim=16, n_iters=3)
    codes = pq.pq_encode(vectors, dim=16, codebooks=cb)
    got = pq.pq_topk(codes, queries, dim=16, topk=5, codebooks=cb).collect()
    exact = similarity.brute_force_topk(vectors, queries, k=5).collect()
    want = {(r.query_id, r.vec_id) for r in exact}
    hit = sum(1 for r in got if (r.query_id, r.vec_id) in want)
    recall = hit / len(want)
    assert recall >= 0.3, f"PQ ADC recall {recall:.2f} below floor"
    labels = {r.vec_id: r.label for r in vectors.collect()}
    for r in got:
        if r.rank == 1:
            assert labels[r.vec_id] == labels[r.query_id], (
                f"rank-1 ADC hit {r.vec_id} from wrong cluster for {r.query_id}"
            )


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_ivfpq_index_roundtrip_append_and_pruning(spark, tmp_path):
    """Stored IVF-PQ index: build on part of the corpus, APPEND the
    rest, probe — results must equal probing the in-memory index table
    over the full corpus, and the stored probe must prune to the
    nprobe cluster partitions (PartitionFilters, not post-scan
    Filter)."""
    vectors = _pseudo_vectors(spark)
    queries = _queries(vectors, 8)
    path = str(tmp_path / "ivfpq_index")
    pq.write_ivfpq_index(vectors.where(F.col("vec_id") < 100), path, dim=16)
    pq.write_ivfpq_index(
        vectors.where(F.col("vec_id") >= 100), path, dim=16, mode="append"
    )
    stored = spark.read.parquet(path)
    got = pq.ivfpq_topk_from_index(stored, queries, dim=16, topk=5)
    mem = pq.ivfpq_index_table(vectors, dim=16)
    want = pq.ivfpq_topk_from_index(mem, queries, dim=16, topk=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    plan = _plan(got)
    assert "PartitionFilters: [" in plan
    assert "cluster" in plan.split("PartitionFilters: [")[1].split("]")[0]


def test_ivfpq_code_payload_is_compact(spark, tmp_path):
    """The index must store codes, never the raw vectors — the whole
    point of PQ at 10^9 vectors is that the probe path reads ~8-16 B
    per row."""
    vectors = _pseudo_vectors(spark)
    path = str(tmp_path / "ivfpq_small")
    pq.write_ivfpq_index(vectors, path, dim=16)
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "codes", "cluster"}


def test_ivfpq_index_with_trained_components(spark, tmp_path):
    """The stored IVF-PQ path accepts trained coarse centroids AND
    trained sub-codebooks together — build and probe with the SAME
    persisted tables (the documented contract) and match the in-memory
    index table under identical parameters."""
    vectors = _pseudo_vectors(spark)
    queries = _queries(vectors)
    trained_cents = similarity.train_centroids(vectors, dim=16, n_iters=2)
    trained_cb = pq.train_pq_codebooks(vectors, dim=16, n_iters=2)
    path = str(tmp_path / "ivfpq_trained")
    pq.write_ivfpq_index(
        vectors, path, dim=16, centroids=trained_cents, codebooks=trained_cb
    )
    stored = spark.read.parquet(path)
    got = pq.ivfpq_topk_from_index(
        stored, queries, dim=16, topk=5,
        centroids=trained_cents, codebooks=trained_cb,
    )
    mem = pq.ivfpq_index_table(
        vectors, dim=16, centroids=trained_cents, codebooks=trained_cb
    )
    want = pq.ivfpq_topk_from_index(
        mem, queries, dim=16, topk=5,
        centroids=trained_cents, codebooks=trained_cb,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
