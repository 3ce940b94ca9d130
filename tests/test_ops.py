"""Unit tests for training-data ops: planted near-dups, ANN recall,
simhash banding, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kgflow.ops import dedup, multimodal, similarity, text

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, BASE, "en", "s", len(BASE)),
        (1, BASE, "en", "s", len(BASE)),  # exact dup of 0
        (2, " ".join(reversed(BASE.split())), "en", "s", len(BASE)),  # bag dup of 0
        (3, BASE.replace("kappa", "kappax"), "en", "s", len(BASE)),  # near dup
        (4, "totally different words here made of unrelated stuff", "en", "s", 50),
        (5, BASE, "fr", "s", len(BASE)),  # exact text, other lang block
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_duplicates(spark, docs):
    got = dedup.exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0].n_docs == 3  # ids 0, 1, 5 share text
    assert got[0].keep_id == 0


def test_normalized_duplicates_catch_reordered(spark, docs):
    got = dedup.normalized_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0].n_docs == 4  # 0, 1, 2, 5
    assert got[0].keep_id == 0


def test_token_jaccard_blocked_by_lang(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in dedup.token_jaccard_pairs(docs, 0.9).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (0, 3) in pairs  # 19/21 shared tokens = 0.905
    assert not any(5 in p for p in pairs)  # lang block
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs, 0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_simhash_identical_and_near(spark, docs):
    fps = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1] == fps[2] == fps[5]  # token-set identical
    pairs = {(r.doc_a, r.doc_b) for r in dedup.simhash_pairs(docs, 3).collect()}
    assert (0, 1) in pairs
    hamming = bin(fps[0] ^ fps[4]).count("1")
    assert hamming > 3
    assert (0, 4) not in pairs


def test_simhash_partition_invariant(spark, docs):
    one = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs.repartition(1)).collect()}
    many = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs.repartition(5)).collect()}
    assert one == many


@pytest.fixture()
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # close to 0
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.95, 0.05], 1),  # close to 2
        (4, [-1.0, 0.0, 0.0], 2),  # opposite of 0
        (5, [0.8, 0.2, 0.0], 0),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _queries(vdf):
    return vdf.where(F.col("vec_id").isin(0, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_brute_force_topk_exact(spark, vectors):
    got = similarity.brute_force_topk(vectors, _queries(vectors), k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    assert sorted(by_q[0]) == [(1, 1), (2, 5)]
    assert sorted(by_q[2])[0] == (1, 3)


def test_lsh_topk_recall_on_tight_clusters(spark, vectors):
    got = similarity.lsh_topk(vectors, _queries(vectors), dim=3, k=2).collect()
    # LSH keeps same-bucket candidates; the nearest neighbor of each
    # query is nearly colinear so it must share the bucket
    found = {(r.query_id, r.vec_id) for r in got if r.rank == 1}
    assert (0, 1) in found
    assert (2, 3) in found


def test_embedding_near_dup_lsh_finds_planted_pairs(spark):
    """The LSH-bucketed near-dup scale path must (a) find every planted
    identical pair — same vector => same bucket with probability 1 —
    (b) emit each candidate pair at most once (the Hamming-<=1
    multiprobe uniqueness argument), and (c) agree with the
    label-blocked baseline on the planted pairs it also finds."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = similarity.plant_near_duplicate_vectors(emb)
    dim = len(emb.select("embedding").first()[0])

    lsh = similarity.embedding_near_duplicates_lsh(
        planted, dim=dim, threshold=0.95, bucket_cap=similarity.DEFAULT_BUCKET_CAP
    )
    rows = lsh.collect()
    pairs = [(r.vec_a, r.vec_b) for r in rows]
    assert len(pairs) == len(set(pairs)), "multiprobe emitted a duplicate pair"

    n_planted = planted.where(F.col("vec_id") >= 1_000_000).count()
    planted_pairs = {
        (r.vec_a, r.vec_b) for r in rows if r.vec_b == r.vec_a + 1_000_000
    }
    assert len(planted_pairs) == n_planted, (
        f"LSH path found {len(planted_pairs)}/{n_planted} planted clones"
    )
    for r in rows:
        if (r.vec_a, r.vec_b) in planted_pairs:
            assert r.cos == 1.0

    blocked = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_duplicates(planted, 0.95).collect()
    }
    assert planted_pairs <= blocked


def test_quality_scores_ranges(spark, docs):
    rows = text.quality_scores(docs).collect()
    for r in rows:
        assert 0 <= r.stopword_ratio <= 1
        assert 0 <= r.upper_ratio <= 1
        assert r.n_tokens > 0


def test_langid_profiles_self_classification(spark):
    # distinct vocabularies per lang -> classifier must recover labels
    rows = []
    for i in range(30):
        rows.append((i, "der die das und ist ein" + f" w{i%3}", "de", "s", 30))
        rows.append((100 + i, "the and was of to a" + f" w{i%3}", "en", "s", 30))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    profiles = text.language_profiles(docs, top_n=10)
    pred = text.classify_language(docs, profiles)
    joined = docs.join(pred, "doc_id")
    acc = joined.where(F.col("lang") == F.col("predicted_lang")).count() / joined.count()
    assert acc >= 0.95


def test_multimodal_feature_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x01\x02\x03" * 50), ("image/png", 8, 8, None)),
        (2, "image", bytearray(b"\x01\x02\x03" * 50), ("image/png", 8, 8, None)),
        (3, "audio", None, ("audio/wav", None, None, 2000)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r.asset_id: r.features for r in multimodal.extract_features(media).collect()}
    assert feats[1] == feats[2]  # deterministic: same bytes -> same features
    assert feats[3] == [0.0] * multimodal.FEATURE_DIM
    assert len(feats[1]) == multimodal.FEATURE_DIM


def test_multimodal_real_decoder_is_stubbed(spark):
    rows = [(1, "image", bytearray(b"xx"), ("image/png", 1, 1, None))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|imaging library"):
        multimodal.extract_features(media, use_real_decoder=True).collect()


def test_frame_sample_plan(spark):
    rows = [(1, "video", None, ("video/mp4", 640, 480, 3500)),
            (2, "image", None, ("image/png", 8, 8, None))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    assert {(r.asset_id, r.frame_ts_ms) for r in got} == {(1, 0), (1, 1000), (1, 2000), (1, 3000)}


def _pseudo_vectors(spark, n_clusters=20, per_cluster=10, dim=16):
    """Deterministic clustered vectors (no RNG state): hash-derived
    cluster centers, members = center + small hash-derived noise. True
    nearest neighbors are angularly close — the regime LSH targets
    (uniform random vectors have near-orthogonal neighbors, which no
    angular LSH can bucket together)."""
    import hashlib

    def hval(tag: str) -> float:
        h = int.from_bytes(hashlib.sha256(tag.encode()).digest()[:8], "big")
        return (h / 2**63) - 1.0

    rows = []
    vid = 0
    for k in range(n_clusters):
        center = [hval(f"center:{k}:{c}") for c in range(dim)]
        for m in range(per_cluster):
            vec = [center[c] + 0.05 * hval(f"noise:{k}:{m}:{c}") for c in range(dim)]
            rows.append((vid, [float(v) for v in vec], k))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_multiprobe_lsh_recall_floor(spark):
    """Multi-probe LSH must recover a reasonable share of the exact
    top-k and strictly dominate single-probe recall on a corpus large
    enough that single buckets go sparse."""
    vectors = _pseudo_vectors(spark)
    queries = vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(vectors, queries, k=5).collect()
    }
    multi = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_topk(vectors, queries, dim=16, k=5).collect()
    }
    single = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_topk(
            vectors, queries, dim=16, k=5, multiprobe=False
        ).collect()
    }
    recall_multi = len(exact & multi) / len(exact)
    recall_single = len(exact & single) / len(exact)
    assert recall_multi >= recall_single
    assert recall_multi >= 0.3, f"multiprobe recall {recall_multi:.2f} below floor"


def test_multiprobe_lsh_recall_at_100k(spark):
    """Recall at scale: >=0.9 of the exact top-5 on a 100k-vector
    corpus (2k clusters, sigma=0.05). Multi-probe Hamming-1 over the
    12-bit signature holds 1.0 here; if this floor ever breaks (more
    planes, different dim), band the signature (3x4-bit) per the
    dedup-LSH pattern instead of lowering the floor."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n, dim, nc = 100_000, 16, 2000
    centers = rng.normal(size=(nc, dim))
    idx = rng.integers(0, nc, size=n)
    vecs = centers[idx] + 0.05 * rng.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "embedding": [v.astype("float32").tolist() for v in vecs],
            "label": idx.astype("int32"),
        }
    )
    vectors = spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    )
    queries = vectors.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(vectors, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_topk(vectors, queries, dim=dim, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} at 100k vectors"


def test_ivf_topk_recall_and_cluster_cap(spark):
    """IVF-flat must recover a reasonable share of the exact top-5 on
    clustered vectors, improve with nprobe, and respect cluster_cap."""
    vectors = _pseudo_vectors(spark)
    queries = vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(vectors, queries, k=5).collect()
    }
    probe3 = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_topk(vectors, queries, dim=16, k=5).collect()
    }
    probe1 = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_topk(vectors, queries, dim=16, k=5, nprobe=1).collect()
    }
    r3 = len(exact & probe3) / len(exact)
    r1 = len(exact & probe1) / len(exact)
    assert r3 >= r1, "more probes must not lose recall"
    assert r3 >= 0.3, f"ivf nprobe=3 recall {r3:.2f} below floor"
    # cluster_cap bounds every inverted list: assert on the actual
    # per-cluster candidate counts of the at-rest index (round-4 advice:
    # the old `capped.count() >= 0` only proved the plan executed), and
    # that the cap genuinely binds on this corpus so the check is not
    # vacuous
    uncapped_max = max(
        r["count"]
        for r in similarity.ivf_assignments(vectors, dim=16)
        .groupBy("cluster")
        .count()
        .collect()
    )
    assert uncapped_max > 10, "corpus too small for the cap to bind — test is vacuous"
    per_cluster = (
        similarity.ivf_assignments(vectors, dim=16, cluster_cap=10)
        .groupBy("cluster")
        .count()
        .collect()
    )
    assert per_cluster and max(r["count"] for r in per_cluster) <= 10
    # and the capped top-k query still executes end to end
    assert similarity.ivf_topk(vectors, queries, dim=16, k=5, cluster_cap=10).count() > 0


def test_trained_centroids_beat_hash_seeded_recall(spark):
    """Round-4 verdict item 4: spherical-k-means-trained coarse
    centroids must beat the data-blind hash-seeded ones at equal nprobe
    on the clustered 100k corpus (same corpus construction as
    test_multiprobe_lsh_recall_at_100k). nprobe=1 exposes pure
    quantizer quality — with one probe, recall IS how well the centroid
    partition respects the data's cluster structure."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n, dim, nc = 100_000, 16, 2000
    centers = rng.normal(size=(nc, dim))
    idx = rng.integers(0, nc, size=n)
    vecs = centers[idx] + 0.05 * rng.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "embedding": [v.astype("float32").tolist() for v in vecs],
            "label": idx.astype("int32"),
        }
    )
    vectors = spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    )
    queries = vectors.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(vectors, queries, k=5).collect()
    }
    trained = similarity.train_centroids(vectors, dim=dim, n_centroids=16, n_iters=4)
    assert trained.count() == 16
    got_trained = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_topk(
            vectors, queries, dim=dim, k=5, nprobe=1, centroids=trained
        ).collect()
    }
    got_seeded = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_topk(
            vectors, queries, dim=dim, k=5, nprobe=1
        ).collect()
    }
    recall_trained = len(exact & got_trained) / len(exact)
    recall_seeded = len(exact & got_seeded) / len(exact)
    assert recall_trained > recall_seeded, (
        f"trained {recall_trained:.3f} must beat hash-seeded {recall_seeded:.3f}"
    )


def test_lsh_recall_and_bucket_cap_at_1m(spark):
    """Corpus-scale ANN (round-3 verdict item 5): at 1M vectors with
    planes_for-scaled signature width and a per-bucket cap,
      * recall of the exact top-5 stays >= 0.9, and
      * NO bucket exceeds the cap even with 20k adversarially identical
        spam vectors planted in one direction — the dense-bucket case
        that would otherwise make a probe O(corpus) at 10^9 vectors."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n, dim, nc, spam = 1_000_000, 16, 2000, 20_000
    centers = rng.normal(size=(nc, dim))
    idx = rng.integers(0, nc, size=n - spam)
    vecs = centers[idx] + 0.05 * rng.normal(size=(n - spam, dim))
    # planted degenerate bucket: spam copies of one direction
    spam_dir = rng.normal(size=dim)
    spam_vecs = np.tile(spam_dir, (spam, 1)) + 0.001 * rng.normal(size=(spam, dim))
    all_vecs = np.concatenate([vecs, spam_vecs])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "embedding": [v.astype("float32").tolist() for v in all_vecs],
            "label": np.concatenate([idx, np.full(spam, -1)]).astype("int32"),
        }
    )
    vectors = spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    )
    planes = similarity.planes_for(n)
    assert planes == 13  # log2(1e6/128) -> 13; scales to 23 at 10^9
    cap = similarity.DEFAULT_BUCKET_CAP

    # cap actually bounds the planted dense bucket
    capped = (
        vectors.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        )
        .withColumn("bucket", similarity.lsh_bucket(F.col("vec"), dim, planes))
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy(F.xxhash64("vec_id"))
            ),
        )
        .where(F.col("_r") <= cap)
        .groupBy("bucket")
        .count()
    )
    assert capped.agg(F.max("count")).first()[0] <= cap
    # ... and without the cap the spam bucket really is degenerate
    raw_max = (
        vectors.select(
            similarity.lsh_bucket(
                F.transform("embedding", lambda x: x.cast("double")), dim, planes
            ).alias("bucket")
        )
        .groupBy("bucket")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert raw_max >= spam

    queries = vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(vectors, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_topk(
            vectors, queries, dim=dim, k=5, planes=planes, bucket_cap=cap
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} at 1M vectors (planes={planes})"


def test_twin_agreement_on_corpus(spark):
    """Cross-family consistency gate (round-3 verdict item 7): the
    xxhash64 scale paths can't get a DuckDB oracle, so pin them to the
    oracle-verified md5 twins on the real sf0.001 documents corpus.

      * minhash: banding collisions are verified against the estimated
        Jaccard under BOTH families, so the flagged pair-sets must be
        essentially identical — Jaccard >= 0.95 (measured 1.0).
      * simhash: Hamming distance under different hash families is a
        genuinely different measure, so pair-set equality is NOT the
        invariant (measured ~0.2 — disagreement lives in the noise
        tail of a large near-dup cluster space). What must hold for
        both families: >= 0.95 of flagged pairs are REAL near-dups
        (token-Jaccard >= 0.3; a silently broken fast path would flag
        garbage and tank this), and the two sets overlap on signal
        (shared core non-empty)."""
    from kgflow.analytics.tables import load

    docs_sf = load(spark, "/root/testdata/sf0.001", "documents")

    xx = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs_sf, 0.5).collect()}
    md = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs_sf, 0.5, hash_family="md5").collect()
    }
    assert xx and md
    jac = len(xx & md) / len(xx | md)
    assert jac >= 0.95, f"minhash twin pair-set Jaccard {jac:.3f}"

    sets = docs_sf.select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.col("text")), "\\s+")).alias("toks"),
    )

    def precision(pairs, floor=0.3):
        a, b = sets.alias("a"), sets.alias("b")
        j = (
            pairs.join(a, pairs.doc_a == F.col("a.doc_id"))
            .join(b, pairs.doc_b == F.col("b.doc_id"))
            .select(
                (
                    F.size(F.array_intersect("a.toks", "b.toks"))
                    / F.size(F.array_union("a.toks", "b.toks"))
                ).alias("jac")
            )
        )
        tot = j.count()
        return j.where(F.col("jac") >= floor).count() / max(1, tot), tot

    sim_xx = dedup.simhash_pairs(docs_sf, 3)
    sim_md = dedup.simhash_pairs_md5(docs_sf, 3)
    p_xx, n_xx = precision(sim_xx)
    p_md, n_md = precision(sim_md)
    assert n_xx > 0 and n_md > 0
    assert p_xx >= 0.95, f"simhash xxhash64 precision {p_xx:.3f}"
    assert p_md >= 0.95, f"simhash md5 precision {p_md:.3f}"
    pairs_xx = {(r.doc_a, r.doc_b) for r in sim_xx.collect()}
    pairs_md = {(r.doc_a, r.doc_b) for r in sim_md.collect()}
    assert pairs_xx & pairs_md, "twin simhash sets share no signal"


def test_md5_twins_match_xxhash_shape(spark, docs):
    """The md5-seeded oracle twins run the same algorithm: on the
    planted fixture they must find the same near-dup pairs as the
    xxhash64 scale path (hash family changes bucketing noise, not the
    planted positives)."""
    xx = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs, 0.5).collect()}
    md = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, 0.5, hash_family="md5").collect()
    }
    assert (0, 1) in md  # planted exact dup always collides
    assert (0, 1) in xx
    sim_md = {(r.doc_a, r.doc_b) for r in dedup.simhash_pairs_md5(docs, 3).collect()}
    assert (0, 1) in sim_md
    assert (0, 2) in sim_md  # bag dup: same token set -> same simhash


# --------------------------------------------------------------------------
# At-rest ANN index persistence (SCALE.md "ANN index families at rest")
# --------------------------------------------------------------------------

def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _partition_filter_of(plan: str) -> str:
    assert "PartitionFilters: [" in plan, plan
    return plan.split("PartitionFilters: [")[1].split("]")[0]


def test_lsh_index_roundtrip_prunes_partitions(spark, tmp_path):
    """write_lsh_index -> lsh_topk_from_index must (a) return exactly
    lsh_topk's results over the same corpus and (b) prune the stored
    index scan to the probed bucket partitions — the static IN filter
    must appear as a PartitionFilter, not a post-scan Filter, which is
    what makes the at-rest layout read probes/2^planes of the corpus."""
    vectors = _pseudo_vectors(spark)
    queries = vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "lsh_index")
    similarity.write_lsh_index(vectors, path, dim=16)
    index = spark.read.parquet(path)
    got = similarity.lsh_topk_from_index(index, queries, dim=16, k=5)
    want = similarity.lsh_topk(vectors, queries, dim=16, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert "bucket" in _partition_filter_of(_plan(got))


def test_ivf_index_roundtrip_append_and_pruning(spark, tmp_path):
    """IVF at-rest index: build on part of the corpus, APPEND the rest
    (the incremental path — assignment is a deterministic expression of
    the embedding, so only new rows are indexed), then probe the stored
    table. Results must equal the in-memory ivf_topk over the full
    corpus, and the probe must prune to the nprobe cluster partitions."""
    vectors = _pseudo_vectors(spark)
    queries = vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(vectors.where(F.col("vec_id") < 100), path, dim=16)
    similarity.write_ivf_index(
        vectors.where(F.col("vec_id") >= 100), path, dim=16, mode="append"
    )
    index = spark.read.parquet(path)
    got = similarity.ivf_topk_from_index(index, queries, dim=16, k=5)
    want = similarity.ivf_topk(vectors, queries, dim=16, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert "cluster" in _partition_filter_of(_plan(got))


def test_ivf_index_with_trained_centroids(spark, tmp_path):
    """The stored-index path accepts the trained coarse quantizer too:
    build and probe with the SAME trained centroid table (the contract
    write_ivf_index documents) and match the in-memory trained path."""
    vectors = _pseudo_vectors(spark)
    queries = vectors.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    trained = similarity.train_centroids(vectors, dim=16, n_iters=2)
    path = str(tmp_path / "ivf_trained")
    similarity.write_ivf_index(vectors, path, dim=16, centroids=trained)
    index = spark.read.parquet(path)
    got = similarity.ivf_topk_from_index(
        index, queries, dim=16, k=5, centroids=trained
    )
    want = similarity.ivf_topk(vectors, queries, dim=16, k=5, centroids=trained)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ivf_join_assignment_matches_folded(spark):
    """The broadcast-join quantizer (the 4k-65k-inverted-list scale
    path, round-5 verdict item 3) must assign every vector to exactly
    the cluster the folded-literal path picks — same rounded cosine,
    same (sim desc, cluster asc) tie-break — at the default width and
    above the auto-switch threshold."""
    vectors = _pseudo_vectors(spark)
    for n in (16, 128):
        fold = {
            (r.vec_id, r.cluster)
            for r in similarity.ivf_assignments(
                vectors, dim=16, n_centroids=n, assign="fold"
            ).collect()
        }
        join = {
            (r.vec_id, r.cluster)
            for r in similarity.ivf_assignments(
                vectors, dim=16, n_centroids=n, assign="join"
            ).collect()
        }
        assert fold == join, f"join/fold assignment divergence at n={n}"


def test_ivf_wide_quantizer_auto_join_sane_plan(spark, tmp_path):
    """At >= 1024 centroids the auto path must use the broadcast-join
    quantizer: the plan stays O(1) in n_centroids (no 1024-branch
    folded array expression) and carries the broadcast join, and the
    path is wired through write_ivf_index -> stored index."""
    vectors = _pseudo_vectors(spark)
    asg = similarity.ivf_assignments(vectors, dim=16, n_centroids=1024)
    plan = _plan(asg)
    # a folded 1024-centroid quantizer embeds 1024 x 16 literals
    # (hundreds of KB of plan text); the join plan is constant-size
    assert len(plan) < 50_000, f"plan blew up: {len(plan)} chars"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    rows = asg.collect()
    assert len(rows) == vectors.count()
    assert all(0 <= r.cluster < 1024 for r in rows)

    path = str(tmp_path / "wide_ivf")
    similarity.write_ivf_index(vectors, path, dim=16, n_centroids=1024)
    stored = {
        (r.vec_id, r.cluster)
        for r in spark.read.parquet(path).select("vec_id", "cluster").collect()
    }
    assert stored == {(r.vec_id, r.cluster) for r in rows}
    # end-to-end probe at wide quantizer width: the query side ranks
    # probes via the join+window path (same threshold switch)
    queries = vectors.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = similarity.ivf_topk(vectors, queries, dim=16, k=5, n_centroids=1024)
    assert topk.count() > 0


def test_lsh_near_dup_from_index_matches_in_memory_with_append(spark, tmp_path):
    """Near-dup detection over the STORED LSH index (round-5 verdict
    item 6): build the index on the base corpus, APPEND only the
    planted clones (incremental shard path — old rows never
    re-bucketed), and the stored-index pair set must equal the
    in-memory path over the full planted corpus."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = similarity.plant_near_duplicate_vectors(emb)
    clones = planted.where(F.col("vec_id") >= 1_000_000)
    path = str(tmp_path / "lsh_nd_index")
    similarity.write_lsh_index(emb, path, dim=64)
    similarity.write_lsh_index(clones, path, dim=64, mode="append")
    index = spark.read.parquet(path)
    got = similarity.embedding_near_duplicates_lsh_from_index(index, threshold=0.95)
    want = similarity.embedding_near_duplicates_lsh(planted, dim=64, threshold=0.95)
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    assert len(got_rows) > 0  # planted clones guarantee cos=1.0 pairs


def test_train_centroids_wide_quantizer_join_path(spark):
    """Training a wide quantizer must route each Lloyd iteration's
    assignment through the broadcast-join path (no O(n_centroids)
    folded plan per iteration) and still return one centroid row per
    cluster with the input dimensionality."""
    vectors = _pseudo_vectors(spark)
    trained = similarity.train_centroids(vectors, dim=16, n_centroids=96, n_iters=2)
    rows = trained.collect()
    assert len(rows) == 96
    assert all(len(r.centroid) == 16 for r in rows)
    # trained table plugs into the stored-index path at wide widths too
    asg = similarity.ivf_assignments(vectors, dim=16, centroids=trained)
    assert asg.count() == vectors.count()
