"""Property-based tests (hypothesis): connected components against a
driver-side union-find oracle, minhash Jaccard estimation accuracy,
extraction invariance to partitioning."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgflow import fixtures
from kgflow.stages.canonicalize import connected_components
from kgflow.stages.extract import extract
from kgflow.stages.ingest import ingest

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

nodes = st.integers(min_value=0, max_value=25)
edge_lists = st.lists(
    st.tuples(nodes, nodes).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _union_find_oracle(pairs):
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # full-compress: member -> component min
    return {x: find(x) for x in parent}


@given(edge_lists)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, pairs):
    named = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs]
    expected = {
        m: c for m, c in _union_find_oracle(named).items() if m != c
    }
    got = {
        (r.member): r.canonical
        for r in connected_components(
            spark.createDataFrame(named, "src string, dst string")
        ).collect()
    }
    assert got == expected


@given(
    st.sets(st.integers(0, 400), min_size=20, max_size=120),
    st.sets(st.integers(0, 400), min_size=20, max_size=120),
)
@settings(**SETTINGS)
def test_minhash_estimates_jaccard(spark, set_a, set_b):
    """Signature agreement / NUM_HASHES must track true Jaccard within
    the binomial noise bound for 32 hashes (~3 sigma)."""
    from pyspark.sql import functions as F

    from kgflow.ops.dedup import NUM_HASHES

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"tok{x}" for x in sorted(set_a))),
            (1, " ".join(f"tok{x}" for x in sorted(set_b))),
        ],
        "doc_id long, text string",
    )
    toks = F.array_distinct(F.split(F.col("text"), " "))

    def hash_j(j):
        return lambda s: F.xxhash64(s, F.lit(j))

    sig = docs.select(
        "doc_id",
        F.array(
            *[F.array_min(F.transform(toks, hash_j(j))) for j in range(NUM_HASHES)]
        ).alias("sig"),
    ).collect()
    sigs = {r.doc_id: r.sig for r in sig}
    est = sum(1 for a, b in zip(sigs[0], sigs[1]) if a == b) / NUM_HASHES
    true = len(set_a & set_b) / len(set_a | set_b)
    sigma = (true * (1 - true) / NUM_HASHES) ** 0.5
    assert abs(est - true) <= max(3.5 * sigma, 0.12)


def test_extraction_invariant_to_partitioning(spark):
    src = fixtures.source_files(spark, 80)
    one = extract(ingest(src.repartition(1)), engine="native")
    many = extract(ingest(src.repartition(13)), engine="native")
    assert one.exceptAll(many).isEmpty()
    assert many.exceptAll(one).isEmpty()
