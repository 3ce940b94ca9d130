"""Stage 4 — canonicalization: connected components over alias edges.

Iterative large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — see PAPERS.md) expressed
as pure DataFrame rounds: each round is groupBy(min) + join, lineage is
cut with localCheckpoint every round, and convergence is an exact
edge-set fixpoint check. O(log n) rounds on pathological graphs; alias
graphs converge in 2-3.

The node ordering required by the algorithm is the symbol string's
natural (lexicographic) order — total, deterministic, and stable across
partitionings, so canonical ids are reproducible run-to-run (a
requirement the reference violates with wall-clock columns,
csv-ingestion.py:176).

Nothing like this exists in the reference — its "canonical ids" are
the source systems' primary keys. This is the genuinely new algorithmic
piece the north_star adds, and it is deliberately *not* GraphFrames:
a hand-rolled loop keeps the dependency surface to pyspark alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 25


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(N(u) ∪ {u})."""
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges (u >= v); connect each of u's small neighbors, and u
    itself, to the minimum small neighbor."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.join(m, "u").select(F.col("v").alias("src"), F.col("m").alias("dst"))
    selfs = m.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        nbrs.unionAll(selfs)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(alias_edges: DataFrame) -> DataFrame:
    """(src, dst) undirected edges -> (member, canonical) assignment.

    canonical = lexicographic min of each component; singletons (symbols
    with no alias edge) are implicitly canonical and simply absent from
    the returned map — callers coalesce to identity.
    """
    edges = (
        alias_edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _fingerprint(e: DataFrame) -> tuple:
        # order-insensitive edge-set fingerprint in ONE aggregate —
        # far cheaper than exceptAll anti-joins per round
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: order-insensitive and overflow-proof
            # (ANSI mode would reject a plain long sum of 64-bit hashes)
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("hsum"),
        ).collect()[0]
        return (row.n, row.hsum)

    prev_fp = _fingerprint(edges)
    # empty-graph early-out reuses the fingerprint's count — the
    # previous separate isEmpty() cost one more Spark job per run
    if prev_fp[0] == 0:
        return edges.select(F.col("src").alias("member"), F.col("dst").alias("canonical"))
    for _ in range(MAX_ITERATIONS):
        grown = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        fp = _fingerprint(grown)
        edges = grown
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected components did not converge in {MAX_ITERATIONS} iterations"
        )

    # Fixpoint is a star forest: every edge points member -> component min.
    return edges.select(F.col("src").alias("member"), F.col("dst").alias("canonical"))


def canonical_map(alias_edges: DataFrame) -> DataFrame:
    """Alias edges -> (member, canonical), including center self-rows so
    downstream joins can use an inner/left join uniformly."""
    cc = connected_components(alias_edges)
    centers = cc.select(F.col("canonical").alias("member"), F.col("canonical")).distinct()
    return cc.unionByName(centers).dropDuplicates(["member"])
