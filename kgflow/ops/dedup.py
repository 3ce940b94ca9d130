"""Document deduplication operators.

Exact and normalized dedup are pure hash-groupBys (one shuffle on the
hash — the scalable shape). Near-dup comes in two flavors:

  * ``token_jaccard_pairs`` — deterministic blocked brute force used as
    the oracle-checked correctness baseline (blocking on lang bounds the
    quadratic term; at 100 TB you'd block on minhash bands instead);
  * ``minhash_lsh_pairs`` — the scale path: banded minhash over token
    3-gram shingles, candidate pairs only within (capped) LSH buckets,
    similarity verified from signature agreement. Same algorithm
    family as the entity-linking stage (kgflow/stages/link.py) but
    over documents.
  * ``simhash_fingerprints`` / ``simhash_pairs`` — 64-bit simhash via
    bit-majority of token xxhash64s; near-dups collide on all but a few
    bits and are found by banding the fingerprint into 4 x 16-bit keys
    (Hamming distance <= 3 guarantees a matching band).

All operators are pure DataFrame expressions — no Python on the
datapath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_N = 3
NUM_HASHES = 32
BANDS = 16  # 2 rows per band -> catches jaccard >= ~0.5


def _tokens(col) -> F.Column:
    return F.split(col, " ")


def _token_set(col) -> F.Column:
    return F.array_sort(F.array_distinct(_tokens(col)))


def word_shingles(col, n: int = SHINGLE_N) -> F.Column:
    """Token n-grams as strings: deterministic, order-preserving."""
    toks = _tokens(col)
    count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


PLANT_EVERY = 10
PLANT_OFFSET = 1_000_000


def plant_exact_duplicates(docs: DataFrame) -> DataFrame:
    """Deterministically derive a corpus WITH duplicates from one
    without: every PLANT_EVERY-th document is re-inserted verbatim under
    doc_id+PLANT_OFFSET. Used by the oracle-checked dedup queries so the
    duplicate-detection path is exercised with a non-empty result on any
    input (the driver's synthetic tables contain no natural dups)."""
    clones = docs.where(F.col("doc_id") % PLANT_EVERY == 0).withColumn(
        "doc_id", F.col("doc_id") + PLANT_OFFSET
    )
    return docs.unionByName(clones)


def plant_reordered_duplicates(docs: DataFrame) -> DataFrame:
    """Same planting, but clones carry the token-REVERSED text: invisible
    to exact dedup, caught by bag-of-words (normalized) dedup."""
    clones = (
        docs.where(F.col("doc_id") % PLANT_EVERY == 0)
        .withColumn("doc_id", F.col("doc_id") + PLANT_OFFSET)
        .withColumn("text", F.array_join(F.reverse(_tokens(F.col("text"))), " "))
    )
    return docs.unionByName(clones)


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: groups with >1 doc, keeping the
    representative (min id) — sha2-groupBy, the hash-partition-friendly
    shape."""
    from kgflow.functions import sha256_hex

    return (
        docs.select("doc_id", sha256_hex(F.col("text")).alias("text_sha"))
        .groupBy("text_sha")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def normalized_duplicates(docs: DataFrame) -> DataFrame:
    """Bag-of-words dedup: same token multiset regardless of order."""
    bag = F.md5(F.array_join(F.array_sort(_tokens(F.col("text"))), " "))
    return (
        docs.select("doc_id", bag.alias("bag_md5"))
        .groupBy("bag_md5")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def token_jaccard_pairs(docs: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Near-dup pairs by token-set Jaccard, blocked on lang.

    The correctness baseline: deterministic, oracle-expressible. The
    lang block bounds the self-join; the distinct-token projection
    happens before the join so each side shuffles once.
    """
    sets = docs.select("doc_id", "lang", _token_set(F.col("text")).alias("toks"))
    a = sets.alias("a")
    b = sets.alias("b")
    jac = F.size(F.array_intersect("a.toks", "b.toks")) / F.size(
        F.array_union("a.toks", "b.toks")
    )
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


BUCKET_CAP = 128


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Scale-path near-dup: shingle -> minhash -> band -> bucket-join.

    Never compares two documents unless they collide in a band, so cost
    is O(docs x bands + collisions), not O(docs^2). Two scale guards:

      * buckets larger than BUCKET_CAP are dropped before the
        self-join (a degenerate key would otherwise go quadratic);
      * similarity is verified from the minhash *signatures*
        (agreement / NUM_HASHES is an unbiased Jaccard estimate) —
        only 2 x NUM_HASHES longs ride the shuffle per candidate row,
        not the full shingle sets.

    Exact-Jaccard verification stays available via token_jaccard_pairs
    (the oracle-checked baseline)."""
    sh = docs.select("doc_id", word_shingles(F.col("text")).alias("sh")).where(
        F.size("sh") > 0
    )

    def hash_j(j: int):
        # single-arg lambda: with two args F.transform passes the array
        # index as the second parameter, silently breaking the seed
        return lambda s: F.xxhash64(s, F.lit(j))

    sig = sh.select(
        "doc_id",
        F.array(
            *[F.array_min(F.transform("sh", hash_j(j))) for j in range(NUM_HASHES)]
        ).alias("sig"),
    )
    rows = NUM_HASHES // BANDS
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)]).alias("key"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.key")
    sizes = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    capped = banded.join(
        sizes.where(F.col("n") <= BUCKET_CAP).select("band", "key"), ["band", "key"]
    )
    a = capped.alias("a")
    b = capped.alias("b")
    agree = F.size(
        F.filter(
            F.zip_with("a.sig", "b.sig", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(agree / F.lit(float(NUM_HASHES)), 4).alias("jaccard"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """64-bit simhash: per-token xxhash64, bit-majority vote.

    Vote per bit = sum over tokens of (+1 if bit set else -1); bit in
    fingerprint iff vote > 0. Expressed with explode-free higher-order
    functions: aggregate over the token array keeps everything row-local.
    """
    toks = F.array_distinct(_tokens(F.col("text")))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # shift amounts must be Python ints (shiftright takes no Column),
    # so the 64 bit positions are unrolled at plan-build time
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for i in range(64)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    fp = F.aggregate(
        F.array(
            *[
                F.when(votes[i] > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                    F.lit(0).cast("long")
                )
                for i in range(64)
            ]
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return docs.select("doc_id", fp.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by simhash banding (4 x 16-bit blocks: any
    pair within Hamming distance 3 shares at least one block — the
    pigeonhole blocking of Manku et al., WWW'07), verified by exact
    popcount of the XOR."""
    fps = simhash_fingerprints(docs)
    banded = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
    )
