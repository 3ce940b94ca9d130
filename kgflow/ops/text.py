"""Text analysis operators over the documents table: quality scoring,
token counting, fingerprinting, language ID. All pure Column
expressions (whole-stage codegen) — the hot path a 100 TB filter
pipeline runs on every document."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")


def _tokens(col) -> F.Column:
    return F.split(col, " ")


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality features: length, token count, mean token
    length, stopword ratio, uppercase ratio. The
    severity-weighted-score idea of the reference's validation
    (data-validation.py:299-303) generalized to per-row features."""
    toks = _tokens(F.col("text"))
    n_toks = F.size(toks)
    stop_n = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    upper_n = F.length(F.regexp_replace(F.col("text"), r"[^A-Z]", ""))
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_actual"),
        n_toks.alias("n_tokens"),
        F.round(
            F.when(n_toks > 0, F.length("text") / n_toks).otherwise(F.lit(0.0)), 4
        ).alias("chars_per_token"),
        F.round(
            F.when(n_toks > 0, stop_n / n_toks).otherwise(F.lit(0.0)), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(
                F.length("text") > 0, upper_n / F.length("text")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("upper_ratio"),
    )


def token_stats_by_lang(docs: DataFrame) -> DataFrame:
    """Corpus-level token accounting per language — the first number any
    training-data pipeline reports."""
    n_toks = F.size(_tokens(F.col("text")))
    # max/sum cast to long so the physical schema matches the DuckDB
    # oracle's BIGINT bit-for-bit (driver hash is dtype-sensitive)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_toks).alias("total_tokens"),
        F.round(F.avg(n_toks), 4).alias("avg_tokens"),
        F.max(n_toks).cast("long").alias("max_tokens"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprints: md5 of the raw text and of
    the order-insensitive token bag (the normalized-dup key)."""
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.md5(F.array_join(F.array_sort(toks), " ")).alias("bag_md5"),
    )


def bpe_ish_token_count(docs: DataFrame) -> DataFrame:
    """Token counting with a BPE-ish regex (word pieces + digits +
    punctuation runs) alongside whitespace tokens — the cheap proxy for
    tokenizer budgeting."""
    pieces = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    ws = F.size(_tokens(F.col("text")))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        pieces.alias("bpe_ish_tokens"),
    )


def language_profiles(docs: DataFrame, top_n: int = 20) -> DataFrame:
    """Learn per-language token profiles from labeled data: the top-N
    most frequent tokens per lang (the n-gram-profile method of
    Cavnar & Trenkle, 1994, at word granularity)."""
    from pyspark.sql import Window as W

    tok = docs.select("lang", F.explode(_tokens(F.col("text"))).alias("tok"))
    freq = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tok"))
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("lang", "tok", "rank")
    )


def classify_language(docs: DataFrame, profiles: DataFrame) -> DataFrame:
    """Score each document against each language profile (sum of
    inverse-rank weights of profile tokens present) and pick the
    argmax. Profiles are dimension-sized -> broadcast."""
    from pyspark.sql import Window as W

    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("tok")
    )
    # score rounded BEFORE the argmax: double summation order differs
    # across engines/partitionings, and the rank tie-break must see the
    # same value on both sides of the oracle comparison
    scored = (
        tok.join(F.broadcast(profiles), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("rank")), 4).alias("score"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted_lang"), "score")
    )
