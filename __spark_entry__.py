"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check on sf0.001.
queries()    — one entry per implemented operator (SURVEY.md §2 +
               training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql() — DuckDB-runnable ANSI SQL twins for the hash-compare gate
               (omitted for Spark-hash-based ops, which get rows-only
               checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: co-purchase collaborative-filtering recommendations
    (the reference's Q1 Cypher write-back re-expressed as DataFrame
    ops) on sf0.001."""
    from kgflow.analytics.registry import QUERIES

    return QUERIES["copurchase_recommendations"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgflow.analytics.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgflow.analytics.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
