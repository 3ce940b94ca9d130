"""Tracked DataFrame persists, shared by the relational queries and the
training-data ops.

Several queries persist() a multi-referenced CTE (the CF purchase
table, the minhash signature table) because Spark re-executes a
DataFrame subtree once per reference in the final plan. A long-lived
session running many such queries (bench.py, the driver gate, a
notebook) must be able to return storage memory to flat between
queries — spark.catalog.clearCache() alone leaves the entries
registered in the CacheManager — so every persist routes through this
registry and release_caches() drops them blocking-ly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() (MEMORY_AND_DISK) + register for release_caches()."""
    df = df.persist()
    _TRACKED_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache (call after the terminal action on
    a query that persists).  Returns the number released."""
    n = len(_TRACKED_CACHES)
    for df in _TRACKED_CACHES:
        try:
            # blocking: storage info must reflect the release immediately —
            # async unpersist leaves getRDDStorageInfo() stale under load.
            df.unpersist(blocking=True)
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED_CACHES.clear()
    return n
