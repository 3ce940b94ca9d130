"""Driver-gate contract for the query registry.

The driver's correctness snapshot (CORRECTNESS_r{N}.json) holds at most
50 entries, taken in registry order — round 4 proved empirically that a
51st registration silently evicts the LAST entry: adding `ann_ivf_topk`
dropped `graph_enrich_customer_props` from the gate in the same round
its implementation changed (VERDICT.md round 4, "What's wrong" #1).

These tests pin the cap so registry growth fails loudly HERE instead of
silently un-gating a query. To add a query once the registry is full,
consolidate two existing ones first (round 5 folded
`distinct_segments` + `collect_set_priorities` into
`distinct_segment_priorities` for exactly this reason).
"""

from __future__ import annotations

import os
import sys

DRIVER_GATE_CAP = 50

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_registry_fits_driver_gate_cap():
    from kgflow.analytics.registry import QUERIES

    assert len(QUERIES) <= DRIVER_GATE_CAP, (
        f"registry has {len(QUERIES)} queries but the driver gate checks at "
        f"most {DRIVER_GATE_CAP} (in registration order) — the overflow would "
        "be SILENTLY unverified. Consolidate queries before adding new ones."
    )


def test_every_registered_query_is_gated():
    """Every query has an oracle row, or is an explicitly documented
    rows-only Spark-hash op (the xxhash64 scale paths, whose md5 twins
    ARE value-checked and whose agreement is pinned by
    tests/test_properties.py twin gates)."""
    from kgflow.analytics.registry import ORACLE_SQL, QUERIES

    rows_only_by_design = {"dedup_minhash_lsh", "dedup_simhash"}
    assert set(ORACLE_SQL) <= set(QUERIES)
    assert set(QUERIES) - set(ORACLE_SQL) == rows_only_by_design


def test_round4_evicted_query_is_back_under_the_gate():
    from kgflow.analytics.registry import ORACLE_SQL, QUERIES

    assert "graph_enrich_customer_props" in QUERIES
    assert "graph_enrich_customer_props" in ORACLE_SQL


def test_entry_contract_mirrors_registry():
    import __spark_entry__ as entry
    from kgflow.analytics.registry import ORACLE_SQL, QUERIES

    assert list(entry.queries()) == list(QUERIES)
    assert entry.oracle_sql() == ORACLE_SQL
