"""Connected-components property tests on known graphs (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from kgflow.stages.canonicalize import canonical_map, connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src string, dst string")
    return {
        (r.member, r.canonical) for r in connected_components(edges).collect()
    }


def test_chain_collapses_to_min(spark):
    got = _cc(spark, [("b", "c"), ("c", "d"), ("a", "b")])
    assert got == {("b", "a"), ("c", "a"), ("d", "a")}


def test_star_already_canonical(spark):
    got = _cc(spark, [("a", "b"), ("a", "c"), ("a", "d")])
    assert got == {("b", "a"), ("c", "a"), ("d", "a")}


def test_two_disjoint_components_stay_apart(spark):
    got = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    assert got == {("b", "a"), ("y", "x"), ("z", "x")}


def test_cycle(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {("b", "a"), ("c", "a")}


def test_canonical_map_includes_centers(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    got = {(r.member, r.canonical) for r in canonical_map(edges).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a")}


@pytest.mark.parametrize("n", [2, 9])
def test_long_chain_converges(spark, n):
    pairs = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n)]
    got = _cc(spark, pairs)
    assert got == {(f"n{i:02d}", "n00") for i in range(1, n + 1)}
