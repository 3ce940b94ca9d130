"""Generic row->graph transform: reference semantics (JSON property
bags, MERGE-idempotent dedup, dynamic column probing) + silver-cleaning
rules on planted bad rows."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kgflow.analytics.graph_transform import struct_if_exists, to_edges, to_nodes


def test_to_nodes_shape_and_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a", 9.5), (1, "a", 9.5), (2, "b", 3.0)], "id int, name string, score double"
    )
    nodes = to_nodes(df, "id", "Thing", ["name", "score"]).collect()
    assert len(nodes) == 2  # MERGE idempotence: duplicate id collapsed
    row = {r[":ID"]: r for r in nodes}["Thing:1"]
    assert row[":LABEL"] == "Thing"
    assert json.loads(row["properties"]) == {"name": "a", "score": 9.5}


def test_struct_if_exists_skips_missing_columns(spark):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    out = df.select(F.to_json(struct_if_exists(df, ["name", "missing_col"])).alias("p"))
    assert json.loads(out.collect()[0].p) == {"name": "x"}


def test_to_edges_dedup_and_shape(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20)], "c int, o int"
    )
    edges = to_edges(df, "c", "Customer", "o", "Order", "PLACED").collect()
    assert len(edges) == 2
    e = edges[0]
    assert e[":TYPE"] == "PLACED"
    assert e[":START_ID"].startswith("Customer:")
    assert e[":END_ID"].startswith("Order:")


def test_rerun_is_idempotent(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    once = sorted(map(tuple, to_nodes(df, "id", "T", ["name"]).collect()))
    twice = sorted(map(tuple, to_nodes(df, "id", "T", ["name"]).collect()))
    assert once == twice


def test_silver_cleaning_rules_on_planted_bad_rows(spark):
    """The reference's Silver cleaning semantics
    (ecommerce-etl-pipeline.py:151-228): dedup by id, drop null
    required fields, email regex, price > 0, status whitelist,
    rating between 1 and 5 — planted violations must be the ONLY rows
    removed."""
    customers = spark.createDataFrame(
        [
            (1, "ann", "ann@x.com"),
            (1, "ann", "ann@x.com"),      # dup id
            (2, None, "bob@x.com"),       # null name
            (3, "cat", "not-an-email"),   # bad email
            (4, "dan", "dan@y.org"),
        ],
        "id int, name string, email string",
    )
    clean = (
        customers.dropDuplicates(["id"])
        .where(F.col("name").isNotNull())
        .where(F.col("email").rlike(r"^[\w.+-]+@[\w-]+\.[\w.]+$"))
    )
    assert {r.id for r in clean.collect()} == {1, 4}

    orders = spark.createDataFrame(
        [
            (1, 10.0, "completed"),
            (2, -5.0, "completed"),   # bad amount
            (3, 10.0, "teleported"),  # bad status
            (4, 10.0, "shipped"),
        ],
        "id int, total double, status string",
    )
    clean_o = orders.where(
        (F.col("total") > 0)
        & F.col("status").isin("completed", "shipped", "processing", "cancelled")
    )
    assert {r.id for r in clean_o.collect()} == {1, 4}

    reviews = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 6), (4, 1)], "id int, rating int"
    )
    assert {r.id for r in reviews.where(F.col("rating").between(1, 5)).collect()} == {1, 4}


def test_merge_props_json_semantics(spark):
    """Key precedence + null-delete + sorted-key determinism of the
    property-bag merge (reference graph_ready_enhancements.py:54-64)."""
    from pyspark.sql import functions as F

    from kgflow.analytics.graph_enrich import merge_props_json

    df = spark.createDataFrame(
        [
            ('{"a":"1","b":"2"}', '{"b":"9","c":"3"}'),   # overlay + add
            ('{"a":"1","b":"2"}', '{"a":null}'),           # null-delete
            ('{"z":"1","a":"2"}', "{}"),                   # no-op, key sort
            (None, '{"k":"v"}'),                           # null existing bag
        ],
        "old string, new string",
    )
    got = [
        r.merged
        for r in df.select(
            merge_props_json(F.col("old"), F.col("new")).alias("merged")
        ).collect()
    ]
    assert got[0] == '{"a":"1","b":"9","c":"3"}'
    assert got[1] == '{"b":"2"}'
    assert got[2] == '{"a":"2","z":"1"}'
    assert got[3] == '{"k":"v"}'


def test_pick_column_ci(spark):
    from kgflow.analytics.graph_enrich import pick_column_ci

    df = spark.createDataFrame([(1, "x")], "id int, Market_Segment string")
    assert pick_column_ci(df, ["segment", "market_segment"]) == "Market_Segment"
    assert pick_column_ci(df, ["nope"]) is None


def test_enrich_fallback_segment_column_overlays_canonical_key(spark, tmp_path):
    """When the customer table names its segment column 'segment' (or
    any candidate), the existing bag must key it as the CANONICAL
    'c_mktsegment' so the lower-case override lands on the same key —
    a bag with both 'segment' and 'c_mktsegment' would silently diverge
    from the oracle (round-2 advice)."""
    from kgflow.analytics.graph_enrich import enrich_customer_props

    spark.createDataFrame(
        [(1, "Alice", 8000.0, "BUILDING")],
        "c_custkey long, c_name string, c_acctbal double, segment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    rows = {
        (r.prop_key, r.prop_value)
        for r in enrich_customer_props(spark, str(tmp_path)).collect()
    }
    assert rows == {("c_mktsegment", "building"), ("value_tier", "platinum")}


def test_enrich_missing_segment_column_raises_clearly(spark, tmp_path):
    import pytest

    from kgflow.analytics.graph_enrich import enrich_customer_props

    spark.createDataFrame(
        [(1, "Alice", 8000.0)],
        "c_custkey long, c_name string, c_acctbal double",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    with pytest.raises(ValueError, match="segment column"):
        enrich_customer_props(spark, str(tmp_path))
