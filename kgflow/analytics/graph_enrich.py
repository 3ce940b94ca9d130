"""Property-bag enrichment: merge new properties into existing JSON
bags with new-value precedence and null-delete semantics.

Re-expresses the reference's graph-ready enhancement pass
(databricks/notebooks/graph_ready_enhancements.py:21,54,61-64,105-108,
149-151,235), which parses node/edge property JSON, overlays newly
computed attributes, and re-serializes. Spark-first form: the bags stay
columnar MapType the whole way —

    from_json(col, MapType)      parse both bags
    map_zip_with                 overlay, NEW value wins per key
    map_filter                   drop null-valued entries (deletes)
    map_from_arrays + array_sort re-serialize with sorted keys so the
                                 output JSON is byte-deterministic

plus the reference's case-insensitive candidate-column probe
(graph_ready_enhancements.py:24-34,44-48): pick the first column whose
lower-cased name matches a candidate list, at plan-build time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgflow.analytics.tables import load

MAP_SS = "map<string,string>"


def merge_props_maps(m_old, m_new) -> F.Column:
    """Merge two parsed property bags (map<string,string> columns).

    Semantics (RFC 7386-style, matching the reference's overlay):
      * key only in `m_old`                 -> kept
      * key in both                         -> `m_new` wins
      * key only in `m_new`, non-null value -> added
      * key in `m_new` with JSON null       -> DELETED from the result
    Keys are sorted in the output so equal bags serialize identically.

    Takes MAPS, not JSON strings: higher-order functions are evaluated
    interpreted (no whole-stage codegen), and an expression referenced
    inside a lambda is re-evaluated per element — passing pre-parsed
    map columns keeps the from_json cost to once per row instead of
    once per key per HOF (see merge_props_json for the string-typed
    wrapper)."""
    overlaid = F.map_zip_with(
        m_old,
        m_new,
        # new-value precedence INCLUDING explicit nulls: coalesce would
        # resurrect the old value on a null-delete, so probe key
        # membership instead
        lambda k, v1, v2: F.when(F.map_contains_key(m_new, k), v2).otherwise(v1),
    )
    cleaned = F.map_filter(overlaid, lambda k, v: v.isNotNull())
    keys = F.array_sort(F.map_keys(cleaned))
    vals = F.transform(keys, lambda k: F.element_at(cleaned, k))
    return F.map_from_arrays(keys, vals)


def merge_props_json(existing, new) -> F.Column:
    """Merge two JSON property bags (string columns) into one JSON bag.
    String-typed convenience wrapper over merge_props_maps — callers on
    a hot path should parse once into map columns in a prior projection
    and call merge_props_maps directly."""
    # a NULL (or unparseable) bag is an empty bag, not a poisoned merge
    m_old = F.coalesce(F.from_json(existing, MAP_SS), F.from_json(F.lit("{}"), MAP_SS))
    m_new = F.coalesce(F.from_json(new, MAP_SS), F.from_json(F.lit("{}"), MAP_SS))
    return F.to_json(merge_props_maps(m_old, m_new))


def pick_column_ci(df: DataFrame, candidates: list[str]) -> str | None:
    """Case-insensitive candidate-column lookup
    (graph_ready_enhancements.py:24-34): return the actual column name
    matching the first candidate present, probing lower-cased names.
    Plan-build-time reflection over df.columns — no runtime cost."""
    by_lower = {c.lower(): c for c in df.columns}
    for cand in candidates:
        hit = by_lower.get(cand.lower())
        if hit is not None:
            return hit
    return None


def enrich_customer_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich Customer node property bags after materialization:
    overlay a computed value_tier, override c_mktsegment with its
    normalized (lower-case) form, and null-delete c_name — then explode
    the merged bag to (node_id, prop_key, prop_value) rows so the
    result is engine-comparable."""
    c = load(spark, sf_dir, "customer")
    # candidate-column probe: the TPC-H-ish table uses c_mktsegment;
    # other sources may call it segment/market_segment
    seg_col = pick_column_ci(c, ["c_mktsegment", "segment", "market_segment"])
    if seg_col is None:
        raise ValueError(
            "customer table has no segment column; tried "
            "c_mktsegment/segment/market_segment (case-insensitive) among "
            f"{c.columns}"
        )

    tier = (
        F.when(F.col("c_acctbal") >= 7500, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2500, "silver")
        .otherwise("bronze")
    )
    # the existing bag is exactly what graph_transform.to_nodes
    # serializes for Customer nodes; both bags derive from the same
    # customer row, so build them in ONE projection — a node⋈enrichment
    # self-join here would shuffle the table twice for nothing (the
    # merge operator itself is row-local either way)
    # alias the probed column to the canonical key so the override below
    # (hard-coded 'c_mktsegment') lands on the SAME key regardless of
    # which candidate matched — otherwise both keys would survive the
    # merge and diverge from the oracle
    existing = F.to_json(
        F.struct(F.col("c_name"), F.col(seg_col).alias("c_mktsegment"))
    )
    new = F.to_json(
        F.struct(
            F.lit(None).cast("string").alias("c_name"),  # null-delete
            F.lower(F.col(seg_col)).alias("c_mktsegment"),  # override
            tier.alias("value_tier"),  # add
        ),
        {"ignoreNullFields": "false"},
    )
    # parse each JSON bag ONCE per row in its own projection, then merge
    # at the map level — HOFs are interpreted and re-evaluate lambda-
    # captured expressions per element, so feeding them raw from_json
    # expressions multiplied the parse cost by the key count
    parsed = (
        c.dropDuplicates(["c_custkey"])  # MERGE idempotence, as in to_nodes
        .select(
            F.concat(F.lit("Customer:"), F.col("c_custkey").cast("string")).alias(
                "node_id"
            ),
            F.coalesce(F.from_json(existing, MAP_SS), F.from_json(F.lit("{}"), MAP_SS)).alias("m_old"),
            F.coalesce(F.from_json(new, MAP_SS), F.from_json(F.lit("{}"), MAP_SS)).alias("m_new"),
        )
    )
    merged = parsed.select(
        "node_id", merge_props_maps(F.col("m_old"), F.col("m_new")).alias("bag")
    )
    return merged.select(
        "node_id", F.explode("bag").alias("prop_key", "prop_value")
    )


ENRICH_CUSTOMER_PROPS_SQL = """
SELECT 'Customer:' || c_custkey AS node_id, 'c_mktsegment' AS prop_key,
       lower(c_mktsegment) AS prop_value
FROM (SELECT DISTINCT ON (c_custkey) * FROM customer ORDER BY c_custkey)
UNION ALL
SELECT 'Customer:' || c_custkey, 'value_tier',
       CASE WHEN c_acctbal >= 7500 THEN 'platinum'
            WHEN c_acctbal >= 5000 THEN 'gold'
            WHEN c_acctbal >= 2500 THEN 'silver'
            ELSE 'bronze' END
FROM (SELECT DISTINCT ON (c_custkey) * FROM customer ORDER BY c_custkey)
"""
