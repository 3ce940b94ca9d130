"""CSV source (type mapper, schema-on-read) + validation checks."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from kgflow.sources.csv import read_csv, required_null_counts, spark_schema_from_spec
from kgflow.validation import (
    check_foreign_key,
    check_required,
    check_unique,
    quality_score,
    report,
)


def test_type_mapper_matches_reference_semantics():
    schema = spark_schema_from_spec(
        [
            {"name": "id", "type": "integer"},
            {"name": "amount", "type": "decimal"},
            {"name": "ts", "type": "timestamp"},
            {"name": "flag", "type": "boolean"},
            {"name": "weird", "type": "no_such_type"},  # fallback -> string
            {"name": "plain"},  # missing type -> string
        ]
    )
    assert schema["id"].dataType == T.IntegerType()
    assert schema["amount"].dataType == T.DecimalType(18, 2)
    assert schema["ts"].dataType == T.TimestampType()
    assert schema["flag"].dataType == T.BooleanType()
    assert schema["weird"].dataType == T.StringType()
    assert schema["plain"].dataType == T.StringType()
    assert all(f.nullable for f in schema.fields)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("id,name,amount\n1,ann,9.50\n2,,3.25\n2,bob,1.00\n")
    return str(p)


def test_read_csv_with_declared_schema(spark, csv_file):
    df = read_csv(
        spark,
        csv_file,
        columns=[
            {"name": "id", "type": "integer"},
            {"name": "name", "type": "string"},
            {"name": "amount", "type": "decimal"},
        ],
    )
    assert df.schema["id"].dataType == T.IntegerType()
    assert "_source_file" in df.columns and "_ingest_partition" in df.columns
    assert df.count() == 3
    assert required_null_counts(df, ["id", "name"]) == {"id": 0, "name": 1}


def test_validation_checks_and_score(spark, csv_file):
    df = read_csv(
        spark, csv_file,
        columns=[{"name": "id", "type": "integer"},
                 {"name": "name", "type": "string"},
                 {"name": "amount", "type": "double"}],
        add_ingest_metadata=False,
    )
    issues = check_required(df, ["id", "name", "ghost_col"])
    kinds = {(i.check, i.column) for i in issues}
    assert ("missing_column", "ghost_col") in kinds
    assert ("required_null", "name") in kinds

    issues += check_unique(df, ["id"])
    assert any(i.check == "duplicate_key" and i.column == "id" for i in issues)

    parent = spark.createDataFrame([(1,)], "id int")
    issues += check_foreign_key(df, "id", parent, "id")
    assert any(i.check == "dangling_fk" for i in issues)

    # 3 critical + 1 high -> 100 - 30 - 5 = 65, fails the >=90 gate
    score = quality_score(issues)
    assert score == 65
    rep = report(spark, "c.csv", issues)
    assert rep.where("passed").count() == 0
    assert rep.count() == len(issues)


def test_clean_table_passes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    issues = check_required(df, ["id", "name"]) + check_unique(df, ["id"])
    assert issues == []
    rep = report(spark, "clean", issues).collect()
    assert rep[0].passed and rep[0].quality_score == 100


def test_path_fallback_scan(spark, tmp_path):
    """S3: read the first existing candidate path; error (not an empty
    frame) when none exists."""
    import pytest as _pytest

    from kgflow.sources.paths import read_first_existing

    real = str(tmp_path / "real")
    spark.range(5).write.parquet(real)
    df = read_first_existing(
        spark, [str(tmp_path / "missing_a"), real, str(tmp_path / "missing_b")]
    )
    assert df.count() == 5
    with _pytest.raises(FileNotFoundError):
        read_first_existing(spark, [str(tmp_path / "nope")])


def test_catalog_ddl_register_query_drop(spark):
    """S11: CREATE TABLE USING parquet LOCATION / query via catalog
    name / DROP TABLE round-trip."""
    from kgflow.sources.paths import drop_tables, register_tables

    names = register_tables(spark, "/root/testdata/sf0.001", prefix="t_s11")
    try:
        assert "t_s11_customer" in names
        n = spark.sql("SELECT count(*) AS n FROM t_s11_customer").first().n
        assert n > 0
        cat = {t.name for t in spark.catalog.listTables()}
        assert "t_s11_customer" in cat
    finally:
        drop_tables(spark, names)
    assert "t_s11_customer" not in {t.name for t in spark.catalog.listTables()}
