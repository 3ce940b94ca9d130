"""Schema-declared CSV ingestion — the reference's production source
path (S1/S2 in SURVEY §2.1).

Re-implements the YAML-name -> Spark-type mapper of
databricks/notebooks/csv-ingestion.py:95-113 (same names, same
fallback-to-string semantics, same all-nullable policy, DecimalType(18,2)
for "decimal") and the header+schema scan of csv-ingestion.py:154-159.
Schema inference (S2, ecommerce-etl-pipeline.py:55-58) is supported but
discouraged — explicit schemas are the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# name -> type, mirroring csv-ingestion.py:97-106
_TYPE_MAP: dict[str, T.DataType] = {
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "string": T.StringType(),
    "decimal": T.DecimalType(18, 2),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "boolean": T.BooleanType(),
}


def spark_schema_from_spec(columns: list[dict]) -> T.StructType:
    """[{name, type}] -> StructType. Unknown type names fall back to
    string (csv-ingestion.py:110); every field is nullable
    (csv-ingestion.py:111)."""
    fields = [
        T.StructField(c["name"], _TYPE_MAP.get(c.get("type", "string"), T.StringType()), True)
        for c in columns
    ]
    return T.StructType(fields)


def read_csv(
    spark: SparkSession,
    path: str,
    columns: list[dict] | None = None,
    infer: bool = False,
    add_ingest_metadata: bool = True,
) -> DataFrame:
    """Header CSV scan with declared schema (csv-ingestion.py:154-159) or
    inference (ecommerce-etl-pipeline.py:55-58).

    Ingest metadata follows the reference's intent (csv-ingestion.py:175-178)
    but deterministically: source file + partition id, no wall-clock columns.
    """
    reader = spark.read.format("csv").option("header", "true")
    if columns is not None:
        reader = reader.schema(spark_schema_from_spec(columns))
    elif infer:
        reader = reader.option("inferSchema", "true")
    df = reader.load(path)
    if add_ingest_metadata:
        df = df.withColumn("_source_file", F.input_file_name()).withColumn(
            "_ingest_partition", F.spark_partition_id()
        )
    return df


def required_null_counts(df: DataFrame, required: list[str]) -> dict[str, int]:
    """The ingestion null-check loop (csv-ingestion.py:263-288) as ONE
    aggregate job instead of one job per column."""
    present = [c for c in required if c in df.columns]
    if not present:
        return {}
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in present]
    ).collect()[0]
    return {c: int(row[c] or 0) for c in present}
