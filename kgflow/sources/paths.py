"""Path-fallback scan (S3 in SURVEY §2.1) and catalog DDL (S11).

The reference probes a list of candidate locations and reads the first
one that exists (its notebooks hard-code primary/fallback DBFS paths);
`read_first_existing` is that behavior as a reusable helper over the
Hadoop FS API — existence checks are metadata calls, so nothing is
scanned until the chosen path is read.

`register_tables` covers the reference's catalog-facing DDL
(CREATE TABLE ... USING parquet LOCATION / DROP TABLE / SHOW-able via
spark.catalog): the sandbox has no Hive metastore, so registrations
live in the session's in-memory catalog, but the DDL strings are
exactly what a metastore-backed deployment runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """Metadata-only existence probe via the Hadoop FS API (works for
    local, HDFS, and object-store URIs alike)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def read_first_existing(
    spark: SparkSession, paths: list[str], fmt: str = "parquet"
) -> DataFrame:
    """Read the first candidate path that exists (S3 path-fallback
    scan). Raises FileNotFoundError listing every probed candidate if
    none exists — the reference's silent empty-frame fallback hides
    misconfigured inputs."""
    for p in paths:
        if path_exists(spark, p):
            return spark.read.format(fmt).load(p)
    raise FileNotFoundError(f"none of the candidate paths exist: {paths}")


def _quote_ident(name: str) -> str:
    """Backtick-quote a SQL identifier (backticks inside doubled), so an
    arbitrary prefix/table name can't break out of the DDL string."""
    return "`" + name.replace("`", "``") + "`"


def _quote_path(path: str) -> str:
    """Single-quote a LOCATION path with embedded quotes escaped —
    a path containing ' must not terminate the literal (injection
    surface for the catalog helper otherwise)."""
    return "'" + path.replace("\\", "\\\\").replace("'", "\\'") + "'"


def register_tables(spark: SparkSession, sf_dir: str, prefix: str = "kg") -> list[str]:
    """CREATE TABLE <prefix>_<name> USING parquet LOCATION ... for every
    driver test table (S11 catalog DDL); returns the created names.
    Idempotent: CREATE TABLE IF NOT EXISTS. Identifiers are
    backtick-quoted and the location path quote-escaped, so unusual
    prefixes or paths fail cleanly instead of producing mangled DDL."""
    from kgflow.analytics.tables import TABLES

    names = []
    for t in TABLES:
        name = f"{prefix}_{t}"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {_quote_ident(name)} USING parquet "
            f"LOCATION {_quote_path(f'{sf_dir}/{t}.parquet')}"
        )
        names.append(name)
    return names


def drop_tables(spark: SparkSession, names: list[str]) -> None:
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {_quote_ident(name)}")
