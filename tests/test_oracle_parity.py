"""Mirror of the driver's correctness gate: run each registered query
in Spark and its oracle SQL in DuckDB on the same parquet, compare
row multisets (columns sorted by name, cells normalized)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from kgflow.analytics.registry import ORACLE_SQL, QUERIES
from kgflow.analytics.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _norm_cell(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _spark_rows(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(
        tuple(_norm_cell(r[c]) for c in cols) for r in df.collect()
    ), cols


def _duck_rows(name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    res = con.execute(ORACLE_SQL[name])
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    ), sorted(cols)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, name):
    got, got_cols = _spark_rows(spark, name)
    want, want_cols = _duck_rows(name)
    assert got_cols == want_cols, f"{name}: column mismatch {got_cols} vs {want_cols}"
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    if got != want:
        diff_a = [r for r in got if r not in set(want)][:3]
        diff_b = [r for r in want if r not in set(got)][:3]
        raise AssertionError(f"{name}: value mismatch.\n spark-only={diff_a}\n duck-only={diff_b}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns
