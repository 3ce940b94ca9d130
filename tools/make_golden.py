#!/usr/bin/env python
"""Regenerate tests/data/kg_golden_500.parquet — the frozen golden
(subj, pred, obj) set for the deterministic 500-file synthetic corpus.

The file backs the hash-checked driver oracles `kg_extract_triples`
and `kg_canonical_map` (kgflow/analytics/registry.py). It only needs
regenerating if the fixture generator or the extraction rule set
changes; the content is a pure function of kgflow/fixtures.py.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 500
OUT = os.path.join(REPO, "tests", "data", f"kg_golden_{N_FILES}.parquet")


def main() -> int:
    from kgflow import fixtures

    rows = set()
    for i in range(N_FILES):
        rows.update(tuple(t) for t in fixtures._file_record(i, N_FILES)["golden"])
    df = pd.DataFrame(sorted(rows), columns=["subj", "pred", "obj"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), OUT)
    print(f"{len(df)} golden triples -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
