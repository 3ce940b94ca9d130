"""Analytics parity layer: the reference's relational/graph query semantics
re-expressed over the driver's TPC-H-ish test tables, each paired with an
ANSI-SQL oracle for the DuckDB correctness gate."""
