"""Stage 1 — ingest: lineage columns over the raw source table.

Mirrors the reference's ingest-metadata step
(databricks/notebooks/csv-ingestion.py:175-178: current_timestamp,
current_date, input_file_name) but deterministic: no wall-clock columns
on the datapath (run_ts is an explicit parameter recorded in lineage,
never in data), and the metadata we add is what the north_rule's
invariants need — sha2(content,256) for the per-row content invariant
and spark_partition_id for per-partition lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest(source: DataFrame) -> DataFrame:
    """source_files -> ingested (adds content_sha, file_id, ingest_partition).

    Pure narrow transformation — no shuffle: every added column is a
    row-local expression, so this fuses into the downstream stage's scan
    under whole-stage codegen.
    """
    return source.select(
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha"),
        F.sha2(F.concat_ws("|", "repo", "path", "commit"), 256).alias("file_id"),
        F.spark_partition_id().alias("ingest_partition"),
    )
