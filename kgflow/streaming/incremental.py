"""Incremental triple extraction over an append-only corpus directory.

New parquet files dropped into the input directory are picked up by a
file-source stream, run through the SAME ingest+extract expressions as
the batch pipeline (they are pure per-row transforms, so batch and
stream share code verbatim), and appended to the triples sink.
Structured Streaming's checkpoint guarantees each input file is
processed exactly once across restarts — the streaming complement to
the batch pipeline's per-stage manifests.

Run with trigger=availableNow for catch-up-then-stop semantics (the
deterministic mode used in tests and cron-style incremental loads), or
continuous micro-batches in a long-lived job.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from kgflow.schemas import SOURCE_FILES
from kgflow.stages.extract import extract
from kgflow.stages.ingest import ingest


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    engine: str = "native",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the incremental extraction stream; returns the query.

    Callers decide whether to awaitTermination (availableNow) or keep
    it running. Output is append-only parquet in the batch triple
    schema, so batch analytics read it unchanged.
    """
    stream = (
        spark.readStream.schema(SOURCE_FILES)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    triples = extract(ingest(stream), engine=engine)
    return (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )
