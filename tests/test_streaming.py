"""Incremental (Structured Streaming) extraction: exactly-once over
appended corpus batches, output identical to batch extraction."""

from __future__ import annotations

import os

from kgflow import fixtures
from kgflow.stages.extract import extract
from kgflow.stages.ingest import ingest
from kgflow.streaming.incremental import incremental_extract


def _write_batch(spark, n0, n1, n_total, path):
    """Corpus slice [n0, n1) as one appended file batch."""
    import pandas as pd

    rows = [fixtures._file_record(i, n_total) for i in range(n0, n1)]
    pdf = pd.DataFrame(
        [{k: r[k] for k in ("repo", "path", "commit", "lang", "content")} for r in rows]
    )
    spark.createDataFrame(pdf, schema="repo string, path string, commit string, lang string, content string").coalesce(1).write.mode("append").parquet(path)


def test_incremental_equals_batch_and_is_exactly_once(spark, tmp_path):
    n_total = 60
    inp = str(tmp_path / "corpus")
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    # batch 1
    _write_batch(spark, 0, 40, n_total, inp)
    q = incremental_extract(spark, inp, out, ckpt)
    q.awaitTermination(120)
    n_after_first = spark.read.parquet(out).count()
    assert n_after_first > 0

    # re-run with no new data: checkpoint must prevent reprocessing
    q = incremental_extract(spark, inp, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_after_first

    # batch 2 appended: only the delta is processed
    _write_batch(spark, 40, 60, n_total, inp)
    q = incremental_extract(spark, inp, out, ckpt)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out)
    batch = extract(ingest(spark.read.parquet(inp)), engine="native")
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()
