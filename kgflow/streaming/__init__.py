"""Structured Streaming surface: incremental corpus ingestion.

The reference is batch-only (`processing.enable_streaming: false`,
configs/data-sources.yml:119; SURVEY §2.9) — but its roadmap lists
real-time ingestion as enhancement #1 (docs/ARCHITECTURE.md:433). This
package provides that enhancement the Spark-native way: a file-source
stream over the source-code table feeding the same extraction logic,
with exactly-once progress tracked by Structured Streaming checkpoints.
"""
