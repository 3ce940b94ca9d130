"""Pipeline stages: ingest -> extract -> link -> canonicalize -> materialize."""
