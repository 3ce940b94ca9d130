"""Source connectors: schema-declared CSV (the reference's ingestion
path), managed-table scans, and temp-view registration."""
