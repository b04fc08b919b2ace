"""Structured Streaming ingest path (SURVEY §2.9: an extension — the
reference has no streams; its closest analogs are incremental upsert and
idempotent re-runs, which foreachBatch + the catalog reproduce)."""
