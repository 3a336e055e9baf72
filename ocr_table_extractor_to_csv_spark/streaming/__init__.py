"""Structured Streaming wiring for incremental ingest."""
