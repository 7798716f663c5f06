"""Structured Streaming ingest (the PQM buffer analog)."""
