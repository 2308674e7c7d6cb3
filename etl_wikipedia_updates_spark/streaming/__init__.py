"""Structured Streaming surface: ingest, retention, stateful dedup,
windowed aggregation, metrics (reference R1-R2, R10-R16, D1-D7)."""
