"""Structured Streaming surface (continuous ingestion of page snapshots)."""
