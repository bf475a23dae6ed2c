"""Structured Streaming surface (incremental quality filtering)."""
