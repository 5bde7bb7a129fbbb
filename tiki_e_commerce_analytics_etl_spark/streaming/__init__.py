"""Structured Streaming wrappers (incremental / late-data semantics)."""
