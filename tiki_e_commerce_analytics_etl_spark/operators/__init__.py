"""Operator library: dedup, merge/upsert, reshape, quality, similarity,
text analysis, multimodal plumbing."""
