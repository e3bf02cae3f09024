"""Structured Streaming operators (streaming twins of the batch plans)."""
