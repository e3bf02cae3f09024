"""Dataflow operators: blocking, matching, clustering, resolution, metrics,
dedup, similarity search, multimodal plumbing."""
