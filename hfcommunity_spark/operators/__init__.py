"""Operator library: relational inventory, upsert/merge semantics,
dedup, similarity search, text analysis, multimodal plumbing."""
