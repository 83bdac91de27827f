"""Reusable column/DataFrame function library: text analysis, deduplication,
similarity search, multimodal plumbing (SURVEY.md §2.14, beyond-reference
operators for large-scale training-data pipelines)."""
