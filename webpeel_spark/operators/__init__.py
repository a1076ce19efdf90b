"""Spark operators: extraction stage, dedup family, similarity search,
text analysis, multimodal plumbing."""
