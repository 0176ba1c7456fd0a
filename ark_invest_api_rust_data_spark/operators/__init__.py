"""Composed operators Spark lacks as builtins: as-of join, normalizer,
incremental merge, dedup family, similarity search, text analysis,
multimodal plumbing."""
