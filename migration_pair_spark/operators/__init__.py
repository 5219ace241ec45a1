"""Training-data-pipeline operators: deduplication family, similarity
search, and multimodal plumbing. All built from DataFrame ops (shuffle-aware
compositions), with pandas-UDF fallbacks only where Catalyst genuinely
cannot express the semantics."""
