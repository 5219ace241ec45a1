"""CDC core: salted LWW dedup, the exactly-once MERGE apply loop, schema
evolution, and the batch/streaming runners (SURVEY.md §2.4, §7)."""
