"""Structured-Streaming operators beyond the CDC tail: event-time windowed
aggregation with watermarked late-data handling, custom stateful
sessionization via applyInPandasWithState, stream-stream interval joins,
and watermarked stream deduplication."""

from migration_pair_spark.streaming.joins import dedup_stream, streaming_range_join
from migration_pair_spark.streaming.stateful import sessionize_stream
from migration_pair_spark.streaming.windowed import (
    streaming_tumbling_counts,
    tumbling_counts,
)

__all__ = [
    "tumbling_counts",
    "streaming_tumbling_counts",
    "sessionize_stream",
    "streaming_range_join",
    "dedup_stream",
]
