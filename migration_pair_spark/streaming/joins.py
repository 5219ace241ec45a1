"""Stream-stream interval join and watermarked stream deduplication.

Two more streaming-only operators the CDC engine's consumers need:

- :func:`streaming_range_join` is the unbounded twin of
  ``operators/timeseries.range_join`` (same [t-window, t) semantics, same
  epoch-millis integer arithmetic). Spark's stream-stream join buffers both
  sides in the state store; the watermark plus the explicit time-bound
  condition let it EVICT buffered rows once no future match is possible —
  without the bound, both sides accumulate forever. State is O(events
  inside the watermark horizon), not O(stream).
- :func:`dedup_stream` drops redundant deliveries of the same event id with
  ``dropDuplicatesWithinWatermark`` — at-least-once transports (Kafka
  redelivery, file-source replays) become exactly-once-per-id downstream
  while keeping state bounded: an id's fingerprint is evicted once the
  watermark passes its event time + delay. (The CDC apply path does NOT
  rely on this — its idempotence comes from the applied-LSN-interval gate
  in cdc/apply.py, which survives restarts; this operator is for consumers
  that need dedup WITHOUT a table to gate against.)

Both are pure DataFrame declarations usable under batch or streaming
execution; the streaming semantics are pinned in tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MS_30_MIN = 30 * 60 * 1000


def streaming_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window_ms: int = MS_30_MIN,
    watermark: str = "30 minutes",
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` and right strictly before
    left within ``window_ms`` — over two unbounded streams.

    The join condition is expressed on the TIMESTAMP columns (not derived
    millis) so Spark's streaming planner recognizes the time bound and can
    compute the state-eviction predicate from the watermarks."""
    l = left.withWatermark(ts, watermark).select(
        F.col(key),
        F.col("event_id").alias("l_event_id"),
        F.col(ts).alias("l_ts"),
    )
    r = right.withWatermark(ts, watermark).select(
        F.col(key).alias("_rkey"),
        F.col("event_id").alias("r_event_id"),
        F.col(ts).alias("r_ts"),
    )
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (F.col("r_ts") < F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {window_ms} MILLISECONDS"))
    )
    return l.join(r, cond).select(key, "l_event_id", "l_ts", "r_event_id", "r_ts")


def dedup_stream(
    stream: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-per-id view of an at-least-once stream: keeps the FIRST
    delivery of each id, drops redeliveries arriving within the watermark
    delay. State per id is evicted after the delay (bounded state store)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
