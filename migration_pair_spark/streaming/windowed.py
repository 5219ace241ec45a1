"""Event-time tumbling-window aggregation — batch form and the watermarked
Structured-Streaming form.

The reference is a pure batch copier (no windows, no watermarks — SURVEY.md
§2.2 'Streaming-only: none'), but the north rule's engine tails a live
change stream, and any production stream consumer needs windowed rollups
with late-data semantics. Spark expresses both forms with the SAME
``F.window`` aggregation:

- **Batch twin** (:func:`tumbling_counts`): exact, used by the catalog query
  ``tumbling_event_counts`` and value-checked against DuckDB's
  ``time_bucket`` (epoch-aligned tumbling windows agree across engines under
  the session's pinned UTC timezone).
- **Streaming form** (:func:`streaming_tumbling_counts`): adds
  ``withWatermark`` so state for closed windows is evicted — without it,
  window state grows forever on an unbounded stream. Semantics under
  append output mode (tested in tests/test_streaming_windowed.py):
  a window is emitted once the watermark passes its end; events later than
  the watermark are DROPPED (the documented, deterministic late-data
  contract), while late events within the delay still land in their window.

Scale shape: tumbling-window groupBy is a single hash shuffle on
(window, key); state per key x open-window only (watermark bounds the open
set). No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(df: DataFrame, window: str, ts_col: str, key_col: str) -> DataFrame:
    # integer-cent measure (like operators/timeseries.hierarchical_rollup,
    # and for the same reason): rounding each value BEFORE the sum keeps the
    # aggregate an exact BIGINT, order-independent across engines — a float
    # sum rounded after the fact can differ in the last ulp with partition
    # order and flip a 2-decimal rounding at a half-cent boundary
    # (advisor-caught latent oracle flake).
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("_w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            key_col,
            "n",
            "sum_cents",
        )
    )


def tumbling_counts(
    events: DataFrame,
    window: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Batch tumbling-window rollup: (window_start, key, n, sum_cents)."""
    return _agg(events, window, ts_col, key_col)


def streaming_tumbling_counts(
    stream: DataFrame,
    window: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """The same rollup over an unbounded stream, with bounded state: windows
    older than (max event time - ``watermark``) are finalized, emitted (in
    append mode) and their state dropped; events arriving later than that
    are discarded."""
    return _agg(stream.withWatermark(ts_col, watermark), window, ts_col, key_col)
