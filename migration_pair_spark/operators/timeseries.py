"""Time-series operators the reference's domain implies but Spark lacks as
built-ins: interval range join and hypertable-style hierarchical rollup.

Reference tie-in: Mycenae's only time handling is timestamp<->epoch-millis
normalization (/root/reference/Tasks/Extraction.cs:67-68,
/root/reference/Converters/DynamicTypeConverter.cs:13); these operators keep
that exact epoch-millis arithmetic as the join/bucket currency so results
are engine-exact (integer math, no float time).

Scale notes (100 TB):

- ``range_join``: the naive formulation is an equi-join on the key plus a
  time inequality — Spark plans that as a BroadcastNestedLoop/cartesian per
  key group unless the equi-key is selective. The scale shape used here is
  **bucketized**: right rows land in one ``floor(ms / window)`` bucket; each
  left row probes exactly two buckets (its own and the previous), so the
  join is a pure hash equi-join on (key, bucket) with the exact range check
  as a residual filter. Shuffle volume is O(events), not O(pairs); a pair
  can only materialize in one bucket, so no distinct is needed.
- ``hierarchical_rollup``: the coarse granularity is folded FROM the fine
  one (daily = re-aggregation of hourly partials), the continuous-aggregate
  trick — the raw table is scanned ONCE however many granularities are
  emitted. Measures are integer cents (``round(value*100)`` as BIGINT), so
  re-aggregating partials is exact and order-independent — a float sum
  would drift between the direct and hierarchical forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MS_30_MIN = 30 * 60 * 1000


def _ms(col) -> F.Column:
    # events.ts is parquet TIMESTAMP_NTZ; session TZ is pinned UTC, so the
    # cast is a pure reinterpretation (same contract as queries.sessionize).
    return F.unix_millis(F.col(col).cast("timestamp"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window_ms: int = MS_30_MIN,
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` and right strictly before
    left within ``window_ms``: ``left_ms - window_ms <= right_ms < left_ms``.

    Output columns: key, left's columns prefixed ``l_``, right's prefixed
    ``r_`` (ids and ts only — project before calling for wider payloads).
    """
    l = left.select(
        F.col(key),
        F.col("event_id").alias("l_event_id"),
        F.col(ts).alias("l_ts"),
        _ms(ts).alias("_lms"),
    ).withColumn("_bucket", F.explode(F.array(
        F.floor(F.col("_lms") / window_ms),
        F.floor(F.col("_lms") / window_ms) - 1,
    )))
    r = right.select(
        F.col(key),
        F.col("event_id").alias("r_event_id"),
        F.col(ts).alias("r_ts"),
        _ms(ts).alias("_rms"),
    ).withColumn("_bucket", F.floor(F.col("_rms") / window_ms))
    return (
        l.join(r, [key, "_bucket"])
        .filter(
            (F.col("_rms") < F.col("_lms"))
            & (F.col("_rms") >= F.col("_lms") - window_ms)
        )
        .select(key, "l_event_id", "l_ts", "r_event_id", "r_ts")
    )


def hierarchical_rollup(
    events: DataFrame,
    ts: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value: str = "value",
) -> DataFrame:
    """Hypertable-style multi-granularity rollup: (granularity, bucket_start,
    *dims, n, sum_cents) for granularity in {hour, day}, the day rows folded
    from the hour partials (single scan of the raw table)."""
    cents = F.round(F.col(value) * 100, 0).cast("long")
    hourly = (
        events.groupBy(
            F.date_trunc("hour", F.col(ts).cast("timestamp")).alias("bucket_start"),
            *dims,
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("sum_cents"))
        # the hour partial feeds BOTH output grains; without this, each union
        # branch re-derives it from the raw table (two full scans). The
        # partial is tiny — O(hours x |dims|) — and localCheckpoint (eager)
        # materializes it ONCE; unlike .persist(), the blocks are reclaimed
        # by the context cleaner when the returned plan is GC'd, so repeated
        # calls don't accumulate pinned cache entries (review-caught, r2).
        .localCheckpoint()
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", "bucket_start").alias("bucket_start"), *dims
        )
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )
    tag = lambda df, g: df.select(  # noqa: E731
        F.lit(g).alias("granularity"), "bucket_start", *dims, "n", "sum_cents"
    )
    return tag(hourly, "hour").unionByName(tag(daily, "day"))
