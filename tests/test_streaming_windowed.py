"""Watermarked streaming windowed aggregation: the late-data contract.

Mtime-ordered files, maxFilesPerTrigger=1 -> one micro-batch per file:

  f0: in-order events in windows W0/W1
  f1: an event far ahead -> watermark advances past W0/W1's end
  f2: a late-but-WITHIN-delay event (lands in its window)
  f3: a too-late event (window already behind the watermark) -> DROPPED
  f4: a far-future sentinel that pushes the final watermark past every real
      window's end, so append mode emits them all (via the final no-data
      micro-batch). The sentinel must FLOW THROUGH the plan — a
      pre-aggregation filter on it gets pushed down to the parquet scan,
      upstream of the EventTimeWatermark node, and the watermark never
      advances (found the hard way); it lands in its own far-away window,
      which the assertions exclude by event_type.

Two measured Spark subtleties this test pins:
  * LATE-RECORD FILTERING uses the watermark of the PREVIOUS trigger, while
    EMISSION/EVICTION uses the current one — so a record one batch after the
    watermark-advancing event is still accepted into its closed-but-unevicted
    window; only records TWO-plus batches behind are dropped. f3's event is
    therefore placed two batches after f1.
  * availableNow runs a final no-data micro-batch after the last file, so
    windows finalized by the sentinel's watermark are emitted.

Expected = the batch twin over exactly (all events minus the too-late one):
streaming and batch must agree row-for-row.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from migration_pair_spark.streaming.windowed import (
    streaming_tumbling_counts,
    tumbling_counts,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])
    # microsecond timestamps: Spark's forced read schema rejects the INT64
    # nanosecond physical type pandas writes by default
    pdf.to_parquet(path, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000
    # W0 = [0, 15), W1 = [15, 30), W3 = [45, 60), W4 = [60, 75), W5 = [75, 90)
    batches = [
        [  # f0: in-order
            (1, _mins(1), "view", 1.0),
            (2, _mins(16), "view", 2.0),
            (3, _mins(17), "buy", 3.0),
        ],
        # f1: max ts 70min -> watermark 70-30 = 40min after this batch
        [(4, _mins(70), "view", 4.0)],
        [  # f2: late vs max(70) but filter-wm here is still pre-f1: KEPT
            (5, _mins(50), "buy", 5.0),
            (7, _mins(80), "view", 7.0),
        ],
        # f3: W1 (end 30) is behind the f1-advanced watermark (40) that the
        # late filter now applies: DROPPED
        [(6, _mins(20), "view", 6.0)],
        # f4: sentinel — final watermark 570min closes every real window
        [(99, _mins(600), "__flush__", 0.0)],
    ]
    for i, rows in enumerate(batches):
        _write(str(d / f"f{i}.parquet"), rows, base + i)
    return str(d)


def test_streaming_matches_batch_and_drops_only_too_late(spark, stream_dir, tmp_path):
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    agg = streaming_tumbling_counts(stream, window="15 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("winagg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_cents)
        for r in spark.sql("SELECT * FROM winagg").collect()
        if r.event_type != "__flush__"
    }

    # batch twin over every event EXCEPT the dropped too-late one (id=6) and
    # the sentinel
    batch_in = spark.read.parquet(stream_dir).filter(
        "event_id <> 6 AND event_type <> '__flush__'"
    )
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_cents)
        for r in tumbling_counts(batch_in).collect()
    }
    assert got == want
    # the late-but-within-delay event landed in its window
    assert got[(_mins(45), "buy")] == (1, 500)
    # the too-late event's window W1 was emitted WITHOUT it
    assert got[(_mins(15), "view")] == (1, 200)


def test_batch_twin_matches_duckdb_oracle_shape(spark):
    # value-level check runs in the driver harness (tumbling_event_counts);
    # here: schema + determinism over the shipped fixture
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, tumbling_counts(ev).collect()))
    b = sorted(map(tuple, tumbling_counts(ev).collect()))
    assert a == b
    assert [f.name for f in tumbling_counts(ev).schema.fields] == [
        "window_start", "event_type", "n", "sum_cents",
    ]
