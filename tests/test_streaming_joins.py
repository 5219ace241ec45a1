"""Streaming range join == batch range join on the same events; watermarked
stream dedup collapses redelivered events to one row."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from migration_pair_spark.operators.timeseries import range_join
from migration_pair_spark.streaming.joins import dedup_stream, streaming_range_join

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _write(d, name, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    p = os.path.join(d, name)
    pdf.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(p, (mtime, mtime))


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_streaming_range_join_equals_batch(spark, tmp_path):
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ld), os.makedirs(rd)
    base = 1_700_000_000
    # purchases (left): two users; clicks (right): in/out of window, boundary
    _write(ld, "f0.parquet", [(100, _m(60), 1), (101, _m(200), 2)], base)
    _write(
        rd,
        "f0.parquet",
        [
            (1, _m(30), 1),    # exactly 30 min before 100: IN
            (2, _m(29), 1),    # 31 min before: OUT
            (3, _m(59), 1),    # 1 min before: IN
            (4, _m(60), 1),    # same instant: OUT
            (5, _m(185), 2),   # 15 min before 101: IN
            (6, _m(185), 1),   # wrong key for 101: OUT
        ],
        base + 1,
    )
    schema = "event_id long, ts timestamp, user_id long"
    sl = spark.readStream.schema(schema).parquet(ld)
    sr = spark.readStream.schema(schema).parquet(rd)
    q = (
        streaming_range_join(sl, sr)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("srj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM srj").collect()
    }
    bl = spark.read.schema(schema).parquet(ld)
    br = spark.read.schema(schema).parquet(rd)
    want = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in range_join(bl, br).collect()
    }
    assert got == want == {(1, 100, 1), (1, 100, 3), (2, 101, 5)}


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    d = str(tmp_path / "ev")
    os.makedirs(d)
    base = 1_700_000_000
    # event 1 delivered three times (two files + a dup in-file), event 2 once
    _write(d, "f0.parquet", [(1, _m(0), 7), (1, _m(0), 7), (2, _m(1), 8)], base)
    _write(d, "f1.parquet", [(1, _m(0), 7), (3, _m(2), 9)], base + 1)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dedup").collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3]
