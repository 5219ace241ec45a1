"""applyInPandasWithState sessionization: closed sessions emitted by the
STREAM must equal the batch sessionization of the same events.

Stream = per-user event files in time order + a far-future sentinel user
whose events advance the watermark far enough that every real session hits
its event-time timeout and is emitted. The batch oracle is computed in
pandas (same 30-min-gap rule as the sessionize_events catalog query)."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from migration_pair_spark.streaming.stateful import sessionize_stream

T0 = dt.datetime(2024, 4, 1)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf.to_parquet(path, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000
    files = [
        # user 1: session A (0, 10, 25); user 2: session C (5)
        [(1, _mins(0)), (1, _mins(10)), (2, _mins(5)), (1, _mins(25))],
        # user 1: gap 35 > 30 -> session B starts (60, 70); user 2 extends C
        # (gap 30 == limit, still same session: <= is inclusive)
        [(1, _mins(60)), (1, _mins(70)), (2, _mins(35))],
        # sentinel user 99 far ahead: watermark sails past every timeout
        [(99, _mins(10_000))],
    ]
    for i, rows in enumerate(files):
        _write(str(d / f"f{i}.parquet"), rows, base + i)
    return str(d)


def _batch_sessions(pdf: pd.DataFrame, gap_min=30):
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts"]).groupby("user_id"):
        ts = list(g["ts"])
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if (t - last).total_seconds() <= gap_min * 60:
                last, n = t, n + 1
            else:
                out.append((uid, start, last, n))
                start, last, n = t, t, 1
        out.append((uid, start, last, n))
    return set(out)


def test_streaming_sessions_equal_batch(spark, stream_dir, tmp_path):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    sess = sessionize_stream(stream, gap="30 minutes", watermark="30 minutes")
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess").collect()
        if r.user_id != 99  # the sentinel's own session may or may not close
    }
    pdf = pd.read_parquet(stream_dir)
    want = _batch_sessions(pdf[pdf.user_id != 99])
    assert got == want
    # concrete shape: user 1 split into two sessions at the >30-min gap
    assert (1, _mins(0), _mins(25), 3) in got
    assert (1, _mins(60), _mins(70), 2) in got
    # inclusive-gap boundary: user 2's 30-min gap did NOT split
    assert (2, _mins(5), _mins(35), 2) in got


def test_streaming_sessions_state_survives_restart(spark, stream_dir, tmp_path):
    """Kill after the first micro-batch, resume from the checkpoint: the
    union of emissions still equals the batch oracle — the open-session
    STATE (user 1's session A is still open at the kill point) persisted in
    the state store across the restart."""
    ckpt = str(tmp_path / "ckpt")
    emitted: set = set()

    def run(kill_after: int | None):
        seen = {"n": 0}

        def sink(df, bid):
            emitted.update(
                (r.user_id, r.session_start, r.session_end, r.n_events)
                for r in df.collect()
            )
            seen["n"] += 1
            if kill_after is not None and seen["n"] >= kill_after:
                raise RuntimeError("injected crash")

        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            sessionize_stream(stream)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception):
        run(kill_after=1)
    run(kill_after=None)  # resume

    pdf = pd.read_parquet(stream_dir)
    want = _batch_sessions(pdf[pdf.user_id != 99])
    got = {s for s in emitted if s[0] != 99}
    assert got == want


def test_out_of_order_within_watermark_matches_batch(spark, tmp_path):
    """Review-caught (round 2): an event OLDER than the stored session end,
    delivered in a later micro-batch but above the watermark, must not
    corrupt the open session. The interval-merge semantics give the batch
    answer for any arrival order within the delay."""
    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000
    files = [
        [(1, _mins(10))],                    # batch 1: session seed at :10
        [(1, _mins(0)), (1, _mins(45))],     # batch 2: OLDER event (:00) + :45
        [(99, _mins(10_000))],               # sentinel: close everything
    ]
    for i, rows in enumerate(files):
        _write(str(d / f"f{i}.parquet"), rows, base + i)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="60 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ooo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM ooo").collect()
        if r.user_id != 99
    }
    pdf = pd.read_parquet(str(d))
    want = _batch_sessions(pdf[pdf.user_id != 99])
    # sorted order 0,10,45: gaps 10 and 35 -> sessions (0..10, n=2), (45, n=1)
    assert got == want == {
        (1, _mins(0), _mins(10), 2),
        (1, _mins(45), _mins(45), 1),
    }


def test_out_of_order_bridging_event_coalesces_fragments(spark, tmp_path):
    """Two fragments opened out of order coalesce when a bridging event
    lands between them: (:00) and (:50) are separate until (:25) arrives."""
    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000
    files = [
        [(1, _mins(0)), (1, _mins(50))],   # two disjoint fragments (gap 50 > 30)
        [(1, _mins(25))],                   # bridges: 25-0 <= 30 and 50-25 <= 30
        [(99, _mins(10_000))],
    ]
    for i, rows in enumerate(files):
        _write(str(d / f"f{i}.parquet"), rows, base + i)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="60 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bridge")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM bridge").collect()
        if r.user_id != 99
    }
    assert got == {(1, _mins(0), _mins(50), 3)}


def test_custom_ts_and_key_columns(spark, tmp_path):
    """Review-caught (round 2): ts_col/key_col parameters must thread through
    to the state function and the output schema."""
    d = tmp_path / "ev"
    d.mkdir()
    pdf = pd.DataFrame(
        [(7, _mins(0)), (7, _mins(5)), (99, _mins(10_000))],
        columns=["device", "event_time"],
    )
    p = str(d / "f0.parquet")
    pdf.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
    stream = spark.readStream.schema("device long, event_time timestamp").parquet(str(d))
    sess = sessionize_stream(
        stream, gap="30 minutes", watermark="30 minutes",
        ts_col="event_time", key_col="device",
    )
    assert sess.columns == ["device", "session_start", "session_end", "n_events"]
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("customcols")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.device, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM customcols").collect()
        if r.device != 99
    }
    assert got == {(7, _mins(0), _mins(5), 2)}


def test_fragment_close_exactly_on_watermark_boundary(spark, tmp_path):
    """Edge probe (round 2): a fragment whose end+gap lands EXACTLY on the
    watermark stays open (an event at t == watermark is admissible and can
    still attach), the timeout re-arms at a timestamp equal to the current
    watermark without error, and the session closes once the watermark
    moves past."""
    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000
    files = [
        # after this batch wm = 10000-30 = 9970 == fragment end (9940) + gap
        [(1, _mins(9940)), (99, _mins(10_000))],
        [(99, _mins(10_001))],  # timeout fires with end+gap == wm: no close yet
        [(99, _mins(11_000))],  # wm sails past: NOW it closes
    ]
    for i, rows in enumerate(files):
        _write(str(d / f"f{i}.parquet"), rows, base + i)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wmedge")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM wmedge").collect()
        if r.user_id != 99
    }
    assert got == {(1, _mins(9940), _mins(9940), 1)}
