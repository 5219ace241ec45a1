"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is the catalog query ``sessionize_events`` (lag + running-sum
windows, DuckDB-oracled). Unbounded streams can't use that shape — state
must live across micro-batches and be EVICTED, or it grows forever. This is
exactly the checklist's "custom stateful operators via applyInPandasWithState"
seam (SURVEY.md §2.2 streaming-only): Spark manages per-key state in the
state store; the operator logic is a plain pandas function over each key's
new events plus its carried state.

Semantics (append mode):
- events for one user belong to one session while consecutive gaps are
  <= ``gap``; a larger gap closes the session and starts a new one;
- a closed session is emitted exactly once, when the event that starts the
  NEXT session arrives, or when the event-time timeout fires (watermark
  passed last_ts + gap with no new events) — so every session is eventually
  emitted without a terminal marker;
- late events behind the watermark are dropped by Spark before the operator
  runs (same contract as the windowed aggregation).

Scale shape: state is one small tuple per ACTIVE user (open session only),
partitioned by user hash — the state store holds O(active keys), not
O(events). Arrow moves each key-batch; the pandas work is vectorized
(sort + diff + cumsum), no per-row Python loop.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (session_start_epoch_us, session_end_epoch_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_US = 1_000_000


def _sessionize_fn(gap_s: int):
    gap_us = gap_s * _US

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: the open
            # session can no longer be extended — emit and drop the state
            start_us, end_us, n = state.get
            closed.append((start_us, end_us, n))
            state.remove()
        else:
            # fold this batch's events (vectorized) into the open session
            ts_us = pd.concat([p["ts"] for p in pdfs]).astype("int64") // 1_000
            ts_us = ts_us.sort_values().to_numpy()
            cur = state.get if state.exists else None
            for t_us in ts_us:  # touches per-SESSION boundaries, and the
                # loop body is O(1); vectorizing across sessions buys nothing
                # because a batch rarely holds >2 sessions per key
                if cur is None:
                    cur = (int(t_us), int(t_us), 1)
                elif t_us - cur[1] <= gap_us:
                    cur = (cur[0], int(t_us), cur[2] + 1)
                else:
                    closed.append(cur)
                    cur = (int(t_us), int(t_us), 1)
            if cur is not None:
                state.update(cur)
                # close the open session via event-time timeout once the
                # watermark passes last_ts + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization: emits each CLOSED session exactly once.

    ``gap`` must be parseable as minutes/seconds (e.g. '30 minutes').
    """
    qty, unit = gap.split()
    gap_s = int(qty) * {"second": 1, "seconds": 1, "minute": 60, "minutes": 60}[unit]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _sessionize_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
