"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is the catalog query ``sessionize_events`` (lag + running-sum
windows, DuckDB-oracled). Unbounded streams can't use that shape — state
must live across micro-batches and be EVICTED, or it grows forever. This is
exactly the checklist's "custom stateful operators via applyInPandasWithState"
seam (SURVEY.md §2.2 streaming-only): Spark manages per-key state in the
state store; the operator logic is a plain pandas function over each key's
new events plus its carried state.

Semantics — ORDER-INDEPENDENT interval merge (append mode):

- a session is a maximal set of events whose [t, t+gap] intervals chain
  together; for time-sorted input this is exactly the classic "split when
  consecutive gap > gap" rule, but the interval formulation also gives the
  RIGHT answer for out-of-order arrival WITHIN the watermark delay (a naive
  fold over arrival order corrupts the open session when a batch delivers an
  event older than the stored session end — caught in review, round 2);
- state per key is a small list of disjoint open FRAGMENTS (start, end, n);
  out-of-order events open separate fragments that coalesce when a bridging
  event arrives;
- a fragment is emitted exactly once, when the event-time watermark passes
  its end + gap: at that point no admissible future event (all >= watermark)
  can extend or bridge to it — emission-by-successor would be premature
  under reordering, so closing is driven ONLY by the watermark, via
  event-time timeout;
- events behind the watermark are dropped by Spark before the operator runs
  (the documented late-data contract, same as the windowed aggregation).

Scale shape: state is O(open fragments) per ACTIVE key (fragments > 1 only
while reordered events straddle a gap), partitioned by key hash — the state
store holds O(active keys), not O(events). Arrow moves each key-batch; the
merge work per invocation is O(events-in-batch + fragments), no per-row
Python beyond that.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: parallel arrays of open-fragment (start_us, end_us, n)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)

_US = 1_000_000


def _merge(fragments: list, ts_us: list, gap_us: int) -> list:
    """Interval-merge: existing fragments + new single-event fragments,
    coalescing whenever the chain distance is <= gap. Pure, order-free."""
    items = sorted(fragments + [(int(t), int(t), 1) for t in ts_us])
    out: list[tuple[int, int, int]] = []
    for s, e, n in items:
        if out and s <= out[-1][1] + gap_us:
            ps, pe, pn = out[-1]
            out[-1] = (ps, max(pe, e), pn + n)
        else:
            out.append((s, e, n))
    return out


def _sessionize_fn(gap_s: int, ts_col: str, key_col: str):
    gap_us = gap_s * _US

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            starts, ends, ns = state.get
            fragments = list(zip(starts, ends, ns))
        else:
            fragments = []

        if not state.hasTimedOut:
            ts = pd.concat([p[ts_col] for p in pdfs])
            # pandas datetime64[ns] -> integer microseconds
            ts_us = (ts.astype("int64") // 1_000).tolist()
            fragments = _merge(fragments, ts_us, gap_us)

        # a fragment is closed once the watermark passes end + gap: every
        # admissible future event has t >= watermark > end + gap, so it can
        # neither extend the fragment nor bridge anything into it
        wm_us = state.getCurrentWatermarkMs() * 1_000
        closed = [f for f in fragments if f[1] + gap_us < wm_us]
        open_ = [f for f in fragments if f[1] + gap_us >= wm_us]

        if open_:
            state.update((
                [f[0] for f in open_],
                [f[1] for f in open_],
                [f[2] for f in open_],
            ))
            # fire when the watermark passes the earliest open fragment's close
            state.setTimeoutTimestamp(min(f[1] for f in open_) // 1_000 + gap_s * 1_000)
        else:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key_val] * len(closed),
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
    """Streaming gap-sessionization: emits each CLOSED session exactly once
    (when the watermark passes session_end + gap). Correct under any event
    order within the watermark delay.

    ``gap`` must be parseable as minutes/seconds (e.g. '30 minutes').
    """
    qty, unit = gap.split()
    gap_s = int(qty) * {"second": 1, "seconds": 1, "minute": 60, "minutes": 60}[unit]
    out_schema = T.StructType(
        [
            T.StructField(key_col, stream.schema[key_col].dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _sessionize_fn(gap_s, ts_col, key_col),
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
