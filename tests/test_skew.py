"""Pathological hot-key skew for the CDC merge (VERDICT r4 item #7): the
bench's zipf profile is fixed, so this pins the skew story at a harsher
operating point — ONE url carries 10% of all change events. The LWW merge
is the aggregate form (cdc/lww.lww_dedup_agg): partial aggregation combines
the hot url's events map-side, so the shuffle carries O(distinct keys)
rows and the hot key costs one combiner, not one giant reducer partition.

Wall-time assertion protocol follows the bench's steal discipline
(memory: single samples spike up to 8x on this VM): interleaved reps,
compare per-side MINIMA, generous factor + absolute cushion. The point is
to catch a quadratic/straggler regression (hot case 10-100x slower), not
to micro-benchmark."""

from __future__ import annotations

import time

import numpy as np

from migration_pair_spark import synth
from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.lakehouse.table import LakeTable

N_EVENTS = 120_000
N_URLS = 12_000
REPS = 3


def _events(hot: bool):
    ev = synth.make_change_events(N_EVENTS, N_URLS, seed=7)
    rng = np.random.default_rng(11)
    urls = np.asarray(synth.make_urls(N_URLS))
    idx = rng.integers(0, N_URLS, size=N_EVENTS)
    if hot:
        idx[::10] = 0  # one url takes exactly 10% of all events
    ev["url"] = urls[idx]
    return ev


def test_hot_url_10pct_within_factor_of_uniform(spark, tmp_path):
    sdfs = {
        name: spark.createDataFrame(_events(hot)).localCheckpoint()
        for name, hot in (("uniform", False), ("hot", True))
    }
    walls: dict[str, list[float]] = {"uniform": [], "hot": []}
    run = 0
    for rep in range(REPS):
        for name in ("uniform", "hot"):  # interleaved: steal hits both sides
            run += 1
            pipe = CdcPipeline(
                table_path=str(tmp_path / f"t{run}"), n_buckets=8, salt_buckets=8
            )
            t0 = time.time()
            pipe.apply_batch(spark, sdfs[name])
            walls[name].append(time.time() - t0)

    mu, mh = min(walls["uniform"]), min(walls["hot"])
    assert mh <= 3.0 * mu + 2.0, (
        f"hot-url apply {mh:.2f}s vs uniform {mu:.2f}s "
        f"(all reps: {walls}) — hot-key skew is no longer neutralized"
    )

    # and the hot case is CORRECT, not just fast: final state == oracle
    t = LakeTable.load(spark, str(tmp_path / f"t{run}"))
    got = {r["url"] for r in t.read().select("url").collect()}
    want = set(synth.oracle_final_state(_events(True))["url"])
    assert got == want
