"""LWW dedup unit tests (SURVEY.md §5.2 #1): duplicates, warc_ts ties broken
by change_lsn, out-of-order arrival, and salt invariance (salt only affects
partitioning, never the winner)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.cdc.lww import lww_dedup, lww_dedup_agg
from migration_pair_spark import synth

TS = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)

ROWS = [
    # url, warc_ts, change_lsn, op
    ("u1", TS(10), 1, "insert"),
    ("u1", TS(30), 2, "update"),   # winner for u1 (latest ts)
    ("u1", TS(20), 3, "update"),   # later lsn but older ts -> loses
    ("u2", TS(10), 4, "insert"),
    ("u2", TS(10), 7, "update"),   # tie on ts -> lsn 7 wins
    ("u2", TS(10), 5, "update"),
    ("u3", TS(50), 6, "delete"),   # single event
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, change_lsn long, op string"
    )


def _winners(df, **kw):
    return {
        r.url: (r.change_lsn, r.op)
        for r in lww_dedup(df, **kw).collect()
    }


def test_basic_winners(spark):
    w = _winners(_df(spark))
    assert w == {"u1": (2, "update"), "u2": (7, "update"), "u3": (6, "delete")}


def test_tie_on_ts_broken_by_lsn(spark):
    w = _winners(_df(spark))
    assert w["u2"] == (7, "update")


def test_salt_invariance(spark):
    df = _df(spark)
    for salt in (1, 2, 16, 64):
        assert _winners(df, salt_buckets=salt) == _winners(df, salt_buckets=1)


def test_salt_invariance_on_skewed_stream(spark):
    # zipf-skewed synthetic stream: hot urls dominate; winners must be
    # identical under any salting.
    pdf = synth.make_change_events(1200, 50, seed=7)
    df = spark.createDataFrame(pdf)
    unsalted = _winners(df, salt_buckets=1)
    assert _winners(df, salt_buckets=32) == unsalted
    # independent pandas oracle
    oracle = synth.oracle_final_state(pdf)
    want_lsn = dict(zip(oracle.url, oracle.change_lsn))
    got_non_delete = {u: v[0] for u, v in unsalted.items() if v[1] != "delete"}
    assert {u: l for u, l in got_non_delete.items() if u in want_lsn} == want_lsn


def test_exactly_one_row_per_key(spark):
    out = lww_dedup(_df(spark))
    assert out.count() == out.select("url").distinct().count() == 3


def test_agg_form_equals_window_form(spark):
    # the CDC hot path uses the max_by aggregate; it must pick exactly the
    # same winners as the window rank on skewed, tied, out-of-order input
    pdf = synth.make_change_events(1500, 60, seed=11)
    df = spark.createDataFrame(pdf)
    via_window = {
        (r.url, r.change_lsn) for r in lww_dedup(df, salt_buckets=16).collect()
    }
    via_agg = {(r.url, r.change_lsn) for r in lww_dedup_agg(df).collect()}
    assert via_agg == via_window


def test_agg_form_preserves_columns(spark):
    out = lww_dedup_agg(_df(spark))
    assert set(out.columns) == {"url", "warc_ts", "change_lsn", "op"}
    assert {r.url: r.change_lsn for r in out.collect()} == {"u1": 2, "u2": 7, "u3": 6}


def test_pathological_hot_key(spark):
    # 90% of a stream hitting ONE url: the max_by aggregate pre-folds per map
    # partition, so correctness holds and no single reducer sees the full
    # hot-key row set. (cdc.apply uses this form; see lww_dedup_agg.)
    import numpy as np
    import pandas as pd

    n = 20_000
    rng = np.random.default_rng(3)
    hot = rng.random(n) < 0.9
    pdf = pd.DataFrame(
        {
            "url": np.where(hot, "https://hot.example/", [f"https://u/{i}" for i in range(n)]),
            "warc_ts": pd.to_datetime(1_704_067_200_000_000 + rng.integers(0, 1000, n) * 1_000_000, unit="us"),
            "change_lsn": np.arange(1, n + 1, dtype=np.int64),
            "op": np.where(rng.random(n) < 0.1, "delete", "update"),
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r.url: r.change_lsn for r in lww_dedup_agg(df).collect()}
    # model winner for the hot key
    hot_rows = pdf[pdf.url == "https://hot.example/"]
    want = hot_rows.sort_values(["warc_ts", "change_lsn"]).iloc[-1]
    assert out["https://hot.example/"] == want.change_lsn
    assert len(out) == pdf["url"].nunique()
