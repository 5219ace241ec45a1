"""Edge semantics of the round-2 operators: range-join window boundaries and
bucket seams, split determinism/stability, TF-IDF tie-breaks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from migration_pair_spark.operators.sampling import assign_split
from migration_pair_spark.operators.tfidf import tfidf_top_terms
from migration_pair_spark.operators.timeseries import range_join

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid) for i, (uid, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long",
    )


def test_range_join_window_boundaries(spark):
    """[t-30min, t) — the left edge is inclusive, the right edge exclusive,
    and a right row exactly one bucket back (cross-seam) still matches."""
    purchase_ts = T0
    left = _ev(spark, [(1, purchase_ts)])
    right = _ev(
        spark,
        [
            (1, purchase_ts - dt.timedelta(minutes=30)),            # on edge: IN
            (1, purchase_ts - dt.timedelta(minutes=30, seconds=1)), # past: OUT
            (1, purchase_ts),                                       # same instant: OUT
            (1, purchase_ts - dt.timedelta(seconds=1)),             # just before: IN
            (2, purchase_ts - dt.timedelta(minutes=5)),             # other key: OUT
        ],
    )
    got = {
        (r.user_id, r.r_ts) for r in range_join(left, right).collect()
    }
    assert got == {
        (1, purchase_ts - dt.timedelta(minutes=30)),
        (1, purchase_ts - dt.timedelta(seconds=1)),
    }


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    """A matching pair joins through exactly one bucket — no distinct is
    needed (the probe buckets are distinct and the right row has one)."""
    left = _ev(spark, [(1, T0)])
    # right row 29 min back: lands in the PREVIOUS 30-min bucket of T0
    right = _ev(spark, [(1, T0 - dt.timedelta(minutes=29))])
    rows = range_join(left, right).collect()
    assert len(rows) == 1


def test_assign_split_deterministic_and_stratified(spark):
    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    a = {(r.doc_id, r.split) for r in assign_split(df).collect()}
    b = {(r.doc_id, r.split) for r in assign_split(df).collect()}
    assert a == b  # rerun-stable
    counts = dict(
        (r.split, r.n)
        for r in assign_split(df).groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    # 75/12.5/12.5 within a generous tolerance at n=4000
    assert abs(counts["train"] / 4000 - 0.75) < 0.05
    assert abs(counts["val"] / 4000 - 0.125) < 0.04
    assert abs(counts["test"] / 4000 - 0.125) < 0.04
    # a different salt reshuffles assignments (not the same partitioning)
    c = {(r.doc_id, r.split) for r in assign_split(df, salt="v2").collect()}
    assert c != a


def test_tfidf_rank_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana zebra"),
            (2, "banana banana banana cherry"),
            (3, "apple banana cherry"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    got = {(r.doc_id, r.term) for r in out.collect()}
    # doc 1: zebra df=1 tf=1 -> 3.0; apple tf=2 df=2 -> 3.0; tie broken by
    # term asc -> apple first, then zebra; banana tf=1 df=3 -> 1.0 excluded
    assert got == {
        (1, "apple"), (1, "zebra"),
        (2, "banana"), (2, "cherry"),
        (3, "cherry"), (3, "apple"),
    }
