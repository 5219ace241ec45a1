"""Incremental view maintenance: folding the per-batch changelog deltas into
an aggregate state must equal the direct aggregate of the final table —
through inserts, updates, deletes, and the synth stream's schema evolution."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from migration_pair_spark import synth
from migration_pair_spark.cdc.ivm import aggregate_delta, apply_delta, empty_state
from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.lakehouse.table import LakeTable

DIMS = ("language",)
MEASURES = ("n", "chars")


def _fold(spark, feed_dir):
    state = empty_state(spark, "language string", MEASURES)
    for d in sorted(os.listdir(feed_dir)):
        feed = spark.read.parquet(os.path.join(feed_dir, d))
        # feeds carry the schema AS OF their batch: before the rename epoch
        # the dimension is still 'lang' — the consumer maps old feeds onto
        # the current naming, exactly like the engine's own normalize()
        if "language" not in feed.columns:
            feed = feed.withColumnRenamed("lang", "language")
        delta = aggregate_delta(
            feed, DIMS, {"n": F.lit(1), "chars": F.length(F.coalesce("text", F.lit("")))}
        )
        state = apply_delta(state, delta, DIMS, MEASURES)
        # each fold is tiny (groups only); materialize to keep plans flat
        state = state.localCheckpoint()
    return state


def test_ivm_equals_direct_aggregate(spark, tmp_path):
    ev = str(tmp_path / "events")
    synth.write_change_stream(ev, 1200, 150, 6, seed=11, evolution=True)
    feed_dir = str(tmp_path / "feed")
    pipe = CdcPipeline(
        table_path=str(tmp_path / "t"), n_buckets=8, salt_buckets=8,
        changelog_dir=feed_dir,
    )
    pipe.run_stream(spark, ev, str(tmp_path / "ckpt"), max_files_per_trigger=1)

    got = {
        (r.language, r.n, r.chars)
        for r in _fold(spark, feed_dir).collect()
    }
    table = LakeTable.load(spark, pipe.table_path)
    want = {
        (r.language, r.n, r.chars)
        for r in table.read()
        .groupBy("language")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("chars"),
        )
        .collect()
    }
    assert got == want
    # deletes happened (tombstones in the stream), so groups genuinely shrank
    lineages = [json.loads(l) for l in open(os.path.join(pipe.table_path, "lineage.jsonl"))]
    assert sum(l.get("rows_deleted", 0) for l in lineages) > 0


def test_ivm_group_vanishes_on_full_delete(spark, tmp_path):
    """A group whose rows are all deleted drops out of the maintained state
    (n reaches 0), matching the direct aggregate exactly."""
    import datetime as dt

    from migration_pair_spark.cdc.runner import CHANGE_STREAM_SCHEMA
    from migration_pair_spark.cdc.changelog import snapshot_diff

    t0 = dt.datetime(2024, 7, 1)

    def events(rows):
        return spark.createDataFrame(
            [
                (lsn, op, url, t0, text.encode() if text else None, lang, None, 200, 1)
                for lsn, op, url, lang, text in rows
            ],
            CHANGE_STREAM_SCHEMA,
        )

    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4, salt_buckets=4)
    l1 = pipe.apply_batch(
        spark,
        events([(1, "insert", "u/a", "fr", "<p>bonjour</p>"), (2, "insert", "u/b", "en", "<p>hi</p>")]),
    )
    l2 = pipe.apply_batch(spark, events([(3, "delete", "u/a", "fr", None)]), batch_id=1)
    table = LakeTable.load(spark, pipe.table_path)

    state = empty_state(spark, "lang string", MEASURES)
    dims = ("lang",)
    for v_from, v_to in [
        (l1["table_version_before"], l1["snapshot_id"]),
        (l2["table_version_before"], l2["snapshot_id"]),
    ]:
        feed = snapshot_diff(table, v_from, v_to)
        delta = aggregate_delta(
            feed, dims, {"n": F.lit(1), "chars": F.length(F.coalesce("text", F.lit("")))}
        )
        state = apply_delta(state, delta, dims, MEASURES).localCheckpoint()
    rows = {r.lang: (r.n, r.chars) for r in state.collect()}
    assert "fr" not in rows  # group vanished with its last row
    assert rows["en"][0] == 1


def test_ivm_null_dimension_group_folds_correctly(spark):
    """Review-caught (round 2, second pass): a NULL dimension value is a
    legitimate group — the state join must be null-safe or the group splits
    into compounding duplicates."""
    feed1 = spark.createDataFrame(
        [("insert", None, "aa"), ("insert", "en", "bbb")],
        "change_type string, language string, text string",
    )
    feed2 = spark.createDataFrame(
        [("insert", None, "cccc")],
        "change_type string, language string, text string",
    )
    state = empty_state(spark, "language string", MEASURES)
    for feed in (feed1, feed2):
        delta = aggregate_delta(
            feed, DIMS, {"n": F.lit(1), "chars": F.length("text")}
        )
        state = apply_delta(state, delta, DIMS, MEASURES).localCheckpoint()
    rows = {r.language: (r.n, r.chars) for r in state.collect()}
    assert rows == {None: (2, 6), "en": (1, 3)}


def test_ivm_fractional_measure_schema_stable_from_batch_zero(spark):
    """Advisor-caught: a fractional measure declared long in empty_state
    silently coerced to double after the first fold, so batch-0 state
    schema differed from batch-1's. measure_types pins the declared type
    and the fold must preserve it."""
    measures = ("n", "revenue")
    state = empty_state(
        spark, "language string", measures, measure_types={"revenue": "double"}
    )
    t0 = dict(state.dtypes)
    assert t0["revenue"] == "double" and t0["n"] == "bigint"
    feed = spark.createDataFrame(
        [("insert", "en", 1.25), ("insert", "en", 2.5), ("insert", "de", 0.75)],
        "change_type string, language string, price double",
    )
    for _ in range(2):
        delta = aggregate_delta(
            feed, DIMS, {"n": F.lit(1), "revenue": F.col("price")}
        )
        state = apply_delta(state, delta, DIMS, measures).localCheckpoint()
        assert dict(state.dtypes) == t0  # schema identical every batch
    rows = {r.language: (r.n, r.revenue) for r in state.collect()}
    assert rows == {"en": (4, 7.5), "de": (2, 1.5)}
