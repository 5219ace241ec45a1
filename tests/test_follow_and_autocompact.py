"""Continuous tail (follow_stream) and MOR auto-compaction policy."""

from __future__ import annotations

import os

import pytest

from migration_pair_spark import synth
from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.lakehouse.table import LakeTable


def test_follow_stream_picks_up_new_files(spark, tmp_path):
    import pandas as pd

    d = str(tmp_path / "events")
    full1 = synth.write_change_stream(d, 300, 60, 2, seed=51)
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    query, lineages = pipe.follow_stream(
        spark, d, str(tmp_path / "ck"), processing_time="1 second"
    )
    try:
        query.processAllAvailable()
        assert len(lineages) == 2
        n1 = LakeTable.load(spark, pipe.table_path).read().count()

        # a NEW change file lands while the stream is running
        more = synth.make_change_events(200, 60, seed=52)
        more["change_lsn"] += 300
        import pyarrow as pa, pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(more, schema=synth.arrow_schema(1), preserve_index=False),
            os.path.join(d, "events-99999.parquet"),
        )
        query.processAllAvailable()
        assert len(lineages) == 3
        assert lineages[-1]["lsn_max"] == 500
    finally:
        query.stop()
    t = LakeTable.load(spark, pipe.table_path)
    assert int(t.properties["engine.max_lsn"]) == 500
    oracle = synth.oracle_final_state(pd.concat([full1, more], ignore_index=True))
    got = sorted(r.url for r in t.read().select("url").collect())
    assert got == sorted(oracle["url"])


def test_auto_compaction_bounds_delta_files(spark, tmp_path):
    d = str(tmp_path / "events")
    synth.write_change_stream(d, 600, 40, 6, seed=53)
    pipe = CdcPipeline(
        table_path=str(tmp_path / "t"),
        n_buckets=4,
        write_mode="mor",
        auto_compact_files_per_bucket=3,
    )
    lineages = pipe.run_stream(spark, d, str(tmp_path / "ck"), max_files_per_trigger=1)
    assert any("auto_compacted_buckets" in l for l in lineages)
    t = LakeTable.load(spark, pipe.table_path)
    # policy held: no bucket ends the stream far above the threshold
    assert max(len(fs) for fs in t.manifest["buckets"].values()) <= 3 + 1
    # state still correct vs a plain COW run of the same stream
    cow = CdcPipeline(table_path=str(tmp_path / "t2"), n_buckets=4)
    cow.run_stream(spark, d, str(tmp_path / "ck2"), max_files_per_trigger=1)
    a = sorted(tuple(r) for r in LakeTable.load(spark, pipe.table_path).read().collect())
    b = sorted(tuple(r) for r in LakeTable.load(spark, cow.table_path).read().collect())
    assert a == b
