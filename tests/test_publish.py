"""Snapshot publishing (sources/publish.py): the partitioned parquet sink."""

from __future__ import annotations

import glob
import os

import pytest

from migration_pair_spark import synth
from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.lakehouse.table import LakeTable
from migration_pair_spark.sources.publish import (
    publish_snapshot,
    published_versions,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda tp: [repr(x) for x in tp],  # None-safe total order
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pub")
    ev = str(root / "events")
    synth.write_change_stream(ev, 400, 60, 4, seed=13, evolution=True)
    pipe = CdcPipeline(table_path=str(root / "t"), n_buckets=8)
    pipe.run_stream(spark, ev, str(root / "ck"))
    return LakeTable.load(spark, pipe.table_path)


def test_publish_partitioned_roundtrip(spark, table, tmp_path):
    out = str(tmp_path / "pub")
    d = publish_snapshot(table, out, partition_by=("language",))
    assert d is not None and os.path.exists(os.path.join(d, "_PUBLISHED"))
    # partition layout on disk
    assert glob.glob(os.path.join(d, "language=*")), "no partition dirs"
    back = spark.read.parquet(d)
    assert _rows(back) == _rows(table.read())
    assert published_versions(out) == [table.version]
    # idempotent per version
    assert publish_snapshot(table, out, partition_by=("language",)) is None


def test_publish_old_version_and_validation(spark, table, tmp_path):
    out = str(tmp_path / "pub")
    old_v = table.version - 1
    d = publish_snapshot(table, out, version=old_v)
    back = spark.read.parquet(d)
    assert _rows(back) == _rows(table.at_version(old_v).read())
    assert published_versions(out) == [old_v]
    with pytest.raises(ValueError, match="unknown column"):
        publish_snapshot(table, out, partition_by=("nope",))


def test_publish_crash_rerun_overwrites(spark, table, tmp_path, monkeypatch):
    out = str(tmp_path / "pub")
    # simulate a crash between the data write and the marker
    import migration_pair_spark.sources.publish as pub

    real_open = open

    def dying_open(path, *a, **k):
        if str(path).endswith("_PUBLISHED"):
            raise RuntimeError("boom")
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", dying_open)
    with pytest.raises(RuntimeError, match="boom"):
        pub.publish_snapshot(table, out)
    monkeypatch.undo()
    assert published_versions(out) == []  # no marker -> not published
    d = pub.publish_snapshot(table, out)  # re-run completes
    assert d is not None
    assert _rows(spark.read.parquet(d)) == _rows(table.read())


def test_publish_spec_mismatch_fails_loudly(spark, table, tmp_path):
    """The marker records the partition spec: re-publishing the same
    version under a DIFFERENT partition_by must raise, not silently
    no-op with the wrong layout on disk (review-caught)."""
    out = str(tmp_path / "pub")
    assert publish_snapshot(table, out) is not None  # unpartitioned
    assert publish_snapshot(table, out) is None      # same spec: idempotent
    with pytest.raises(ValueError, match="partition spec|unpartitioned"):
        publish_snapshot(table, out, partition_by=("language",))
    out2 = str(tmp_path / "pub2")
    assert publish_snapshot(table, out2, partition_by=("language",)) is not None
    with pytest.raises(ValueError, match="partition spec"):
        publish_snapshot(table, out2)


def test_publish_legacy_ok_marker_infers_spec(spark, table, tmp_path):
    """Markers written before spec recording ('ok') infer the spec from
    the on-disk partition chain: legacy idempotent re-publishes stay
    no-ops and mismatches still raise (review-caught: assuming legacy
    meant unpartitioned false-raised on partitioned re-publishes AND
    silently no-opped mismatched unpartitioned ones)."""
    out = str(tmp_path / "pub")
    d = publish_snapshot(table, out, partition_by=("language",))
    with open(os.path.join(d, "_PUBLISHED"), "w") as f:
        f.write("ok")  # simulate the pre-spec marker
    assert publish_snapshot(table, out, partition_by=("language",)) is None
    with pytest.raises(ValueError, match="partition spec"):
        publish_snapshot(table, out)
    out2 = str(tmp_path / "pub2")
    d2 = publish_snapshot(table, out2)  # unpartitioned
    with open(os.path.join(d2, "_PUBLISHED"), "w") as f:
        f.write("ok")
    assert publish_snapshot(table, out2) is None
    with pytest.raises(ValueError, match="partition spec"):
        publish_snapshot(table, out2, partition_by=("language",))
