"""Metadata views (LakeTable.history / files): Iceberg
history/snapshots/files analogs built from the retained manifests."""

from __future__ import annotations

import json

from migration_pair_spark import synth
from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.lakehouse.table import LakeTable


def test_history_and_files_views(spark, tmp_path):
    ev = str(tmp_path / "events")
    synth.write_change_stream(ev, 300, 40, 3, seed=21, evolution=True)
    p = CdcPipeline(
        table_path=str(tmp_path / "t"), n_buckets=4,
        stats_cols=("warc_ts", "_lsn"),
    )
    p.run_stream(spark, ev, str(tmp_path / "ck"))
    t = LakeTable.load(spark, p.table_path)
    t.compact(sort_by=["warc_ts"])

    h = {r["version"]: r for r in t.history().collect()}
    assert sorted(h) == t.snapshot_versions()
    assert h[1]["operation"] == "create" and h[1]["parent"] is None
    applies = [r for r in h.values() if r["operation"] == "cdc-apply"]
    assert len(applies) == 3
    # evolution commits carry their OWN lineage, not the parent apply's
    evolves = [r for r in h.values() if r["operation"] == "evolve"]
    assert len(evolves) == 2  # epochs 2 and 3
    assert "schema_evolution" in json.loads(evolves[0]["lineage_json"])
    assert [r["version"] for r in h.values() if r["operation"] == "compact"] == [
        max(h)
    ]
    # commit clock present and monotone over the chain
    ts = [h[v]["committed_at_ms"] for v in sorted(h)]
    assert all(x is not None for x in ts) and ts == sorted(ts)
    # version chain links
    for v in sorted(h)[1:]:
        assert h[v]["parent"] == v - 1
    # lineage rides along for the applies
    lin = json.loads(applies[0]["lineage_json"])
    assert "lsn_min" in lin and "rows_in_batch" in lin
    # zone maps make row counts exact: history n_rows == actual rows
    cur = h[max(h)]
    assert cur["n_rows"] == t.read(include_tombstones=True).count()

    f = t.files().collect()
    assert len(f) == sum(len(fs) for fs in t.manifest["buckets"].values())
    assert all(r["n_rows"] >= 1 for r in f)
    stats = json.loads(f[0]["stats_json"])
    assert "_lsn" in stats and "warc_ts" in stats
    assert sum(r["n_rows"] for r in f) == cur["n_rows"]
    # files() of an older snapshot reflects that snapshot
    f_old = t.files(version=2).collect()
    assert {r["path"] for r in f_old} != {r["path"] for r in f}


def test_history_without_stats_has_null_rows(spark, tmp_path):
    ev = str(tmp_path / "events")
    synth.write_change_stream(ev, 100, 20, 1, seed=22)
    p = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=2)  # no stats
    p.run_stream(spark, ev, str(tmp_path / "ck"))
    t = LakeTable.load(spark, p.table_path)
    rows = {r["version"]: r for r in t.history().collect()}
    assert rows[max(rows)]["n_rows"] is None
    assert all(r["stats_json"] is None for r in t.files().collect())
