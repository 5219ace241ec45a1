"""Maintained materialized views (cdc/views.py): exactly-once incremental
refresh of a persisted aggregate over the CDC table.

Contract: after any sequence of base commits (inserts, LWW updates, deletes,
schema evolution, purges), refresh() brings the view to EXACTLY the direct
aggregate of the base's current state, folding only the diff span
(O(changed groups)) and rewriting only the view buckets holding net-changed
groups. Refresh commits data + reflected base version atomically: re-running
is a no-op, crash-before-commit changes nothing."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.cdc.views import MaterializedView
from migration_pair_spark.lakehouse.table import LakeTable

BASE_TS = datetime.datetime(2024, 1, 1)
DDL = ("change_lsn long, op string, url string, warc_ts timestamp, "
       "html binary, lang string, schema_epoch int")


def _ev(lsn, url, lang="en", op="insert", body="x"):
    html = f"<html><body>{body}</body></html>".encode()
    return (lsn, op, url, BASE_TS + datetime.timedelta(minutes=lsn),
            None if op == "delete" else html, lang, 1)


def _rows(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _direct(table, dim="lang"):
    import pyspark.sql.functions as F

    return {
        (r[dim],): (r["n"], r["chars"])
        for r in table.read()
        .groupBy(dim)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.expr("coalesce(length(text), 0)")).alias("chars"))
        .collect()
    }


def _state(view):
    return {
        tuple(r[d] for d in view.dims): tuple(r[m] for m in view.measure_names)
        for r in view.read().collect()
    }


def _mk(spark, tmp_path, **kw):
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    pipe.ensure_table(spark)
    table = LakeTable.load(spark, pipe.table_path)
    view = MaterializedView(
        spark, str(tmp_path / "v"), table,
        measures={"chars": "coalesce(length(text), 0)"}, **kw,
    )
    return pipe, table, view


def test_refresh_tracks_direct_aggregate_through_churn(spark, tmp_path):
    pipe, table, view = _mk(spark, tmp_path, dims=("lang",))
    batches = [
        [_ev(1, "https://a/1", "en"), _ev(2, "https://a/2", "de", body="yy"),
         _ev(3, "https://a/3", "en", body="zzz")],
        # LWW update churn: a/1 re-crawled with more text, a/2 switches lang
        [_ev(11, "https://a/1", "en", body="longer body"),
         _ev(12, "https://a/2", "fr", body="yy")],
        # deletes: the whole 'de' group is gone by now; kill one 'en' too
        [_ev(21, "https://a/3", op="delete")],
    ]
    for i, b in enumerate(batches):
        pipe.apply_batch(spark, _rows(spark, b), batch_id=i)
        out = view.refresh()
        table.refresh()
        assert out["refreshed"] is True
        assert {k: v for k, v in _state(view).items()} == {
            k: v for k, v in _direct(table).items()
        }
        assert view.reflected_version == table.version


def test_refresh_is_exactly_once_and_touches_only_changed_buckets(
    spark, tmp_path
):
    pipe, table, view = _mk(spark, tmp_path, dims=("lang",))
    pipe.apply_batch(spark, _rows(spark, [
        _ev(i + 1, f"https://a/{i}", lang) for i, lang in
        enumerate(["en", "de", "fr", "pt", "es"])]), batch_id=0)
    assert view.refresh()["refreshed"]
    # idempotent: nothing new -> no commit at all
    before_v = view.view.version
    out = view.refresh()
    assert out["refreshed"] is False and view.view.version == before_v

    # one group changes -> only its bucket rewrites
    untouched = {
        b: [e["path"] for e in fs]
        for b, fs in view.view.manifest["buckets"].items()
    }
    pipe.apply_batch(spark, _rows(spark, [
        _ev(100, "https://a/new", "en")]), batch_id=1)
    out = view.refresh()
    assert out["refreshed"] and len(out["buckets"]) == 1
    view.view.refresh()
    for b, fs in view.view.manifest["buckets"].items():
        if int(b) not in out["buckets"]:
            assert [e["path"] for e in fs] == untouched[b]
    table.refresh()
    assert _state(view) == _direct(table)


def test_pure_update_churn_is_a_metadata_only_refresh(spark, tmp_path):
    pipe, table, view = _mk(spark, tmp_path, dims=("lang",))
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, "https://a/1", "en", body="same")]), batch_id=0)
    view.refresh()
    files_before = dict(view.view.manifest["buckets"])
    # re-crawl with IDENTICAL lang and text length: net delta is zero
    pipe.apply_batch(spark, _rows(spark, [
        _ev(11, "https://a/1", "en", body="xame")]), batch_id=1)
    out = view.refresh()
    table.refresh()
    assert out["refreshed"] and out["buckets"] == []
    view.view.refresh()
    assert dict(view.view.manifest["buckets"]) == files_before
    assert view.reflected_version == table.version
    assert _state(view) == _direct(table)


def test_group_vanishes_when_all_rows_deleted(spark, tmp_path):
    pipe, table, view = _mk(spark, tmp_path, dims=("lang",))
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, "https://a/1", "en"), _ev(2, "https://a/2", "de")]), batch_id=0)
    view.refresh()
    pipe.apply_batch(spark, _rows(spark, [
        _ev(11, "https://a/2", op="delete")]), batch_id=1)
    view.refresh()
    assert set(_state(view)) == {("en",)}


def test_derived_dim_groups_by_url_host(spark, tmp_path):
    pipe, table, view = _mk(
        spark, tmp_path,
        derived_dims={"domain": "parse_url(url, 'HOST')"},
    )
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, "https://a.example/1"), _ev(2, "https://a.example/2"),
        _ev(3, "https://b.example/1")]), batch_id=0)
    view.refresh()
    s = _state(view)
    assert s[("a.example",)][0] == 2 and s[("b.example",)][0] == 1
    # updates move nothing across domains; deletes retract
    pipe.apply_batch(spark, _rows(spark, [
        _ev(11, "https://a.example/2", op="delete")]), batch_id=1)
    view.refresh()
    s = _state(view)
    assert s[("a.example",)][0] == 1


def test_definition_drift_fails_loudly(spark, tmp_path):
    pipe, table, view = _mk(spark, tmp_path, dims=("lang",))
    with pytest.raises(ValueError, match="definition drift"):
        MaterializedView(
            spark, str(tmp_path / "v"), table, dims=("lang",),
            measures={"chars": "length(text)"},  # different SQL
        )


def test_stored_dim_survives_base_rename_evolution(spark, tmp_path):
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    pipe.ensure_table(spark)
    table = LakeTable.load(spark, pipe.table_path)
    view = MaterializedView(
        spark, str(tmp_path / "v"), table, dims=("lang",),
        measures={"chars": "coalesce(length(text), 0)"},
    )
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, "https://a/1", "en")]), batch_id=0)
    view.refresh()
    # epoch 3 renames lang -> language (PAGES_EPOCH_REGISTRY); the refresh
    # spanning the rename still folds, view column name unchanged
    ev = _rows(spark, [
        (11, "insert", "https://a/2", BASE_TS, b"<html><body>q</body></html>",
         None, 3)]).withColumn("language", F.lit("de"))
    pipe.apply_batch(spark, ev, batch_id=1)
    out = view.refresh()
    assert out["refreshed"]
    s = _state(view)
    assert s[("en",)][0] == 1 and s[("de",)][0] == 1
    # view column is still spelled 'lang' (the pinned definition)
    assert view.read().columns[0] == "lang"


def test_purge_retracts_from_the_view(spark, tmp_path):
    pipe, table, view = _mk(spark, tmp_path, dims=("lang",))
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, "https://a/1", "en"), _ev(2, "https://a/2", "en"),
        _ev(3, "https://a/3", "de")]), batch_id=0)
    view.refresh()
    assert _state(view)[("en",)][0] == 2
    pipe.purge(spark, ["https://a/1"])
    view.refresh()
    table.refresh()
    assert _state(view)[("en",)][0] == 1
    assert _state(view) == _direct(table)


def test_seed_backfill_of_nonempty_base_and_crash_heal(
    spark, tmp_path, monkeypatch
):
    # a base whose empty creation snapshot was EXPIRED: the view must seed
    # by direct aggregate of the oldest retained snapshot, then go
    # incremental
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, "https://a/1", "en"), _ev(2, "https://a/2", "de")]), batch_id=0)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(11, "https://a/3", "en")]), batch_id=1)
    table = LakeTable.load(spark, pipe.table_path)
    table.expire_snapshots(keep_last=1)
    kw = dict(dims=("lang",), measures={"chars": "coalesce(length(text), 0)"})

    # crash between view creation and the seed commit -> reopen heals
    def boom(self):
        raise RuntimeError("crash before seed commit")

    monkeypatch.setattr(MaterializedView, "_seed", boom)
    with pytest.raises(RuntimeError, match="crash before seed"):
        MaterializedView(spark, str(tmp_path / "v"), table, **kw)
    monkeypatch.undo()
    view = MaterializedView(spark, str(tmp_path / "v"), table, **kw)
    assert _state(view) == _direct(table)
    # reopening again does NOT re-seed (no new commit)
    v_before = view.view.version
    view2 = MaterializedView(spark, str(tmp_path / "v"), table, **kw)
    assert view2.view.version == v_before

    # incremental from the seed point
    pipe.apply_batch(spark, _rows(spark, [
        _ev(21, "https://a/1", op="delete")]), batch_id=2)
    assert view.refresh()["refreshed"]
    table.refresh()
    assert _state(view) == _direct(table)


def test_refresh_past_retention_horizon_fails_loudly(spark, tmp_path):
    pipe, table, view = _mk(spark, tmp_path, dims=("lang",))
    for i in range(4):
        pipe.apply_batch(spark, _rows(spark, [
            _ev(i + 1, f"https://a/{i}")]), batch_id=i)
    table.refresh()
    table.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        view.refresh()
