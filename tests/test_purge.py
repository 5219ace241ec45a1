"""Right-to-be-forgotten erasure (LakeTable.purge_keys + CDC suppression).

Contract: a purge physically removes every stored row version of the keys —
tombstones and merge-on-read deltas included — from the current snapshot in
ONE atomic commit (only the files whose zone maps / blooms cannot rule the
keys out rewrite), records the keys on a suppression ledger so FUTURE change
events for them are dropped at the apply gate (LSNs committed as decided —
neither replay nor a late event resurrects an erased key), and erasure
completes across retained history via expire_snapshots + vacuum, audited by
verify_purged. The Debezium export masks payload images of purged keys in
every span (the key itself survives so replicas can delete their copy)."""

from __future__ import annotations

import datetime
import glob
import json
import os

from migration_pair_spark import synth
from migration_pair_spark.cdc.runner import CdcPipeline, pages_wire_payload_schema
from migration_pair_spark.lakehouse.table import PURGE_EPOCH_PROP, LakeTable
from migration_pair_spark.sources.debezium import export_changelog_debezium

BASE_TS = datetime.datetime(2024, 1, 1)
DDL = ("change_lsn long, op string, url string, warc_ts timestamp, "
       "html binary, lang string, schema_epoch int")


def _ev(lsn, url, rev=0, op="insert", lang="en"):
    html = f"<html><body>doc {url} rev {rev}</body></html>".encode()
    return (lsn, op, url, BASE_TS + datetime.timedelta(minutes=lsn),
            None if op == "delete" else html, lang, 1)


def _rows(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _urls(table, include_tombstones=False):
    df = table.read(include_tombstones=include_tombstones)
    return sorted(r.url for r in df.select("url").collect())


URLS = [f"https://site{i % 3}.example/page-{i}" for i in range(10)]


def test_purge_erases_all_versions_and_prunes_files(spark, tmp_path):
    # MOR accumulates one delta file set per batch, so a purged key's old
    # versions live in SEVERAL files — all must go, and files provably
    # clean of the keys (parquet blooms) must NOT rewrite.
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4,
                       write_mode="mor", bloom_filter_cols=("url",))
    pipe.apply_batch(spark, _rows(spark, [
        _ev(i + 1, u, rev=1) for i, u in enumerate(URLS)]), batch_id=1)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(i + 11, u, rev=2) for i, u in enumerate(URLS)]), batch_id=2)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(21, URLS[3], op="delete"),            # URLS[3] -> tombstone
        _ev(22, "https://site9.example/new", rev=1)]), batch_id=3)

    t = LakeTable.load(spark, pipe.table_path)
    before = {r.url: r.text for r in t.read().collect()}
    total_files = sum(len(fs) for fs in t.manifest["buckets"].values())
    res = pipe.purge(spark, [URLS[1], URLS[3]])
    t.refresh()

    gone = {URLS[1], URLS[3]}
    # erased from the visible snapshot AND as stored rows (tombstone incl.)
    assert set(_urls(t)) == set(before) - gone
    assert not gone & set(_urls(t, include_tombstones=True))
    # survivors untouched (MOR resolution still correct after the rewrite)
    after = {r.url: r.text for r in t.read().collect()}
    assert after == {u: x for u, x in before.items() if u not in gone}
    # file-level surgery: only files that may contain the keys rewrote
    lin = res["lineage"]
    assert lin["purge"] and lin["n_keys"] == 2
    assert 1 <= lin["files_rewritten"] < total_files
    assert t.properties[PURGE_EPOCH_PROP] == "1"


def test_purge_of_absent_key_is_metadata_only_but_arms_suppression(
    spark, tmp_path
):
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    pipe.apply_batch(spark, _rows(spark, [_ev(1, URLS[0])]), batch_id=1)
    t = LakeTable.load(spark, pipe.table_path)
    v0 = t.version
    res = pipe.purge(spark, ["https://never.example/seen"])
    t.refresh()
    assert res["lineage"]["files_rewritten"] == 0
    assert t.version == v0 + 1 and t.properties[PURGE_EPOCH_PROP] == "1"
    # the never-seen key is now suppressed: a later event for it drops
    lin = pipe.apply_batch(spark, _rows(spark, [
        _ev(50, "https://never.example/seen")]), batch_id=2)
    assert lin["rows_suppressed"] == 1
    assert set(_urls(t)) == {URLS[0]}


def test_suppression_blocks_late_events_exactly_once(spark, tmp_path):
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(i + 1, u) for i, u in enumerate(URLS[:4])]), batch_id=1)
    pipe.purge(spark, [URLS[0]])
    t = LakeTable.load(spark, pipe.table_path)

    late = _rows(spark, [
        _ev(101, URLS[0], rev=9),       # suppressed
        _ev(102, URLS[0], rev=10),      # suppressed
        _ev(103, URLS[1], rev=9),       # applies
    ])
    lin = pipe.apply_batch(spark, late, batch_id=2)
    t.refresh()
    assert lin["rows_suppressed"] == 2
    # decided rows are NOT in the per-bucket applied counts
    assert sum(lin["partition_counts"].values()) == 1
    assert URLS[0] not in _urls(t, include_tombstones=True)
    # suppressed LSNs committed as decided: replaying the batch no-ops
    lin2 = pipe.apply_batch(spark, late, batch_id=2)
    assert lin2["skipped"] and lin2["rows_skipped"] == 3
    # a brand-new later event is still suppressed: the batch COMMITS its
    # LSN as decided (not a replay skip) but upserts nothing
    lin3 = pipe.apply_batch(
        spark, _rows(spark, [_ev(200, URLS[0], rev=11)]), batch_id=3)
    assert lin3["rows_suppressed"] == 1 and not lin3["skipped"]
    assert lin3["rows_upserted"] == 0 and lin3["partition_counts"] == {}
    assert URLS[0] not in _urls(t, include_tombstones=True)


def test_suppression_and_expectations_count_distinctly(spark, tmp_path):
    qdir = str(tmp_path / "quarantine")
    pipe = CdcPipeline(
        table_path=str(tmp_path / "t"), n_buckets=4,
        expectations={"lang_known": "lang IN ('en','de')"},
        violations_dir=qdir,
    )
    pipe.apply_batch(spark, _rows(spark, [_ev(1, URLS[0])]), batch_id=1)
    pipe.purge(spark, [URLS[5], URLS[6]])
    batch = _rows(spark, [
        _ev(11, URLS[5], rev=2),                  # suppressed only
        _ev(12, URLS[7], rev=2, lang="zz"),       # violates only
        _ev(13, URLS[6], rev=2, lang="zz"),       # suppressed AND violates
        _ev(14, URLS[8], rev=2),                  # clean
    ])
    lin = pipe.apply_batch(spark, batch, batch_id=2)
    assert lin["rows_suppressed"] == 2
    assert lin["rows_rejected"] == 2            # expectation violators
    # the union (3 decided rows) subtracts once: only the clean row applied
    assert sum(lin["partition_counts"].values()) == 1
    t = LakeTable.load(spark, pipe.table_path)
    assert set(_urls(t)) == {URLS[0], URLS[8]}
    # quarantine holds the plain violator but NEVER purged-key content
    q = spark.read.parquet(os.path.join(qdir, "batch=2"))
    assert [r.url for r in q.collect()] == [URLS[7]]
    assert "_suppressed" not in q.columns


def test_streaming_multifile_gate_with_suppression(spark, tmp_path):
    # the suppression broadcast join must not break the per-delivery-unit
    # gate (input_file_name survives the probe side of a BHJ)
    ev = str(tmp_path / "events")
    full = synth.write_change_stream(ev, 300, 40, 6, seed=7)
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    pipe.ensure_table(spark)
    purged = sorted(full["url"].unique())[:3]
    pipe.purge(spark, list(purged))
    pipe.run_stream(spark, ev, str(tmp_path / "ck"), max_files_per_trigger=2)
    t = LakeTable.load(spark, pipe.table_path)
    oracle = synth.oracle_final_state(full)
    want = set(oracle["url"]) - set(purged)
    assert set(_urls(t)) == want
    # duplicate delivery via a fresh checkpoint stays converged
    pipe.run_stream(spark, ev, str(tmp_path / "ck2"), max_files_per_trigger=3)
    t.refresh()
    assert set(_urls(t)) == want


def test_purge_canonicalizes_like_ingest(spark, tmp_path):
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4,
                       canonicalize_key=True)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, "https://EX.example/p?utm_source=tw&x=1"),
        _ev(2, "https://ex.example/other")]), batch_id=1)
    t = LakeTable.load(spark, pipe.table_path)
    assert set(_urls(t)) == {"https://ex.example/p?x=1",
                             "https://ex.example/other"}
    # purging a DIFFERENT crawl variant of the same page erases it
    pipe.purge(spark, ["https://EX.example:443/p?x=1#frag"])
    t.refresh()
    assert set(_urls(t)) == {"https://ex.example/other"}
    lin = pipe.apply_batch(spark, _rows(spark, [
        _ev(9, "https://ex.example/p?x=1&utm_medium=m")]), batch_id=2)
    assert lin["rows_suppressed"] == 1


def test_history_erasure_completes_with_retention(spark, tmp_path):
    marker = "https://erase-me.example/secret-page"
    pipe = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, marker), _ev(2, URLS[0])]), batch_id=1)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(3, marker, rev=2), _ev(4, URLS[1])]), batch_id=2)
    t = LakeTable.load(spark, pipe.table_path)
    res = pipe.purge(spark, [marker])
    t.refresh()

    # pre-purge snapshots still hold the rows — verify_purged names them
    held = t.verify_purged([marker])
    assert held and all(v < res["snapshot_id"] for v in held)
    assert res["snapshot_id"] not in held

    # retention completes the erasure
    t.expire_snapshots(keep_last=1)
    deleted = t.vacuum(older_than_s=0.0)
    assert deleted
    assert t.verify_purged([marker]) == {}
    # the bytes are PHYSICALLY gone from every remaining data file
    for fp in glob.glob(os.path.join(pipe.table_path, "data", "**", "*.parquet"),
                        recursive=True):
        with open(fp, "rb") as fh:
            assert marker.encode() not in fh.read()
    # ... but the suppression ledger intentionally retains the key
    assert [r.url for r in t.suppressed_keys().collect()] == [marker]


def test_debezium_export_masks_purged_images_in_every_span(spark, tmp_path):
    ua, ub = "https://keep.example/a", "https://purge.example/b"
    pipe = CdcPipeline(table_path=str(tmp_path / "A"), n_buckets=4)
    pipe.apply_batch(spark, _rows(spark, [
        _ev(1, ua, rev=1), _ev(2, ub, rev=1)]), batch_id=1)
    t = LakeTable.load(spark, pipe.table_path)
    v0 = t.snapshot_versions()[0]
    v1 = t.version
    pipe.apply_batch(spark, _rows(spark, [_ev(3, ub, rev=2)]), batch_id=2)
    t.refresh()
    v2 = t.version
    pipe.purge(spark, [ub])
    t.refresh()
    v3 = t.version

    out = str(tmp_path / "feed")
    wire = pages_wire_payload_schema()
    files = [export_changelog_debezium(t, out, a, b, payload_schema=wire)
             for a, b in ((v0, v1), (v1, v2), (v2, v3))]
    assert all(files)

    envs = []
    for f in files:
        with open(f) as fh:
            envs.extend(json.loads(line) for line in fh)
    for e in envs:
        for img in (e.get("before"), e.get("after")):
            if img is None:
                continue
            if img["url"] == ub:
                # images of a purged key are masked in EVERY span — even
                # pre-purge history exported after the purge (to_json
                # omits null fields, so masked == absent)
                assert img.get("html") is None and img.get("text") is None
                assert img.get("lang") is None
            else:
                assert img["url"] == ua and img.get("html") is not None
    # the purge span itself ships the delete
    ops_b = [e["op"] for e in envs
             if (e.get("before") or e.get("after", {}) or {}).get("url") == ub]
    assert ops_b[-1] == "d"

    # a replica ingesting all spans converges: purged key absent, kept key
    # byte-identical
    rep = CdcPipeline(table_path=str(tmp_path / "B"), n_buckets=2,
                      source_format="debezium-json")
    rep.run_stream(spark, out, str(tmp_path / "ckB"))
    tb = LakeTable.load(spark, rep.table_path)
    assert set(_urls(tb)) == {ua}
    a_row = t.read().filter(f"url = '{ua}'").collect()[0]
    b_row = tb.read().filter(f"url = '{ua}'").collect()[0]
    assert (a_row.text, bytes(a_row.html)) == (b_row.text, bytes(b_row.html))
