"""Row-level expectations (cdc/apply.py): quality gates on ingest.

Contract: violators (predicate false OR null) are counted per expectation
in lineage via the existing gate pass, and either dropped before the LWW
merge (their LSNs commit as decided — replay never resurrects them) or
fail the batch before any commit. Counting covers FRESH rows only, so a
replayed batch neither re-counts nor re-fails."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.lakehouse.table import LakeTable

BASE_TS = datetime.datetime(2024, 1, 1)
DDL = ("change_lsn long, op string, url string, warc_ts timestamp, "
       "html binary, lang string, schema_epoch int")

EXPECT = {
    "lang_known": "lang IN ('en','de','fr','pt','es')",
    "ts_sane": "warc_ts >= TIMESTAMP'2020-01-01 00:00:00'",
}


def _ev(lsn, url, lang="en", ts=None):
    return (lsn, "insert", url, ts or BASE_TS,
            b"<html><body>x</body></html>", lang, 1)


def _rows(spark, rows):
    return spark.createDataFrame(rows, DDL)


def test_drop_counts_and_rejects(spark, tmp_path):
    p = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4,
                    expectations=dict(EXPECT))
    batch = _rows(spark, [
        _ev(1, "https://a/1"),
        _ev(2, "https://a/2", lang="zz"),                     # lang violation
        _ev(3, "https://a/3", ts=datetime.datetime(1999, 1, 1)),  # ts violation
        _ev(4, "https://a/4", lang=None),                     # null -> violation
        _ev(5, "https://a/5", lang="xx",
            ts=datetime.datetime(1998, 1, 1)),                # violates BOTH
    ])
    lin = p.apply_batch(spark, batch, batch_id=1)
    assert lin["expectations"] == {"lang_known": 3, "ts_sane": 2}
    assert lin["rows_rejected"] == 4  # distinct rows, not sum of breakdown
    t = LakeTable.load(spark, p.table_path)
    urls = sorted(r.url for r in t.read().collect())
    assert urls == ["https://a/1"]
    # the rejected rows' LSNs are DECIDED: replaying the batch is a no-op
    lin2 = p.apply_batch(spark, batch, batch_id=1)
    assert lin2["skipped"] and "expectations" not in lin2 or (
        lin2.get("expectations", {"lang_known": 0})["lang_known"] == 0
    )
    assert sorted(r.url for r in t.read().collect()) == ["https://a/1"]


def test_all_rows_rejected_still_commits_the_decision(spark, tmp_path):
    p = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4,
                    expectations=dict(EXPECT))
    batch = _rows(spark, [_ev(1, "https://a/1", lang="zz"),
                          _ev(2, "https://a/2", lang="xx")])
    lin = p.apply_batch(spark, batch, batch_id=1)
    assert lin["rows_rejected"] == 2 and not lin["skipped"]
    t = LakeTable.load(spark, p.table_path)
    assert t.read().count() == 0
    # decided: redelivery skips
    lin2 = p.apply_batch(spark, batch, batch_id=1)
    assert lin2["skipped"]


def test_fail_mode_raises_before_any_commit(spark, tmp_path):
    p = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4,
                    expectations=dict(EXPECT), on_violation="fail")
    v_good = _rows(spark, [_ev(1, "https://a/1")])
    p.apply_batch(spark, v_good, batch_id=1)
    t = LakeTable.load(spark, p.table_path)
    v_before = t.version
    bad = _rows(spark, [_ev(2, "https://a/2", lang="zz")])
    with pytest.raises(ValueError, match="expectation violations"):
        p.apply_batch(spark, bad, batch_id=2)
    t.refresh()
    assert t.version == v_before  # nothing committed
    # fixing upstream and re-sending the SAME LSN applies cleanly
    fixed = _rows(spark, [_ev(2, "https://a/2", lang="en")])
    p.apply_batch(spark, fixed, batch_id=2)
    t.refresh()
    assert sorted(r.url for r in t.read().collect()) == [
        "https://a/1", "https://a/2"
    ]


def test_expectations_through_the_stream(spark, tmp_path):
    import pandas as pd

    ev_dir = tmp_path / "events"
    ev_dir.mkdir()
    rows = [_ev(i, f"https://s/{i}", lang="zz" if i % 3 == 0 else "en")
            for i in range(1, 31)]
    for i, lo in enumerate(range(0, 30, 10)):
        pdf = pd.DataFrame(rows[lo:lo + 10], columns=[
            "change_lsn", "op", "url", "warc_ts", "html", "lang",
            "schema_epoch",
        ])
        pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
        pdf["schema_epoch"] = pdf["schema_epoch"].astype("int32")
        pdf.to_parquet(str(ev_dir / f"events-{i:05d}.parquet"))
    p = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4,
                    expectations={"lang_known": EXPECT["lang_known"]})
    lineages = p.run_stream(spark, str(ev_dir), str(tmp_path / "ck"))
    assert sum(l.get("rows_rejected", 0) for l in lineages) == 10
    t = LakeTable.load(spark, p.table_path)
    langs = {r.lang for r in t.read().collect()}
    assert langs == {"en"} and t.read().count() == 20


def test_violations_quarantine_export(spark, tmp_path):
    """violations_dir: violating fresh rows export (with the _violated
    name array) before the merge; clean batches write nothing; replays
    write nothing (rows no longer fresh); the table stays exactly-once."""
    import os

    q = str(tmp_path / "quarantine")
    p = CdcPipeline(table_path=str(tmp_path / "t"), n_buckets=4,
                    expectations=dict(EXPECT), violations_dir=q)
    batch = _rows(spark, [
        _ev(1, "https://a/1"),
        _ev(2, "https://a/2", lang="zz"),
        _ev(3, "https://a/3", lang="xx",
            ts=datetime.datetime(1998, 1, 1)),  # violates BOTH
    ])
    lin = p.apply_batch(spark, batch, batch_id=7)
    assert lin["rows_rejected"] == 2
    assert lin["violations_path"] == os.path.join(q, "batch=7")
    exported = spark.read.parquet(lin["violations_path"])
    got = {r["url"]: sorted(r["_violated"]) for r in exported.collect()}
    assert got == {
        "https://a/2": ["lang_known"],
        "https://a/3": ["lang_known", "ts_sane"],
    }
    # replay: rows are stale now -> no re-export, lineage has no path
    lin2 = p.apply_batch(spark, batch, batch_id=7)
    assert "violations_path" not in lin2
    # clean batch: no extra job, no directory
    clean = _rows(spark, [_ev(10, "https://a/10")])
    lin3 = p.apply_batch(spark, clean, batch_id=8)
    assert "violations_path" not in lin3
    assert not os.path.exists(os.path.join(q, "batch=8"))
    t = LakeTable.load(spark, p.table_path)
    assert sorted(r.url for r in t.read().collect()) == [
        "https://a/1", "https://a/10"
    ]
