"""Changelog -> Debezium export (sources/debezium.py export side): the
engine as a change PRODUCER.

Contract: export_changelog_debezium materializes a snapshot-diff span as
ONE JSONL envelope file (one file == one LSN-contiguous chunk — the same
delivery contract the change sources consume), with update pairs collapsed
into single 'u' envelopes carrying both images and deterministic
per-envelope LSNs (lsn_base = v_to << 24 + rank(key), monotone across
spans). A second engine instance streaming the export directory REPLICATES
the table: state(B) == state(A at the exported version), span after span,
including deletes, update churn, and text re-extraction from the shipped
html. Idempotent per span (re-export of an existing span is a no-op).
"""

from __future__ import annotations

import json
import os

import pytest

from migration_pair_spark import synth
from migration_pair_spark.cdc.runner import CdcPipeline, pages_wire_payload_schema
from migration_pair_spark.lakehouse.table import LakeTable
from migration_pair_spark.sources.debezium import export_changelog_debezium


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(repr(r[c]) for c in cols) for r in df.collect()),
    )


def test_debezium_replica_converges_span_by_span(spark, tmp_path):
    # source pipeline A: two stream phases over the same url population
    # (updates + deletes churn within and across phases)
    ev = str(tmp_path / "events")
    synth.write_change_stream(ev, 600, 80, 3, seed=21)
    a = CdcPipeline(table_path=str(tmp_path / "A"), n_buckets=4)
    a.run_stream(spark, ev, str(tmp_path / "ckA"))
    ta = LakeTable.load(spark, a.table_path)
    v0 = ta.snapshot_versions()[0]  # creation snapshot: empty table
    v1 = ta.version

    out = str(tmp_path / "feed")
    f1 = export_changelog_debezium(
        ta, out, v_from=v0, v_to=v1,
        payload_schema=pages_wire_payload_schema(),
    )
    assert f1 and os.path.basename(f1) == f"span-{v0:08d}-{v1:08d}.jsonl"
    # idempotent per span
    assert export_changelog_debezium(
        ta, out, v_from=v0, v_to=v1,
        payload_schema=pages_wire_payload_schema(),
    ) is None

    # replica B consumes the export as a debezium-json change stream
    b = CdcPipeline(table_path=str(tmp_path / "B"), n_buckets=8,
                    source_format="debezium-json")
    b.run_stream(spark, out, str(tmp_path / "ckB"))
    tb = LakeTable.load(spark, b.table_path)
    assert _rows(tb.read()) == _rows(ta.read())

    # phase 2: more churn into A (updates win LWW via later warc_ts/lsn)
    ev2 = str(tmp_path / "events2")
    full2 = synth.make_change_events(300, 80, seed=22)
    full2["change_lsn"] = full2["change_lsn"] + 600
    # us precision: pandas' default ns INT64 is unreadable as Spark timestamp
    full2["warc_ts"] = full2["warc_ts"].astype("datetime64[us]")
    os.makedirs(ev2)
    full2.to_parquet(os.path.join(ev2, "events-00000.parquet"), index=False)
    a.run_stream(spark, ev2, str(tmp_path / "ckA2"))
    ta.refresh()
    v2 = ta.version
    assert v2 > v1
    f2 = export_changelog_debezium(
        ta, out, v_from=v1, v_to=v2,
        payload_schema=pages_wire_payload_schema(),
    )
    assert f2 is not None

    # B picks up ONLY the new span file through its existing checkpoint
    b.run_stream(spark, out, str(tmp_path / "ckB"))
    tb.refresh()
    assert _rows(tb.read()) == _rows(ta.read())

    # the second span's envelopes collapse update churn: one envelope per
    # changed key, ops limited to c/u/d, LSNs unique and above span 1's
    with open(f2) as fh:
        envs = [json.loads(line) for line in fh]
    assert envs and all(e["op"] in ("c", "u", "d") for e in envs)
    # to_json drops null fields: "c" has no before key, "d" no after key
    keys = [(e.get("after") or e.get("before"))["url"] for e in envs]
    assert len(keys) == len(set(keys))
    lsns = [e["source"]["lsn"] for e in envs]
    assert len(lsns) == len(set(lsns)) and min(lsns) > (v1 << 24)
    assert all(
        e.get("before") and e.get("after") for e in envs if e["op"] == "u"
    )


def test_export_guards(spark, tmp_path):
    ev = str(tmp_path / "events")
    synth.write_change_stream(ev, 100, 20, 2, seed=5)
    a = CdcPipeline(table_path=str(tmp_path / "A"), n_buckets=4)
    a.run_stream(spark, ev, str(tmp_path / "ck"))
    ta = LakeTable.load(spark, a.table_path)
    with pytest.raises(ValueError, match="advance"):
        export_changelog_debezium(ta, str(tmp_path / "o"), v_from=ta.version)
