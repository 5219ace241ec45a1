"""The reference's EndToEnd shape generalized (SURVEY.md §3.3): load an
initial snapshot of the pages table (reference: full table copy), then tail
an incremental change stream on top. Final state must be the LWW merge of
base rows (treated as lsn=0 at their warc_ts) and stream winners."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from migration_pair_spark import synth
from migration_pair_spark.cdc.runner import CdcPipeline, PAGES_SCHEMA
from migration_pair_spark.functions.extract import with_extracted_text
from migration_pair_spark.lakehouse.table import LakeTable

N_URLS, N_EVENTS = 120, 500


def test_snapshot_then_incremental(spark, tmp_path):
    pages = synth.make_pages(N_URLS, seed=3)
    events = synth.make_change_events(N_EVENTS, N_URLS, seed=4)

    pipe = CdcPipeline(table_path=str(tmp_path / "pages"), n_buckets=8)
    table = pipe.ensure_table(spark)

    # initial snapshot load (reference Insertion/EndToEnd bulk path), with
    # the engine's extraction applied at load time
    base = with_extracted_text(spark.createDataFrame(pages, PAGES_SCHEMA))
    table.append_bucketed(base)
    assert table.read().count() == N_URLS

    # incremental tail on top
    lineage = pipe.apply_batch(spark, spark.createDataFrame(events))
    assert not lineage["skipped"]

    # oracle: per url, the stream winner if (warc_ts, lsn) beats the base row
    # (base rows predate the stream by construction), else the base row;
    # url absent iff the stream winner is a delete.
    win = synth.oracle_final_state(events).set_index("url")
    changed = set(events["url"])
    expect = {}
    for r in pages.itertuples():
        if r.url in changed:
            if r.url in win.index:
                w = win.loc[r.url]
                expect[r.url] = ("stream", w.warc_ts)
            else:
                continue  # deleted by the stream
        else:
            expect[r.url] = ("base", r.warc_ts)

    t = LakeTable.load(spark, pipe.table_path)
    got = {r.url: r.warc_ts for r in t.read().collect()}
    assert set(got) == set(expect)
    for url, (_, ts) in expect.items():
        assert got[url] == ts.to_pydatetime(), url

    # base rows untouched by the stream kept their extracted text
    kept = [u for u, (src, _) in expect.items() if src == "base"]
    texts = {
        r.url: r.text
        for r in t.read().filter(F.col("url").isin(kept[:5])).collect()
    }
    assert all(tx is not None and len(tx) > 0 for tx in texts.values())
