"""CDC -> dedup bridge (operators/cdc_dedup.py): sweeping a pages table's
new row versions (by _lsn zone maps) into the incremental chunk index.

The story under test: a crawled page is re-crawled with one new paragraph;
the sweep ingests ONLY the new row version, and chunk dedup admits ONLY
the novel paragraph's spans into the corpus. Sweeps are idempotent, the
watermark is derived from the index's own gate state (no side bookkeeping),
and the sweep scan prunes files by _lsn zone."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.functions.extract import extract_text
from migration_pair_spark.lakehouse.table import LakeTable
from migration_pair_spark.operators.cdc_dedup import (
    sweep_into_chunk_index,
    sweep_watermark,
)
from migration_pair_spark.operators.incremental import IncrementalChunkIndex

BASE_TS = datetime.datetime(2024, 1, 1)

# four 8-word paragraphs == one chunk each at w=8, all chunk-aligned
P1 = "alpha bravo charlie delta echo foxtrot golf hotel"
P2 = "india juliet kilo lima mike november oscar papa"
P3 = "quebec romeo sierra tango uniform victor whiskey xray"
P4 = "yankee zulu one two three four five six"

DDL = ("change_lsn long, op string, url string, warc_ts timestamp, "
       "html binary, lang string, schema_epoch int")


def _html(*paras: str) -> bytes:
    return ("<html><body>" + "".join(f"<p>{p}</p>" for p in paras)
            + "</body></html>").encode()


def _ev(lsn, op, url, *paras):
    return (lsn, op, url, BASE_TS + datetime.timedelta(seconds=lsn),
            _html(*paras) if paras else None, "en", 1)


@pytest.fixture()
def pipe(spark, tmp_path):
    p = CdcPipeline(table_path=str(tmp_path / "pages"), n_buckets=4,
                    stats_cols=("_lsn",))
    return p


def test_sweep_admits_only_novel_spans(spark, tmp_path, pipe):
    # batch 1: page A = P1+P2, page B = P1+P3 (P1 shared boilerplate)
    b1 = spark.createDataFrame(
        [_ev(1, "insert", "https://a.example/", P1, P2),
         _ev(2, "insert", "https://b.example/", P1, P3)], DDL)
    pipe.apply_batch(spark, b1, batch_id=1)
    pages = LakeTable.load(spark, pipe.table_path)
    ix = IncrementalChunkIndex.create(spark, str(tmp_path / "ix"),
                                      corpus_buckets=4, index_buckets=4)
    res1 = sweep_into_chunk_index(pages, ix)
    assert res1["n_new"] == 2 and res1["sweep_from_lsn"] == 1
    corpus = {r["doc_id"]: r for r in ix.corpus.read().collect()}
    # doc 2 (page B): P1's chunk deduped away, P3 kept
    assert corpus[2]["deduped_text"] == P3
    assert (corpus[2]["n_chunks"], corpus[2]["n_kept"]) == (2, 1)
    # doc 1 (page A) arrived first: everything kept
    assert corpus[1]["deduped_text"] == f"{P1} {P2}"

    # immediate re-sweep: nothing new
    res = sweep_into_chunk_index(pages, ix)
    assert res.get("empty") or res.get("replayed")
    assert sweep_watermark(ix) == 2

    # batch 2: page A re-crawled with ONE new paragraph appended
    b2 = spark.createDataFrame(
        [_ev(3, "update", "https://a.example/", P1, P2, P4)], DDL)
    pipe.apply_batch(spark, b2, batch_id=2)
    pages.refresh()
    res2 = sweep_into_chunk_index(pages, ix)
    assert res2["n_new"] == 1 and res2["sweep_from_lsn"] == 3
    corpus = {r["doc_id"]: r for r in ix.corpus.read().collect()}
    # the re-crawl contributed ONLY its novel paragraph
    assert corpus[3]["deduped_text"] == P4
    assert (corpus[3]["n_chunks"], corpus[3]["n_kept"]) == (3, 1)
    # text column sanity: the swept text is the extracted page text
    assert corpus[3]["text"] == extract_text(_html(P1, P2, P4))

    # watermark derived from the gate; deletes are never swept
    b3 = spark.createDataFrame(
        [_ev(4, "delete", "https://b.example/")], DDL)
    pipe.apply_batch(spark, b3, batch_id=3)
    pages.refresh()
    res3 = sweep_into_chunk_index(pages, ix)
    assert res3.get("empty")
    assert sweep_watermark(ix) == 3  # delete contributed nothing


def test_sweep_scan_prunes_by_lsn_zone(spark, tmp_path, pipe):
    # 3 streamed commits -> per-commit file zones; after sweeping them all,
    # a 4th tiny commit touches one bucket — the next sweep's pruning must
    # skip every file whose zone predates it
    rows = [_ev(i, "insert", f"https://s{i % 7}.example/p/{i}", P1, f"w{i} " * 8)
            for i in range(1, 61)]
    for lo in (0, 20, 40):
        pipe.apply_batch(
            spark, spark.createDataFrame(rows[lo:lo + 20], DDL),
            batch_id=lo,
        )
    pages = LakeTable.load(spark, pipe.table_path)
    ix = IncrementalChunkIndex.create(spark, str(tmp_path / "ix"),
                                      corpus_buckets=4, index_buckets=4)
    res = sweep_into_chunk_index(pages, ix)
    assert res["n_new"] == 60
    wm = sweep_watermark(ix)
    pipe.apply_batch(
        spark,
        spark.createDataFrame([_ev(99, "update", "https://s1.example/p/1",
                                   P1, "novel words appear here now ok yes done")],
                              DDL),
        batch_id=99,
    )
    pages.refresh()
    entries = [e for fs in pages.manifest["buckets"].values() for e in fs]
    kept, skipped = pages.prune_entries(entries, "_lsn", lo=wm + 1)
    assert skipped > 0 and len(kept) < len(entries)
    res = sweep_into_chunk_index(pages, ix)
    assert res["n_new"] == 1
    corpus = {r["doc_id"]: r for r in ix.corpus.read().collect()}
    # the re-crawl's P1 deduped; its novel sentence kept
    assert corpus[99]["n_kept"] == 1 and "novel" in corpus[99]["deduped_text"]


def test_crash_between_corpus_and_index_heals_on_next_sweep(
    spark, tmp_path, pipe, monkeypatch
):
    b1 = spark.createDataFrame(
        [_ev(1, "insert", "https://a.example/", P1, P2)], DDL)
    pipe.apply_batch(spark, b1, batch_id=1)
    pages = LakeTable.load(spark, pipe.table_path)
    ix = IncrementalChunkIndex.create(spark, str(tmp_path / "ix"),
                                      corpus_buckets=4, index_buckets=4)
    # crash injection: corpus commit lands, index append dies
    orig = IncrementalChunkIndex._append_index
    monkeypatch.setattr(
        IncrementalChunkIndex, "_append_index",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(RuntimeError, match="boom"):
        sweep_into_chunk_index(pages, ix)
    monkeypatch.setattr(IncrementalChunkIndex, "_append_index", orig)

    # second batch; next sweep must heal the index for batch 1 AND ingest 2
    b2 = spark.createDataFrame(
        [_ev(2, "insert", "https://b.example/", P1, P3)], DDL)
    pipe.apply_batch(spark, b2, batch_id=2)
    pages.refresh()
    res = sweep_into_chunk_index(pages, ix)
    assert res["n_new"] == 1
    corpus = {r["doc_id"]: r for r in ix.corpus.read().collect()}
    assert set(corpus) == {1, 2}
    # healed index made doc 1's chunks visible, so doc 2's P1 deduped
    assert corpus[2]["deduped_text"] == P3


def test_seeded_index_does_not_inflate_watermark(spark, tmp_path, pipe):
    """Snapshot seeding (caller-chosen doc ids BELOW the LSN space) must
    not move the sweep watermark: the old interval-derived watermark
    treated seed ids as swept LSNs and silently skipped every change row
    at or below them (review-caught). The watermark now lives in the
    sweep.lsn corpus property, committed atomically with each sweep."""
    b1 = spark.createDataFrame(
        [_ev(1, "insert", "https://a.example/", P1, P2),
         _ev(2, "insert", "https://b.example/", P1, P3)], DDL)
    pipe.apply_batch(spark, b1, batch_id=1)
    pages = LakeTable.load(spark, pipe.table_path)
    ix = IncrementalChunkIndex.create(spark, str(tmp_path / "ix"),
                                      corpus_buckets=4, index_buckets=4)
    seed = spark.createDataFrame([(-10, P1)], "doc_id long, text string")
    ix.ingest(seed, "seed")
    assert sweep_watermark(ix) == 0  # the seed moved NOTHING
    res = sweep_into_chunk_index(pages, ix)
    assert res["n_new"] == 2 and res["sweep_from_lsn"] == 1
    assert sweep_watermark(ix) == 2
    corpus = {r["doc_id"]: r for r in ix.corpus.read().collect()}
    # both pages' P1 chunk dedupes against the SEED document
    assert corpus[1]["deduped_text"] == P2
    assert corpus[2]["deduped_text"] == P3


def test_seed_ids_colliding_with_lsn_space_fail_loudly(spark, tmp_path, pipe):
    """A seed whose ids land inside the WAL's LSN space now breaks the
    first sweep LOUDLY at the monotone gate (previously: silent skip of
    every change row at or below the seed ids)."""
    b1 = spark.createDataFrame(
        [_ev(1, "insert", "https://a.example/", P1, P2)], DDL)
    pipe.apply_batch(spark, b1, batch_id=1)
    pages = LakeTable.load(spark, pipe.table_path)
    ix = IncrementalChunkIndex.create(spark, str(tmp_path / "ix"),
                                      corpus_buckets=4, index_buckets=4)
    seed = spark.createDataFrame([(500, P4)], "doc_id long, text string")
    ix.ingest(seed, "bad-seed")
    assert sweep_watermark(ix) == 0  # property authoritative, still 0
    with pytest.raises(ValueError, match="monotone"):
        sweep_into_chunk_index(pages, ix)
