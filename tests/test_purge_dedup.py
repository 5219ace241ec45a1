"""Right-to-be-forgotten THROUGH the dedup family: a url purged from the
pages table also leaves the CDC-swept chunk corpus (purge_source /
purge --chunk-index), which stores the swept row versions' full text.

Contract: the sweep stamps each corpus doc with its source url (src_key);
purge_source erases every swept version's text and deduped_text by one
bloom-pruned non-key rewrite (LakeTable.purge_matching), refuses while the
index lags the corpus (a purge hole would heal an index missing committed
keys), and leaves the chunk INDEX untouched — it holds only md5
fingerprints, so erased spans stay deduplicated rather than re-admitted."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.cdc.runner import CdcPipeline
from migration_pair_spark.lakehouse.table import PURGE_EPOCH_PROP, LakeTable
from migration_pair_spark.operators.cdc_dedup import sweep_into_chunk_index
from migration_pair_spark.operators.incremental import IncrementalChunkIndex

BASE_TS = datetime.datetime(2024, 1, 1)

P1 = "alpha bravo charlie delta echo foxtrot golf hotel"
P2 = "india juliet kilo lima mike november oscar papa"
P3 = "quebec romeo sierra tango uniform victor whiskey xray"
P4 = "yankee zulu one two three four five six"

DDL = ("change_lsn long, op string, url string, warc_ts timestamp, "
       "html binary, lang string, schema_epoch int")

UA, UB = "https://a.example/", "https://b.example/"


def _html(*paras):
    return ("<html><body>" + "".join(f"<p>{p}</p>" for p in paras)
            + "</body></html>").encode()


def _ev(lsn, op, url, *paras):
    return (lsn, op, url, BASE_TS + datetime.timedelta(seconds=lsn),
            _html(*paras) if paras else None, "en", 1)


@pytest.fixture()
def swept(spark, tmp_path):
    """Pages pipeline + chunk index with two swept batches: A (P1+P2, then
    re-crawled with P4 appended) and B (P1+P3)."""
    pipe = CdcPipeline(table_path=str(tmp_path / "pages"), n_buckets=4,
                       stats_cols=("_lsn",))
    pipe.apply_batch(spark, spark.createDataFrame(
        [_ev(1, "insert", UA, P1, P2), _ev(2, "insert", UB, P1, P3)], DDL),
        batch_id=1)
    pages = LakeTable.load(spark, pipe.table_path)
    ix = IncrementalChunkIndex.create(spark, str(tmp_path / "ix"),
                                      corpus_buckets=4, index_buckets=4)
    sweep_into_chunk_index(pages, ix)
    pipe.apply_batch(spark, spark.createDataFrame(
        [_ev(3, "update", UA, P1, P2, P4)], DDL), batch_id=2)
    pages.refresh()
    sweep_into_chunk_index(pages, ix)
    return pipe, pages, ix


def test_purge_source_erases_all_swept_versions(spark, swept):
    pipe, pages, ix = swept
    corpus_before = {r["doc_id"]: r for r in ix.corpus.read().collect()}
    assert {r["src_key"] for r in corpus_before.values()} == {UA, UB}
    n_files = sum(len(fs) for fs in ix.corpus.manifest["buckets"].values())
    index_rows = ix.index.read().count()

    v = ix.purge_source([UA])
    ix.corpus.refresh()
    assert v == ix.corpus.version
    left = {r["doc_id"]: r for r in ix.corpus.read().collect()}
    # both swept versions of A (doc ids 1 and 3) erased, B intact verbatim
    assert set(left) == {2}
    assert left[2]["deduped_text"] == P3 and left[2]["src_key"] == UB
    # the src_key blooms pruned the rewrite below the full file count
    lin = ix.corpus.lineage
    assert lin["col"] == "src_key" and 1 <= lin["files_rewritten"] < n_files
    # the index is untouched (fingerprints only, no content) ...
    assert ix.index.read().count() == index_rows
    # ... so a verbatim re-submission of the erased spans stays deduplicated
    out = ix.ingest(
        spark.createDataFrame([(100, f"{P1} {P2}")], "doc_id long, text string"),
        "resubmit")
    row = out["rewritten"].collect()[0]
    assert row["n_kept"] == 0
    # a non-key purge arms NO suppression machinery on the corpus
    assert PURGE_EPOCH_PROP not in ix.corpus.properties
    assert ix.corpus.suppressed_keys() is None


def test_purge_source_refuses_while_index_lags(spark, swept, monkeypatch):
    pipe, pages, ix = swept

    # wedge a corpus-committed / index-missing batch (crash before the
    # index append)
    def boom(self, *a, **k):
        raise RuntimeError("crash before index append")

    monkeypatch.setattr(IncrementalChunkIndex, "_append_index", boom)
    with pytest.raises(RuntimeError, match="crash before index append"):
        ix.ingest(spark.createDataFrame(
            [(50, P4)], "doc_id long, text string"), "wedge")
    monkeypatch.undo()
    assert ix.pending_ranges()
    with pytest.raises(ValueError, match="index lags the corpus"):
        ix.purge_source([UA])
    # any ingest heals, then the purge proceeds
    ix.ingest(spark.createDataFrame(
        [(60, P2)], "doc_id long, text string"), "heal")
    assert not ix.pending_ranges()
    ix.purge_source([UA])
    assert UA not in {r["src_key"] for r in ix.corpus.read().collect()}


def test_pages_and_corpus_purge_compose(spark, swept):
    pipe, pages, ix = swept
    # the full story: purge the url from the PAGES table (ledger +
    # suppression + masked export) AND from the swept corpus
    pipe.purge(spark, [UA])
    ix.purge_source([UA])
    pages.refresh()
    assert [r.url for r in pages.read().select("url").collect()] == [UB]
    assert {r["src_key"] for r in ix.corpus.read().collect()} == {UB}
    # a re-crawl of the purged url is suppressed at the CDC gate, so the
    # NEXT sweep has nothing to re-admit
    lin = pipe.apply_batch(spark, spark.createDataFrame(
        [_ev(9, "update", UA, P1)], DDL), batch_id=9)
    assert lin["rows_suppressed"] == 1
    pages.refresh()
    res = sweep_into_chunk_index(pages, ix)
    assert res.get("empty") or res["n_new"] == 0
    assert UA not in {r["src_key"] for r in ix.corpus.read().collect()}


def test_purge_matching_nonkey_generic(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        __import__("pyspark.sql.types", fromlist=["StructType"]).StructType()
        .add("id", "long", False).add("grp", "string", True)
        .add("payload", "string", True),
        key_col="id", n_buckets=4,
    )
    rows = spark.createDataFrame(
        [(i, "evil" if i % 3 == 0 else "ok", f"p{i}") for i in range(30)],
        "id long, grp string, payload string")
    t.append_bucketed(rows)
    v0 = t.version
    t.purge_matching("grp", ["evil"])
    assert t.version == v0 + 1
    left = sorted(r.id for r in t.read().collect())
    assert left == [i for i in range(30) if i % 3 != 0]
    # non-key purge: no epoch bump, no ledger
    assert PURGE_EPOCH_PROP not in t.properties
    assert t.suppressed_keys() is None
    with pytest.raises(ValueError, match="unknown column"):
        t.purge_matching("nope", ["x"])
