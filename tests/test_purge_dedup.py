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


def test_lsh_deduper_purge_docs_erases_text_and_signatures(spark, tmp_path):
    from migration_pair_spark.operators.incremental import IncrementalDeduper

    anchor = ("alpha99 bravo99 charlie99 delta99 echo99 foxtrot99 golf99 "
              "hotel99 india99 juliet99")
    d = IncrementalDeduper.create(spark, str(tmp_path / "d"),
                                  corpus_buckets=4, index_buckets=4,
                                  threshold=0.5)
    d.ingest(spark.createDataFrame(
        [(0, anchor), (1, "unrelated base document about mountain weather")],
        "doc_id long, text string"), "base")
    # a near-dup of doc 0 is rejected while doc 0 exists
    r = d.ingest(spark.createDataFrame(
        [(10, anchor + " tail99")], "doc_id long, text string"), "b1")
    assert {(x["doc_id"], x["keeper_doc_id"])
            for x in r["keepers"].collect()} == {(10, 0)}

    # erase the WHOLE near-dup cluster (0 and its rejected twin 10) — a
    # surviving member's text/signatures would otherwise still match
    out = d.purge_docs([0, 10])
    d.corpus.refresh(); d.index.refresh()
    assert out["corpus_version"] == d.corpus.version
    # text gone from the corpus, signature rows gone from the index
    assert sorted(x.doc_id for x in d.corpus.read().collect()) == [1]
    assert d.index.read().filter("doc_id IN (0, 10)").count() == 0
    # no dead-weight suppression state on the gated corpus
    assert d.corpus.suppressed_keys() is None
    # recall contract: a NEW near-dup of the erased cluster is ADMITTED
    r2 = d.ingest(spark.createDataFrame(
        [(20, anchor + " other99")], "doc_id long, text string"), "b2")
    k2 = {(x["doc_id"], x["keeper_doc_id"]) for x in r2["keepers"].collect()}
    assert k2 == {(20, 20)}
    # replay of an already-applied batch is still an exactly-once no-op
    assert d.ingest(spark.createDataFrame(
        [(10, anchor + " tail99")], "doc_id long, text string"),
        "b1")["replayed"]


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
