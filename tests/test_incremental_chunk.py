"""Incremental chunk-level (span) dedup against the persisted chunk-key
index (operators/incremental.py IncrementalChunkIndex): sequential-vs-batch
EXACT equivalence (no frozen-label caveat — exact matching has no bridges),
one-row-per-distinct-chunk index growth, crash-retry idempotence, monotone
and unique-id gates, and O(1) applied-interval manifest state.

Chunk width 3 keeps fixtures readable; dd.chunk_dedup over the union of all
ingested batches is the ground truth for every equivalence assertion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.operators import dedup as dd
from migration_pair_spark.operators.incremental import IncrementalChunkIndex

W = 3

BASE = [
    (0, "a b c d e f"),                  # chunks: "a b c", "d e f"
    (1, "p q r s t u"),                  # chunks: "p q r", "s t u"
]
BATCH1 = [
    (10, "a b c x y z"),                 # "a b c" repeats doc 0 -> stripped
    (11, "d e f a b c"),                 # both chunks seen -> fully deduped
    (12, "m n o m n o"),                 # within-batch repeat: keeps one
]
BATCH2 = [
    (20, "x y z p q r new1 new2 new3"),  # "x y z" seen in b1, "p q r" in base
    (21, "totally fresh words here now six"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rw(df):
    return {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["deduped_text"])
        for r in df.collect()
    }


def _batch_truth(spark, *row_lists):
    rows = [r for rl in row_lists for r in rl]
    return _rw(dd.chunk_dedup(_df(spark, rows), w=W))


@pytest.fixture()
def idx(spark, tmp_path):
    return IncrementalChunkIndex.create(
        spark, str(tmp_path / "chunkidx"), corpus_buckets=4, index_buckets=4, w=W
    )


def test_sequential_equals_batch(spark, idx):
    r0 = idx.ingest(_df(spark, BASE), "base")
    r1 = idx.ingest(_df(spark, BATCH1), "b1")
    r2 = idx.ingest(_df(spark, BATCH2), "b2")
    truth = _batch_truth(spark, BASE, BATCH1, BATCH2)

    # each ingest's rewritten rows match the batch run restricted to it
    assert _rw(r0["rewritten"]) == {k: truth[k] for k in (0, 1)}
    assert _rw(r1["rewritten"]) == {k: truth[k] for k in (10, 11, 12)}
    assert _rw(r2["rewritten"]) == {k: truth[k] for k in (20, 21)}
    # and the persisted corpus holds the full batch-equivalent state
    assert _rw(idx.rewritten()) == truth
    # hand-checked spot values: the interesting rows
    assert truth[10] == (2, 1, "x y z")
    assert truth[11] == (2, 0, "")
    assert truth[12] == (2, 1, "m n o")
    assert truth[20] == (3, 1, "new1 new2 new3")


def test_index_holds_one_row_per_distinct_chunk(spark, idx):
    idx.ingest(_df(spark, BASE), "base")
    idx.ingest(_df(spark, BATCH1), "b1")
    idx.ingest(_df(spark, BATCH2), "b2")
    rows = idx.index.read().select("ck", "first_occ").collect()
    cks = [r["ck"] for r in rows]
    assert len(cks) == len(set(cks))  # set semantics: no ck appended twice
    # vocabulary check against an independent recompute over the union
    union = _df(spark, BASE + BATCH1 + BATCH2)
    expect = {
        r["ck"]
        for r in dd.chunk_rows(union, w=W).select("ck").distinct().collect()
    }
    assert set(cks) == expect
    # first_occ is the global minimum occurrence of each chunk value
    occ = {
        r["ck"]: r["mo"]
        for r in dd.chunk_rows(union, w=W)
        .groupBy("ck")
        .agg(F.min("occ").alias("mo"))
        .collect()
    }
    assert {r["ck"]: r["first_occ"] for r in rows} == occ


def test_replay_is_idempotent(spark, idx):
    idx.ingest(_df(spark, BASE), "base")
    r = idx.ingest(_df(spark, BATCH1), "b1")
    cv, iv = idx.corpus.version, idx.index.version
    again = idx.ingest(_df(spark, BATCH1), "b1-redelivered")
    assert again["replayed"] is True and again["rewritten"] is None
    assert (idx.corpus.version, idx.index.version) == (cv, iv)
    assert _rw(idx.rewritten()) == _batch_truth(spark, BASE, BATCH1)
    assert r["n_new"] == 3


def test_monotone_and_unique_gates(spark, idx):
    idx.ingest(_df(spark, BASE), "base")
    # a batch STRADDLING the watermark (lo <= seen_max < hi) is neither a
    # replay nor legal new work; a fully-covered batch is a replay no-op
    # (gap absorption), tested separately
    with pytest.raises(ValueError, match="monotone"):
        idx.ingest(_df(spark, [(1, "overlapping id"), (30, "fresh id")]), "bad")
    with pytest.raises(ValueError, match="unique"):
        idx.ingest(_df(spark, [(30, "dup id"), (30, "dup id twice")]), "bad2")


def test_empty_batch_is_a_clean_noop(spark, idx):
    idx.ingest(_df(spark, BASE), "base")
    cv, iv = idx.corpus.version, idx.index.version
    empty = _df(spark, []).filter(F.lit(False))
    r = idx.ingest(empty, "quiet-day")
    assert r["empty"] is True and r["n_new"] == 0
    assert (idx.corpus.version, idx.index.version) == (cv, iv)


def test_crash_between_commits_heals_on_retry(spark, tmp_path):
    crashed = IncrementalChunkIndex.create(
        spark, str(tmp_path / "crashed"), corpus_buckets=4, index_buckets=4, w=W
    )
    crashed.ingest(_df(spark, BASE), "base")
    boom = RuntimeError("injected crash before index append")
    orig = crashed._append_index
    crashed._append_index = lambda *a, **k: (_ for _ in ()).throw(boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        crashed.ingest(_df(spark, BATCH1), "b1")
    crashed._append_index = orig
    assert crashed.pending_ranges() == [(2, 12)]  # gap-absorbed interval

    res = crashed.ingest(_df(spark, BATCH1), "b1")
    assert res["replayed"] is True and res["healed"] == "index"
    assert crashed.pending_ranges() == []

    clean = IncrementalChunkIndex.create(
        spark, str(tmp_path / "clean"), corpus_buckets=4, index_buckets=4, w=W
    )
    clean.ingest(_df(spark, BASE), "base")
    clean.ingest(_df(spark, BATCH1), "b1")

    def index_rows(d):
        return {
            (r["ck"], r["first_occ"]) for r in d.index.read().collect()
        }

    assert index_rows(crashed) == index_rows(clean)
    assert _rw(crashed.rewritten()) == _rw(clean.rewritten())
    # a further batch behaves identically on the healed instance
    rh = crashed.ingest(_df(spark, BATCH2), "b2")
    rc = clean.ingest(_df(spark, BATCH2), "b2")
    assert _rw(rh["rewritten"]) == _rw(rc["rewritten"])


def test_new_batch_heals_older_pending_batch_first(spark, idx):
    """A batch ingested while an older batch's index append is pending must
    heal the index BEFORE probing — otherwise b1's chunks would be invisible
    and a b2 span duplicating b1 would be accepted (never retractable)."""
    idx.ingest(_df(spark, BASE), "base")
    boom = RuntimeError("injected")
    orig = idx._append_index
    idx._append_index = lambda *a, **k: (_ for _ in ()).throw(boom)
    with pytest.raises(RuntimeError):
        idx.ingest(_df(spark, BATCH1), "b1")
    idx._append_index = orig
    # BATCH2's doc 20 starts with "x y z" — first seen in pending BATCH1
    r2 = idx.ingest(_df(spark, BATCH2), "b2")
    assert idx.pending_ranges() == []
    truth = _batch_truth(spark, BASE, BATCH1, BATCH2)
    assert _rw(r2["rewritten"]) == {k: truth[k] for k in (20, 21)}
    assert _rw(idx.rewritten()) == truth


def test_applied_state_stays_one_interval(spark, idx):
    import json

    idx.ingest(_df(spark, BASE), "base")
    for i in range(5):
        lo = 100 + i * 10
        idx.ingest(
            _df(spark, [(lo, f"wave {i} unique alpha"), (lo + 1, f"wave {i} unique beta")]),
            f"w{i}",
        )
    for table in (idx.corpus, idx.index):
        applied = json.loads(table.properties["dedup.applied"])
        assert len(applied) == 1  # gap-absorbed: O(1) manifest state


def test_streaming_chunk_ingest_equals_batch(spark, tmp_path):
    """run_dedup_stream is duck-typed over `.ingest(df, batch_id)` — the
    chunk index plugs into the same foreachBatch composition unchanged.
    Drain three ordered files and compare against the batch ground truth;
    then redeliver the whole directory with a FRESH checkpoint and assert
    every batch replays as a no-op."""
    import os

    import pandas as pd

    from migration_pair_spark.streaming.dedup_stream import run_dedup_stream

    files = [BASE, BATCH1, BATCH2]
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(files):
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        ).to_parquet(os.path.join(d, f"docs-{i:05d}.parquet"), index=False)

    ix = IncrementalChunkIndex.create(
        spark, str(tmp_path / "cidx"), corpus_buckets=4, index_buckets=4, w=W
    )
    results = run_dedup_stream(spark, ix, d, str(tmp_path / "ckpt"))
    assert len(results) == 3 and all(not r.get("replayed") for r in results)
    assert _rw(ix.rewritten()) == _batch_truth(spark, BASE, BATCH1, BATCH2)

    again = run_dedup_stream(spark, ix, d, str(tmp_path / "ckpt2"))
    assert all(r.get("replayed") for r in again)
    assert _rw(ix.rewritten()) == _batch_truth(spark, BASE, BATCH1, BATCH2)


def test_null_text_doc_survives_ingest_and_replay(spark, idx):
    """A NULL-text doc yields no chunks, but it must still land in the
    corpus under the applied range — an inner corpus join dropped it
    forever while the gate replayed its redelivery as a no-op
    (review-caught, reproduced)."""
    idx.ingest(_df(spark, BASE), "base")
    batch = spark.createDataFrame(
        [(10, "a b c x y z"), (11, None), (12, "fresh words arrive here now")],
        "doc_id long, text string",
    )
    r = idx.ingest(batch, "b1")
    assert r["n_new"] == 3
    rows = {
        x["doc_id"]: x
        for x in idx.corpus.read().filter(F.col("doc_id") >= 10).collect()
    }
    assert set(rows) == {10, 11, 12}  # the null-text doc is IN the corpus
    assert rows[11]["text"] is None and rows[11]["n_chunks"] is None
    assert rows[10]["deduped_text"] == "x y z"
    # redelivery stays a no-op with the doc present
    again = idx.ingest(batch, "b1-again")
    assert again["replayed"] is True
    assert idx.corpus.read().filter(F.col("doc_id") == 11).count() == 1


def test_probe_fast_path_matches_join_path(spark, tmp_path):
    """The index probe's small-batch pushed-IN path (keys collected, scan
    filtered ``ck IN (...)`` so parquet-mr skips row groups via the ck
    bloom filters) produces exactly the bucket-scan join path's state.
    The cap's overflow branch (limit(N+1) came back full) must fall back
    to the join."""
    a = IncrementalChunkIndex.create(
        spark, str(tmp_path / "a"), corpus_buckets=4, index_buckets=4, w=W
    )
    b = IncrementalChunkIndex.create(
        spark, str(tmp_path / "b"), corpus_buckets=4, index_buckets=4, w=W
    )
    b.probe_isin_max_keys = 1  # every batch overflows the cap -> join path
    for batch, bid in ((BASE, "base"), (BATCH1, "b1"), (BATCH2, "b2")):
        a.ingest(_df(spark, batch), bid)
        b.ingest(_df(spark, batch), bid)
    assert a.last_probe_mode == "isin"
    assert b.last_probe_mode == "join"
    truth = _batch_truth(spark, BASE, BATCH1, BATCH2)
    assert _rw(a.rewritten()) == truth
    assert _rw(b.rewritten()) == truth
    # the index's ck column carries parquet blooms (the skip machinery the
    # fast path leans on)
    assert a.index.manifest.get("bloom_cols") == ["ck"]


def test_tokenizer_identity_guard(spark, tmp_path):
    """Persisted chunk keys embed the tokenizer: loading an index stamped
    with a different (or missing) tokenizer id must fail loudly — the
    keys would silently never match and every seen span would re-admit
    (review-caught after the ws-v2 tokenizer change shipped unguarded)."""
    root = str(tmp_path / "ix")
    ix = IncrementalChunkIndex.create(
        spark, root, corpus_buckets=4, index_buckets=4, w=W
    )
    assert ix.corpus.properties["chunk.tokenizer"]  # stamped at create
    m = ix.corpus._next_manifest()
    m["properties"]["chunk.tokenizer"] = "space-v1"
    ix.corpus._write_manifest(m)
    with pytest.raises(ValueError, match="tokenizer"):
        IncrementalChunkIndex(spark, root)
    # missing stamp (pre-guard index) is also refused, with guidance
    ix.corpus.refresh()
    m2 = ix.corpus._next_manifest()
    m2["properties"].pop("chunk.tokenizer", None)
    ix.corpus._write_manifest(m2)
    with pytest.raises(ValueError, match="pre-stamping"):
        IncrementalChunkIndex(spark, root)
