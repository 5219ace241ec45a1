"""Streaming dedup ingestion (streaming/dedup_stream.py): a documents
stream drained through IncrementalDeduper inside foreachBatch equals the
batch ground truth; kill/restart resumes exactly-once; duplicate delivery
(fresh checkpoint) converges to the identical corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.operators import dedup as dd
from migration_pair_spark.operators.incremental import IncrementalDeduper
from migration_pair_spark.streaming.dedup_stream import run_dedup_stream

BANDS = tuple((i,) for i in range(8))
THR = 0.4

_P = " ".join(f"word{i:03d} token{i:03d}" for i in range(15))

FILES = [
    [(0, _P), (1, "unique file-zero text about archival weather ledgers")],
    [(10, _P + " tail00 tail01"), (11, "fresh file-one doc on kelp forests")],
    [(20, "fresh file-two doc about meteor showers and dust"),
     (21, "fresh file-two doc about meteor showers and dust")],  # exact dups
]


@pytest.fixture()
def docs_dir(spark, tmp_path):
    """Flat ordered parquet FILES (not directories), like synth's change
    stream — the file source lists them lexically, matching id order."""
    import pandas as pd

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(FILES):
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        ).to_parquet(os.path.join(d, f"docs-{i:05d}.parquet"), index=False)
    return d


def _keepers(ded):
    return {r["doc_id"]: r["keeper_doc_id"] for r in ded.keepers().collect()}


def _ground_truth(spark):
    rows = [r for f in FILES for r in f]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.shingles(docs).localCheckpoint()
    sig = dd.minhash_signatures(docs, shingles_df=sh)
    cand = dd.lsh_candidate_pairs(sig, bands=BANDS)
    ver = dd.jaccard_verify(docs, cand, shingles_df=sh, threshold=THR)
    return {
        r["doc_id"]: r["keeper_doc_id"]
        for r in dd.dedup_clusters(docs, ver).collect()
    }


def test_stream_equals_batch_ground_truth(spark, tmp_path, docs_dir):
    ded = IncrementalDeduper.create(
        spark, str(tmp_path / "ded"), threshold=THR, bands=BANDS
    )
    results = run_dedup_stream(
        spark, ded, docs_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    assert len(results) == 3
    assert all(not r.get("replayed") for r in results)
    assert _keepers(ded) == _ground_truth(spark)
    # near-dup across files caught (10 ~ 0), exact dup within file (21 -> 20)
    k = _keepers(ded)
    assert k[10] == 0 and k[21] == 20


def test_kill_restart_resumes_exactly_once(spark, tmp_path, docs_dir):
    ded = IncrementalDeduper.create(
        spark, str(tmp_path / "ded"), threshold=THR, bands=BANDS
    )
    ckpt = str(tmp_path / "ckpt")

    def bomb(batch_id, stats):
        if batch_id >= 1:
            raise RuntimeError("injected mid-stream kill")

    with pytest.raises(Exception, match="injected mid-stream kill"):
        run_dedup_stream(spark, ded, docs_dir, ckpt, 1, on_batch=bomb)

    results = run_dedup_stream(spark, ded, docs_dir, ckpt, 1)
    # batch 1 was ingested before the kill fired -> redelivery replays it
    assert any(r.get("replayed") for r in results)
    assert _keepers(ded) == _ground_truth(spark)


def test_duplicate_delivery_converges(spark, tmp_path, docs_dir):
    ded = IncrementalDeduper.create(
        spark, str(tmp_path / "ded"), threshold=THR, bands=BANDS
    )
    run_dedup_stream(spark, ded, docs_dir, str(tmp_path / "ckpt1"), 1)
    before = _keepers(ded)
    cv, iv = ded.corpus.version, ded.index.version
    # FRESH checkpoint: the whole directory is redelivered with the same
    # batch ids — every batch must replay as a no-op
    results = run_dedup_stream(spark, ded, docs_dir, str(tmp_path / "ckpt2"), 1)
    assert all(r.get("replayed") for r in results)
    assert _keepers(ded) == before
    assert (ded.corpus.version, ded.index.version) == (cv, iv)


def test_long_run_gate_state_stays_bounded(spark, tmp_path):
    """A months-long dedup-stream run must NOT grow manifest state with
    batch count (round 4 stored a JSON batch list plus one property per
    batch, forever). The applied-interval gate is structurally O(1) for
    monotone delivery — each commit extends ONE interval — so after many
    micro-batches the property set is identical in shape and the interval
    list has length 1. 60 direct ingests stand in for the >=200-batch
    stream: every batch exercises the same commit path, and the invariant
    asserted (one interval, fixed key set) is independent of batch count."""
    from migration_pair_spark.operators.incremental import applied_ranges

    ded = IncrementalDeduper.create(
        spark, str(tmp_path / "long"), threshold=THR, bands=BANDS
    )
    keys_after_warmup = None
    for b in range(60):
        rows = [
            (b * 10, f"micro batch {b} first document body"),
            (b * 10 + 1, f"micro batch {b} second document body"),
        ]
        ded.ingest(
            spark.createDataFrame(rows, "doc_id long, text string"),
            f"stream-{b}",
        )
        assert len(applied_ranges(ded.corpus)) == 1
        assert len(applied_ranges(ded.index)) == 1
        if b == 2:
            keys_after_warmup = set(ded.corpus.properties)
    assert set(ded.corpus.properties) == keys_after_warmup
    assert applied_ranges(ded.corpus) == [(0, 591)]
    assert applied_ranges(ded.index) == [(0, 591)]


def test_auto_compact_bounds_file_counts_with_equivalence(spark, tmp_path):
    """r6 maintenance optimization: a long micro-batched ingest loop grows
    one file per (batch x touched bucket) without bound — probe cost then
    tracks batch history. With auto-compaction at cap N, file counts stay
    bounded while keepers/pairs remain identical to an uncompacted run."""
    import os as _os

    import pandas as pd

    from migration_pair_spark.streaming.dedup_stream import run_dedup_stream

    n_batches, cap = 14, 3
    batches = [
        [
            (b * 10, f"micro batch {b} first document body text"),
            (b * 10 + 1, f"micro batch {b} second document body text"),
        ]
        for b in range(n_batches)
    ]
    docs = str(tmp_path / "docs")
    _os.makedirs(docs)
    for b, rows in enumerate(batches):
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        ).to_parquet(_os.path.join(docs, f"d-{b:05d}.parquet"), index=False)

    plain = IncrementalDeduper.create(
        spark, str(tmp_path / "plain"), threshold=THR, bands=BANDS,
        corpus_buckets=2, index_buckets=2,
    )
    run_dedup_stream(spark, plain, docs, str(tmp_path / "ck1"))
    compacted = IncrementalDeduper.create(
        spark, str(tmp_path / "compacted"), threshold=THR, bands=BANDS,
        corpus_buckets=2, index_buckets=2,
    )
    stats = run_dedup_stream(
        spark, compacted, docs, str(tmp_path / "ck2"),
        auto_compact_files_per_bucket=cap,
    )
    # maintenance actually fired, and file counts are bounded by the cap
    assert any("auto_compact" in s for s in stats)
    for t in (compacted.corpus, compacted.index):
        assert all(n <= cap for n in t.files_per_bucket().values()), (
            t.path, t.files_per_bucket(),
        )
    # the uncompacted twin HAS outgrown the cap (the test would otherwise
    # pass vacuously on a fixture too small to accumulate files)
    assert any(
        n > cap
        for t in (plain.corpus, plain.index)
        for n in t.files_per_bucket().values()
    )
    # equivalence: same keepers, same corpus rows
    assert _keepers(plain) == _keepers(compacted)
    a = sorted(map(tuple, plain.corpus.read().collect()))
    b = sorted(map(tuple, compacted.corpus.read().collect()))
    assert a == b


def test_dedup_stream_cli(spark, tmp_path, docs_dir, capsys):
    import json

    from migration_pair_spark.__main__ import main

    root = str(tmp_path / "ded-cli")
    assert main([
        "dedup-stream", "--root", root, "--docs", docs_dir,
        "--checkpoint", str(tmp_path / "ckpt-cli"),
        "--threshold", str(THR),
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["batches"] == 3
    total_new = sum(s["n_new"] for s in out["stats"])
    assert total_new == 6
