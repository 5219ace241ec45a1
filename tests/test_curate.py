"""Corpus curation composition: the keep-set must equal an independent
pandas recomputation (exact dedup -> near-dup clusters -> gates), and the
CLI subcommand must write split-partitioned output with honest stats."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.operators.curate import curate_corpus, write_curated

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, BASE, "en"),
        (2, BASE, "en"),                        # exact dup of 1 -> dropped
        (3, BASE.replace("dog", "hound"), "en"),  # near-dup of 1 -> dropped
        (4, "completely different text about databases and storage engines "
            "with enough words to pass any sane quality gate easily", "en"),
        (5, "x" * 40, "en"),                     # one giant token, low quality
        (6, BASE + " bonjour le monde cette phrase est en francais vraiment", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_keep_set_matches_model(spark, docs):
    out = curate_corpus(docs, min_quality=0.2, neardup_threshold=0.5)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    # 1 keeps (min id of exact+near cluster {1,2,3}); 4 keeps; 5 fails
    # quality; 6 is a near-dup CANDIDATE of 1 but below 0.5 jaccard? ->
    # recompute instead of guessing: the model below is the ground truth.
    import pandas as pd

    pdf = docs.toPandas()
    # exact dedup
    pdf = pdf.loc[pdf.groupby(pdf["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()))["doc_id"].transform("min") == pdf["doc_id"]]
    # quality gate BEFORE clustering (curate_corpus stage order: rejected
    # docs never enter the near-dup stage, so keepers are chosen among
    # gate-passers)
    from migration_pair_spark.functions.textstats import quality_score

    q = {
        r.doc_id: r.q
        for r in docs.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    }
    pdf = pdf.loc[pdf["doc_id"].map(lambda i: q[i] >= 0.2)]

    def sh(t):
        return {t[i : i + 5] for i in range(max(len(t) - 4, 1))}

    ids = sorted(pdf["doc_id"])
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    # all-pairs exact jaccard >= 0.5 -> union-find min label
    keeper = {i: i for i in ids}

    def find(i):
        while keeper[i] != i:
            i = keeper[i]
        return i

    for a in ids:
        for b in ids:
            if a < b:
                sa, sb = sh(texts[a]), sh(texts[b])
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.5:
                    ra, rb = find(a), find(b)
                    lo, hi = min(ra, rb), max(ra, rb)
                    keeper[hi] = lo
    model_kept = {i for i in ids if find(i) == i}
    got_rows = {r.doc_id: r for r in out.collect()}
    assert set(got_rows) == model_kept
    # annotations present and typed
    any_row = next(iter(got_rows.values()))
    assert any_row.split in ("train", "val", "test")
    assert any_row.n_tokens > 0 and 0.0 <= any_row.quality <= 1.0


def test_curate_lang_gate(spark, docs):
    out = curate_corpus(docs, langs=("en",))
    assert {r.pred_lang for r in out.collect()} == {"en"}


def test_write_curated_partitions_and_stats(spark, docs, tmp_path):
    out_dir = str(tmp_path / "corpus")
    curated = curate_corpus(docs, min_quality=0.2)
    stats = write_curated(curated, out_dir)
    # split directories exist and stats add up to the curated count
    n = curated.count()
    assert sum(s["n_docs"] for s in stats.values()) == n
    on_disk = spark.read.parquet(out_dir)
    assert on_disk.count() == n
    assert set(stats) <= {"train", "val", "test"}


def test_curate_cli_roundtrip(spark, docs, tmp_path, capsys):
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out_dir = str(tmp_path / "out")
    from migration_pair_spark.__main__ import main

    rc = main(["curate", "--docs", src, "--out", out_dir, "--min-quality", "0.2"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["out"] == out_dir
    assert sum(s["n_docs"] for s in payload["splits"].values()) >= 1
    assert os.path.isdir(out_dir)


def test_curate_with_benchmark_decontamination(spark, docs):
    """A benchmark doc quoting BASE must knock the BASE cluster's keeper
    out of the curated corpus (decontamination runs before near-dup, so
    the contaminated docs never reach shingling); unrelated docs keep."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    base_kept = {
        r.doc_id
        for r in curate_corpus(docs, min_quality=0.2).select("doc_id").collect()
    }
    assert 1 in base_kept and 4 in base_kept
    decon = {
        r.doc_id
        for r in curate_corpus(docs, min_quality=0.2, benchmark=bench)
        .select("doc_id")
        .collect()
    }
    # every BASE-quoting doc (1, 2, 3, 6 share >= 2 word-3-grams with the
    # benchmark) is gone; the unrelated doc survives
    assert 4 in decon
    assert decon & {1, 2, 3, 6} == set()


def test_curate_chunk_dedup_stage_rewrites_spans(spark):
    rows = [
        (1, "a b c d e f", "en"),
        (2, "a b c d e f", "en"),      # exact dup of 1 -> dropped at stage 1
        (3, "a b c q r s t u v", "en"),  # span "a b c" repeats doc 1 -> stripped
        (4, "d e f a b c", "en"),      # every chunk seen in doc 1 -> vanishes
        (5, "zebra yak xenon wolf viper unicorn", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = curate_corpus(docs, min_quality=0.0, neardup_threshold=0.5, chunk_dedup_w=3)
    got = {r.doc_id: r.text for r in out.select("doc_id", "text").collect()}

    # exact-dup doc 2 and fully-span-duplicated doc 4 are gone; doc 3 keeps
    # only its novel spans; survivors' texts are the rewritten ones.
    assert set(got) == {1, 3, 5}
    assert got[1] == "a b c d e f"
    assert got[3] == "q r s t u v"
    assert got[5] == "zebra yak xenon wolf viper unicorn"


def test_curate_chunk_dedup_default_off_is_unchanged(spark, docs):
    base = {r.doc_id for r in curate_corpus(docs, min_quality=0.2).select("doc_id").collect()}
    # chunk_dedup_w=None must be byte-for-byte the old pipeline
    same = {r.doc_id for r in curate_corpus(docs, min_quality=0.2, chunk_dedup_w=None).select("doc_id").collect()}
    assert base == same


def test_curate_chunk_dedup_keeps_first_empty_text_doc(spark):
    # an empty-text doc duplicates nothing: its single '' chunk is globally
    # first, so the span stage must not delete it (review-caught: the old
    # deduped_text != '' filter did). A SECOND empty doc IS a full
    # duplicate of the first and drops.
    rows = [(1, "real words in here", "en"), (2, "", "en"), (3, "", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = curate_corpus(docs, min_quality=0.0, neardup_threshold=0.99, chunk_dedup_w=3)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 2}
