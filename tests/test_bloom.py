"""Parquet bloom filters: per-file key blooms written inline + file pruning.

Contract (lakehouse/table.py): tables created with ``bloom_filter_cols``
write parquet-native bloom filters for those columns in every data file
(all commit paths — the options ride _table_write). ``bloom_prune_entries``
/ ``lookup`` then prune FILES whose blooms prove a point predicate can
match no row — the data-skipping rung zone maps cannot reach on
hash-distributed keys (a uniform key's [min, max] spans the keyspace in
every file). Pruning is conservative: any doubt (no bloom, unsupported
physical type, read error) keeps the file; blooms have false positives but
no false negatives, so a pruned file is PROVABLY clean and semantics are
exactly ``read().filter(col == v)``.

Reference parity note: the reference (Mycenae) reads via full scans only
(/root/reference/Tasks/MigrationTask.cs:84-92); data skipping is part of
the engine's 100-TB lakehouse surface, mirroring Iceberg/Delta per-file
metadata skipping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from migration_pair_spark.lakehouse.table import LakeTable, RenameColumn

LONG_SCHEMA = T.StructType(
    [
        T.StructField("ck", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)

STR_SCHEMA = T.StructType(
    [
        T.StructField("u", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)

MIXED_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("u", T.StringType(), True),
    ]
)


def _commit(spark, t, rows, lsn):
    phys = t._physical_schema(t.manifest["schema_version"])
    df = (
        spark.createDataFrame(
            [{**r, "_lsn": lsn, "_deleted": False} for r in rows], phys
        )
        .coalesce(1)  # one file per commit: deterministic file<->key sets
        .withColumn("_bucket", t.bucket_expr())
    )
    t.append_buckets(df)


def _long_table(spark, path, n_commits=3, per_commit=300):
    """One bucket so every commit's file lands together; disjoint key sets
    per commit so blooms can discriminate between files."""
    t = LakeTable.create(
        spark,
        path,
        LONG_SCHEMA,
        key_col="ck",
        n_buckets=1,
        bloom_filter_cols=("ck",),
        bloom_ndv=1000,
    )
    for c in range(n_commits):
        lo = c * 1_000_000
        _commit(
            spark,
            t,
            [{"ck": lo + i, "v": c} for i in range(per_commit)],
            lsn=c + 1,
        )
    return t


def test_create_rejects_bad_bloom_cols(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown column"):
        LakeTable.create(
            spark, str(tmp_path / "a"), LONG_SCHEMA, key_col="ck",
            bloom_filter_cols=("nope",),
        )
    schema = T.StructType([T.StructField("f", T.DoubleType(), False)])
    with pytest.raises(ValueError, match="unsupported type"):
        LakeTable.create(
            spark, str(tmp_path / "b"), schema, key_col="f",
            bloom_filter_cols=("f",),
        )


def test_bloom_observable_and_sound(spark, tmp_table_dir):
    """The observable skip signal: a written file's bloom answers True for
    a planted key and False for an absent one (parquet-mr read via the
    running JVM — deterministic for fixed data)."""
    import os

    t = _long_table(spark, tmp_table_dir, n_commits=1)
    entry = t.manifest["buckets"]["0"][0]
    fp = os.path.join(t.path, entry["path"])
    assert t._bloom_might_contain(fp, "ck", 0) is True
    assert t._bloom_might_contain(fp, "ck", 42) is True
    assert t._bloom_might_contain(fp, "ck", 987_654_321) is False
    # unsupported / absent column -> no determination, never a prune
    assert t._bloom_might_contain(fp, "no_such_col", 0) is None


def test_bloom_prunes_sibling_files(spark, tmp_table_dir):
    """Three commits with disjoint key ranges in ONE bucket: a point
    predicate keeps the owning file and bloom-prunes the other two (zone
    maps could do this too here — the dedicated uniform-key case is
    test_bloom_prunes_where_zone_maps_cannot)."""
    t = _long_table(spark, tmp_table_dir, n_commits=3)
    entries = t.manifest["buckets"]["0"]
    assert len(entries) >= 3
    kept, skipped = t.bloom_prune_entries(entries, "ck", 1_000_005)
    assert skipped >= len(entries) - 1
    assert len(kept) >= 1
    # absent key: everything prunes (no false positive at this density —
    # deterministic: same data -> same blooms)
    kept2, _ = t.bloom_prune_entries(entries, "ck", 77_777_777)
    assert kept2 == []


def test_bloom_prunes_where_zone_maps_cannot(spark, tmp_table_dir):
    """Hash-distributed keys interleaved across commits: every file's
    [min, max] overlaps every probe, but blooms still prune."""
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        LONG_SCHEMA,
        key_col="ck",
        n_buckets=1,
        stats_cols=("ck",),
        bloom_filter_cols=("ck",),
        bloom_ndv=1000,
    )
    # commit c holds xxhash64-spread keys 3i + c: ranges fully interleave
    for c in range(3):
        rows = [{"ck": (3 * i + c) * 2_654_435_761 % (2**40), "v": c}
                for i in range(300)]
        _commit(spark, t, rows, lsn=c + 1)
    entries = t.manifest["buckets"]["0"]
    probe = 2_654_435_761 * 3 % (2**40)  # i=1, c=0 -> lives in commit 0 only
    z_kept, z_skipped = t.prune_entries(entries, "ck", probe, probe)
    assert z_skipped == 0  # zone maps prune nothing: ranges interleave
    b_kept, b_skipped = t.bloom_prune_entries(z_kept, "ck", probe)
    assert b_skipped >= len(entries) - 1


def test_lookup_semantics_with_blooms(spark, tmp_table_dir):
    """lookup() == read().filter(key == v) with blooms active, present and
    absent keys, across multiple buckets."""
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        LONG_SCHEMA,
        key_col="ck",
        n_buckets=4,
        bloom_filter_cols=("ck",),
        bloom_ndv=1000,
    )
    for c in range(2):
        _commit(
            spark, t,
            [{"ck": c * 10_000 + i, "v": c} for i in range(200)],
            lsn=c + 1,
        )
    assert [r.asDict() for r in t.lookup(10_005).collect()] == [
        {"ck": 10_005, "v": 1}
    ]
    assert t.lookup(555_555).count() == 0
    got = t.lookup(7)
    want = t.read().filter(F.col("ck") == 7)
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]


def test_bloom_string_keys(spark, tmp_table_dir):
    """BINARY (utf8) bloom path: string-keyed table, pruning + lookup."""
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        STR_SCHEMA,
        key_col="u",
        n_buckets=1,
        bloom_filter_cols=("u",),
        bloom_ndv=1000,
    )
    for c, host in enumerate(("a.example", "b.example")):
        _commit(
            spark, t,
            [{"u": f"https://{host}/{i}", "v": c} for i in range(200)],
            lsn=c + 1,
        )
    entries = t.manifest["buckets"]["0"]
    assert len(entries) == 2
    kept, skipped = t.bloom_prune_entries(entries, "u", "https://a.example/5")
    assert skipped == 1 and len(kept) == 1
    kept2, _ = t.bloom_prune_entries(entries, "u", "https://nowhere.example/5")
    assert kept2 == []
    # lookup end-to-end (bloom prune inside): right row, absent-key empty
    assert t.lookup("https://b.example/5").collect()[0]["v"] == 1
    assert t.lookup("https://nowhere.example/1").count() == 0


def test_bloom_rename_evolution(spark, tmp_table_dir):
    """Blooms written under write-time names keep pruning through a rename
    (mapped per entry like zone-map stats)."""
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        MIXED_SCHEMA,
        key_col="k",
        n_buckets=1,
        bloom_filter_cols=("u",),
        bloom_ndv=1000,
    )
    _commit(
        spark, t,
        [{"k": i, "u": f"https://a.example/{i}"} for i in range(200)],
        lsn=1,
    )
    t.evolve_schema([RenameColumn("u", "url")])
    _commit(
        spark, t,
        [{"k": 1000 + i, "url": f"https://b.example/{i}"} for i in range(200)],
        lsn=2,
    )
    entries = t.manifest["buckets"]["0"]
    assert len(entries) == 2
    # pre-rename value: prunes the post-rename file, keeps the old one
    kept, skipped = t.bloom_prune_entries(entries, "url", "https://a.example/5")
    assert skipped == 1 and len(kept) == 1
    # post-rename value: prunes the pre-rename file (name mapped backwards)
    kept2, skipped2 = t.bloom_prune_entries(entries, "url", "https://b.example/5")
    assert skipped2 == 1 and len(kept2) == 1


def test_in_list_pushdown_reaches_parquet(spark, tmp_table_dir):
    """The session raises parquet.pushdown.inFilterThreshold so large key
    IN-lists push to the scan (default falls back to a min..max range past
    10 values — useless on hashed keys). Pinned here because the chunk
    probe's small-batch path depends on it for bloom row-group skipping."""
    t = _long_table(spark, tmp_table_dir, n_commits=1)
    keys = [1_000_000 + i for i in range(64)]
    plan = (
        t.read()
        .filter(F.col("ck").isin(keys))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(ck" in plan


def test_cdc_pipeline_bloom_cols_and_lookup_cli(spark, tmp_path, capsys):
    """bloom_filter_cols threads through CdcPipeline to the pages table,
    and the lookup CLI surfaces the (bucket + zone + bloom)-pruned point
    read — the 'current text of url X' path."""
    from migration_pair_spark import synth
    from migration_pair_spark.__main__ import main
    from migration_pair_spark.cdc.runner import CdcPipeline

    ev = str(tmp_path / "events")
    synth.write_change_stream(ev, 300, 50, 3, seed=7)
    pipe = CdcPipeline(
        table_path=str(tmp_path / "t"), n_buckets=4, bloom_filter_cols=("url",)
    )
    pipe.run_stream(spark, ev, str(tmp_path / "ck"))
    t = LakeTable.load(spark, pipe.table_path)
    assert t.manifest["bloom_cols"] == ["url"]
    url = t.read().limit(1).collect()[0]["url"]
    assert t.lookup(url).count() == 1
    assert t.lookup("https://no.such.page/x").count() == 0
    assert main(["lookup", "--table-path", t.path, "--key", url]) == 0
    assert url in capsys.readouterr().out


def test_bloom_survives_compaction_and_mor(spark, tmp_table_dir):
    """Compaction rewrites files through the same _table_write, so the
    rewritten files carry blooms too; MOR delta appends likewise. lookup
    stays correct before and after the fold."""
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        LONG_SCHEMA,
        key_col="ck",
        n_buckets=2,
        bloom_filter_cols=("ck",),
        bloom_ndv=1000,
    )
    for c in range(3):
        _commit(
            spark, t,
            [{"ck": c * 1000 + i, "v": c} for i in range(150)],
            lsn=c + 1,
        )
    t.compact()
    import os

    entries = [e for fs in t.manifest["buckets"].values() for e in fs]
    assert entries
    for e in entries:
        fp = os.path.join(t.path, e["path"])
        # every compacted file still answers bloom queries (True for one
        # of its own keys is implied by prune keeping >= 1 file below)
        assert t._bloom_might_contain(fp, "ck", 999_999_999) is False
    kept, skipped = t.bloom_prune_entries(entries, "ck", 2005)
    assert len(kept) >= 1
    assert [r["v"] for r in t.lookup(2005).collect()] == [2]
    assert t.lookup(555_555).count() == 0
