"""Clustered compaction: compact(sort_by=..., max_rows_per_file=...) sorts
rows within each bucket into bounded runs so zone maps get tight — the
OPTIMIZE/ZORDER-lite composition of compact() and stats_cols. Results must
be byte-identical to an unsorted compaction; the win is measurable as file
pruning that was impossible before."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from migration_pair_spark.lakehouse.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)

BASE = datetime.datetime(2024, 1, 1)


def _make(spark, path, n_buckets=2):
    return LakeTable.create(
        spark, path, SCHEMA, key_col="key", n_buckets=n_buckets,
        stats_cols=("ts", "v"), lww_order=("ts", "_lsn"),
    )


def _commit(spark, t, vals, lsn):
    rows = [
        {
            "key": f"k{v}",
            "ts": BASE + datetime.timedelta(minutes=v),
            "v": v,
            "_lsn": lsn,
            "_deleted": False,
        }
        for v in vals
    ]
    df = spark.createDataFrame(rows, t._physical_schema(1)).withColumn(
        "_bucket", t.bucket_expr()
    )
    t.append_buckets(df)


def _entries(t):
    return [e for fs in t.manifest["buckets"].values() for e in fs]


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_clustered_compaction_tightens_zones(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    # interleaved commits: every file spans nearly the FULL v range, so a
    # narrow window can prune nothing before clustering
    n = 300
    for i in range(3):
        # scrambled insert order: every writer task sees values from across
        # the whole range, so every pre-compaction file zone is wide
        vals = sorted(range(i, n, 3), key=lambda v: (v * 37) % 101)
        _commit(spark, t, vals, lsn=i + 1)
    before = _rows(t)
    entries_before = _entries(t)
    kept_before, _ = t.prune_entries(entries_before, "v", 10, 20)
    frac_before = len(kept_before) / len(entries_before)

    t.compact(sort_by=["v"], max_rows_per_file=40)
    assert _rows(t) == before  # clustering never changes results
    entries = _entries(t)
    # bounded runs: several files per bucket, each a narrow v slice
    assert len(entries) > t.n_buckets
    kept, skipped = t.prune_entries(entries, "v", 10, 20)
    frac_after = len(kept) / len(entries)
    # the narrow window now reads a small fraction of the files, and a
    # strictly smaller fraction than before clustering
    assert skipped >= len(entries) // 2
    assert frac_after < frac_before
    got = sorted(tuple(r) for r in t.read_range("v", 10, 20).collect())
    want = sorted(
        tuple(r) for r in t.read().filter(F.col("v").between(10, 20)).collect()
    )
    assert got == want and len(got) == 11
    # time-window pruning works too (ts is monotone in v)
    w0 = BASE + datetime.timedelta(minutes=50)
    w1 = BASE + datetime.timedelta(minutes=70)
    _, skipped_ts = t.prune_entries(entries, "ts", w0, w1)
    assert skipped_ts > 0


def test_unsorted_compaction_unchanged(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    for i in range(3):
        _commit(spark, t, range(i, 90, 3), lsn=i + 1)
    before = _rows(t)
    t.compact()
    assert _rows(t) == before
    # default shape: one file per bucket
    assert all(len(fs) == 1 for fs in t.manifest["buckets"].values() if fs)


def test_mor_resolution_then_clustering(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    base_rows = [
        {"key": f"k{v}", "ts": BASE + datetime.timedelta(minutes=v), "v": v}
        for v in range(60)
    ]
    t.append_bucketed(spark.createDataFrame(base_rows, SCHEMA))
    # deltas: every 5th key gets a newer value out of its old zone
    upd = [
        {
            "key": f"k{v}",
            "ts": BASE + datetime.timedelta(days=1),
            "v": v + 1000,
            "_lsn": 2,
            "_deleted": False,
        }
        for v in range(0, 60, 5)
    ]
    d = spark.createDataFrame(upd, t._physical_schema(1)).withColumn(
        "_bucket", t.bucket_expr()
    )
    touched = sorted(
        r["_bucket"] for r in d.select("_bucket").distinct().collect()
    )
    t.append_delta_buckets(d, touched)
    want = _rows(t)  # resolved view before compaction
    t.compact(sort_by=["v"], max_rows_per_file=20)
    assert not t.is_merge_on_read
    assert _rows(t) == want
    got = sorted(
        tuple(r) for r in t.read_range("v", 1000, 2000).collect()
    )
    assert len(got) == 12 and all(r[2] >= 1000 for r in got)
