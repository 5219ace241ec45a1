"""CSV snapshot round-trip parity tests (reference Extraction/Insertion,
SURVEY.md §2 O5-O8): epoch-millis timestamps, quote doubling, permissive
import with per-column coercion, and the opt-in empty->0 quirk."""

from __future__ import annotations

import datetime as dt
import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from migration_pair_spark.sources.csv_snapshot import (
    export_snapshot,
    import_snapshot,
    roundtrip_schema_check,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), True),
    ]
)

ROWS = [
    ('https://a/1?q="x"', dt.datetime(2024, 1, 1, 12, 0, 0), b"<p>hi</p>", 5, True),
    ("https://a/2, with comma", dt.datetime(2024, 6, 1), None, None, False),
    (None, None, b"\x00\xff", -3, None),
    # embedded newlines: extracted text is multi-line; the round trip must
    # keep one logical record (multiLine read)
    ("line1\nline2\nline3", dt.datetime(2024, 3, 1), b"x", 7, True),
]


@pytest.fixture()
def csv_dir(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = str(tmp_path / "snap")
    export_snapshot(df, out)
    return out


def test_roundtrip_values_and_schema(spark, csv_dir):
    back = import_snapshot(spark, csv_dir, SCHEMA)
    src = spark.createDataFrame(ROWS, SCHEMA)
    assert roundtrip_schema_check(src, back)
    got = sorted(
        [tuple(r) for r in back.collect()], key=lambda r: (r[0] is None, str(r[0]))
    )
    want = sorted(
        [tuple(r) for r in src.collect()], key=lambda r: (r[0] is None, str(r[0]))
    )
    # binary compares via bytes(); timestamps survive epoch-millis round trip
    assert [
        (r[0], r[1], bytes(r[2]) if r[2] is not None else None, r[3], r[4])
        for r in got
    ] == [
        (r[0], r[1], bytes(r[2]) if r[2] is not None else None, r[3], r[4])
        for r in want
    ]


def test_export_writes_epoch_millis_and_quotes(spark, csv_dir):
    # raw file inspection: timestamps are epoch millis, quotes are doubled
    raw = "\n".join(
        open(p).read() for p in glob.glob(f"{csv_dir}/*.csv")
    )
    assert "1704110400000" in raw  # 2024-01-01T12:00:00Z in ms
    assert '"https://a/1?q=""x""",' in raw  # RFC-4180 doubling
    assert '"https://a/2, with comma"' in raw  # comma field quoted


def test_malformed_cells_null_not_crash(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("url,warc_ts,html,n,ok\nu1,not_a_ts,ZZ,abc,maybe\n")
    back = import_snapshot(spark, str(p), SCHEMA)
    r = back.collect()[0]
    assert r.url == "u1"
    assert r.warc_ts is None and r.n is None and r.ok is None


def test_empty_numeric_as_zero_quirk(spark, tmp_path):
    # the reference's CLR Convert semantics: empty numeric field -> 0
    # (/root/reference/Converters/DynamicTypeConverter.cs:10)
    p = tmp_path / "quirk"
    p.mkdir()
    (p / "part.csv").write_text('url,warc_ts,html,n,ok\nu1,,,"",true\n')
    strict = import_snapshot(spark, str(p), SCHEMA).collect()[0]
    assert strict.n is None
    quirky = import_snapshot(
        spark, str(p), SCHEMA, empty_numeric_as_zero=True
    ).collect()[0]
    assert quirky.n == 0
