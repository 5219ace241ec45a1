"""Text-extraction invariant tests (SURVEY.md §2.3 #3, BASELINE.json:15).

The extraction function must be a pure, deterministic bytes->str function —
the engine analog of the reference's deterministic row serialization
(/root/reference/Tasks/Extraction.cs:61-93). Golden hashes pin the output
byte-for-byte.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from migration_pair_spark.functions.extract import (
    extract_text,
    extract_text_series,
    extract_text_udf,
)

GOLDEN = [
    (
        b"<html><head><title>T1</title><script>var x=1;</script></head>"
        b"<body><h1>Hello</h1><p>world &amp; <b>friends</b></p></body></html>",
        "T1\nHello\nworld & friends",
    ),
    (b"<p>a  b\tc</p><p>d</p>", "a b c\nd"),
    (b"no tags at all", "no tags at all"),
    (b"<style>p{color:red}</style><div>styled</div>", "styled"),
    (b"<!-- hidden --><p>shown</p>", "shown"),
    (b"&lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;x &amp;amp;", '<tag> "q" \'s\' x &amp;'),
    ("café 中文".encode("utf-8"), "café 中文"),
    (b"", ""),
    # IE conditional comment wrapping a script whose body contains "-->":
    # the SEQUENTIAL removal passes strip the script first, then the comment.
    # (A fused alternation leaks "0){}" here — kept sequential on purpose.)
    (b"x<!--[if IE]><script>if(a-->0){}</script><![endif]-->y", "xy"),
]

# sha256 of the full golden corpus output, '\x00'-joined — any behavior change
# in the extraction kernel must consciously update this hash.
GOLDEN_CORPUS_SHA256 = hashlib.sha256(
    "\x00".join(t for _, t in GOLDEN).encode("utf-8")
).hexdigest()


def test_golden_cases():
    for html, want in GOLDEN:
        assert extract_text(html) == want, html


def test_corpus_hash_stable():
    got = hashlib.sha256(
        "\x00".join(extract_text(h) for h, _ in GOLDEN).encode("utf-8")
    ).hexdigest()
    assert got == GOLDEN_CORPUS_SHA256


def test_null_passthrough():
    assert extract_text(None) is None
    out = extract_text_series(pd.Series([None, b"<p>x</p>"], dtype=object))
    assert out.iloc[0] is None and out.iloc[1] == "x"


def test_vectorized_matches_scalar():
    s = pd.Series([h for h, _ in GOLDEN], dtype=object)
    out = extract_text_series(s)
    assert list(out) == [t for _, t in GOLDEN]


def test_udf_on_spark(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(GOLDEN)], "id int, html binary"
    )
    got = {
        r.id: r.text
        for r in df.withColumn("text", extract_text_udf(F.col("html"))).collect()
    }
    for i, (_, want) in enumerate(GOLDEN):
        assert got[i] == want


def test_invalid_utf8_is_deterministic():
    bad = b"<p>\xff\xfe broken</p>"
    assert extract_text(bad) == extract_text(bad)
    assert "broken" in extract_text(bad)
