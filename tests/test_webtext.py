"""Webtext URL canonicalization + PII scrubbing (functions/webtext.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from migration_pair_spark.functions import webtext as wt


def _one(spark, url: str, expr_fn):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(expr_fn(F.col("u")).alias("x")).collect()[0]["x"]


CANON_CASES = [
    # default ports drop; non-default kept
    ("http://Example.COM:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),  # not https default
    # userinfo stripped, scheme case folded
    ("HTTPS://user:pw@Host.Example/x", "https://host.example/x"),
    # empty path -> "/", fragment dropped
    ("http://example.com", "http://example.com/"),
    ("http://example.com#frag", "http://example.com/"),
    ("http://example.com/p#frag", "http://example.com/p"),
    # a '?' INSIDE the fragment is fragment content, not a query — an
    # unanchored query regex leaked it into the canonical key
    # (review-caught): these two are the SAME page
    ("http://example.com/p#sec?x=1", "http://example.com/p"),
    ("http://example.com/p?a=1#sec?x=2", "http://example.com/p?a=1"),
    # tracking params dropped, remainder sorted; "?" omitted when empty
    ("http://e.com/p?utm_source=x&b=2&a=1", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?UTM_Campaign=x", "http://e.com/p"),
    ("http://e.com/p?gclid=1&fbclid=2&ref=3", "http://e.com/p"),
    ("http://e.com/p?z=1&y=2", "http://e.com/p?y=2&z=1"),
    # path case preserved (paths are case-sensitive)
    ("http://e.com/CaseSensitive/Path", "http://e.com/CaseSensitive/Path"),
    # garbage -> NULL
    ("not a url", None),
    ("mailto:x@y.z", None),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "u string")
    got = [
        r["c"]
        for r in df.select(wt.canonical_url(F.col("u")).alias("c")).collect()
    ]
    assert got == [want for _, want in CANON_CASES]


def test_canonical_is_idempotent(spark):
    urls = [u for u, want in CANON_CASES if want is not None]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(wt.canonical_url(F.col("u")).alias("c"))
    twice = once.select(wt.canonical_url(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


def test_registrable_domain(spark):
    cases = [
        ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("a.b.c.example.com", "example.com"),
        ("blog.site.co.uk", "site.co.uk"),
        ("site.co.uk", "site.co.uk"),
        ("co.uk", "co.uk"),  # bare suffix: two labels pass through
        ("localhost", "localhost"),
        ("news.shop.com.au", "shop.com.au"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [
        r["d"]
        for r in df.select(wt.registrable_domain(F.col("h")).alias("d")).collect()
    ]
    assert got == [want for _, want in cases]


def test_scrub_pii_and_counts(spark):
    text = (
        "Mail alice.smith+x@sub.mail.example, backup bob@b.co. "
        "Server 10.0.255.7 and 192.168.1.200, call +49 30 123456 now. "
        "Not an IP: 999.1.1.1 stays (no octet > 255 matches whole)."
    )
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        wt.scrub_pii(F.col("t")).alias("s"), wt.pii_counts(F.col("t")).alias("c")
    ).collect()[0]
    s, c = row["s"], row["c"]
    assert "<EMAIL>" in s and "alice" not in s and "bob@" not in s
    assert s.count("<IP>") == 2 and "10.0.255.7" not in s
    assert "<PHONE>" in s and "+49 30 123456" not in s
    # 999.1.1.1: the leading 999 can never match a full dotted quad at \b
    assert "999.1.1.1" in s
    assert (c["n_emails"], c["n_ipv4"], c["n_phones"]) == (2, 2, 1)


def test_email_scrubbed_before_ip_and_host_not_nibbled(spark):
    # an email whose domain looks numeric must scrub as ONE email token,
    # not leave a half-eaten address for the IP pass
    text = "x 1.2.3.4@4.3.2.1.example y"
    df = spark.createDataFrame([(text,)], "t string")
    s = df.select(wt.scrub_pii(F.col("t")).alias("s")).collect()[0]["s"]
    assert s == "x <EMAIL> y"


def test_webtext_queries_have_no_python_stage(spark):
    from migration_pair_spark.queries import REGISTRY

    for name in ("url_canonicalize_docs", "domain_rollup_docs", "pii_scrub_docs"):
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        jvm = df.sparkSession._jvm
        plan = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, name
    # the two row-wise queries are shuffle-free
    for name in ("url_canonicalize_docs", "pii_scrub_docs"):
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        jvm = df.sparkSession._jvm
        plan = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "Exchange" not in plan, name


def test_cdc_canonicalize_key_collapses_url_variants(spark, tmp_path):
    """CdcPipeline(canonicalize_key=True) must produce the SAME final state
    as running the default pipeline on pre-canonicalized events — and URL
    variants of one page collapse into one LWW key."""
    import datetime

    from migration_pair_spark.cdc.runner import CdcPipeline
    from migration_pair_spark.lakehouse.table import LakeTable

    base_ts = datetime.datetime(2024, 1, 1)
    variants = [
        "HTTP://E.com:80/p?b=2&a=1",
        "http://e.com/p?a=1&b=2",
        "http://e.com/p?utm_source=z&a=1&b=2#frag",
    ]
    canon = "http://e.com/p?a=1&b=2"
    rows = [
        (i + 1, "update", variants[i % 3],
         base_ts + datetime.timedelta(seconds=i),
         f"<html><body>rev {i}</body></html>".encode(), "en", 1)
        for i in range(6)
    ] + [
        (7, "insert", "not a url", base_ts,
         b"<html><body>junk</body></html>", "zz", 1),
        (8, "insert", "https://other.example/q", base_ts,
         b"<html><body>other</body></html>", "en", 1),
    ]
    ddl = ("change_lsn long, op string, url string, warc_ts timestamp, "
           "html binary, lang string, schema_epoch int")
    raw = spark.createDataFrame(rows, ddl)
    pre = [(r[0], r[1], canon if r[2] in variants else r[2], *r[3:]) for r in rows]
    pre_df = spark.createDataFrame(pre, ddl)

    pa = CdcPipeline(table_path=str(tmp_path / "a"), n_buckets=4,
                     canonicalize_key=True)
    pa.apply_batch(spark, raw)
    pb = CdcPipeline(table_path=str(tmp_path / "b"), n_buckets=4)
    pb.apply_batch(spark, pre_df)

    sa = sorted(tuple(r) for r in LakeTable.load(spark, pa.table_path).read().collect())
    sb = sorted(tuple(r) for r in LakeTable.load(spark, pb.table_path).read().collect())
    assert sa == sb
    urls = [r[0] for r in sa]
    assert urls.count(canon) == 1          # variants collapsed, latest won
    assert "not a url" in urls             # garbage key kept raw, not null
    winner = [r for r in sa if r[0] == canon][0]
    assert b"rev 5" in bytes(winner[2])
