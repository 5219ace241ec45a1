"""Property-based tests (hypothesis): the LWW engine against a pure-Python
model on arbitrary small event sets, and extraction invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from migration_pair_spark.cdc.lww import lww_dedup_agg
from migration_pair_spark.functions.extract import extract_text

# -- model-based LWW ---------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),            # url id (few keys -> collisions likely)
        st.integers(0, 3),            # warc_ts seconds (ties likely)
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=1,
    max_size=25,
)


def _model_lww(rows):
    """Reference model: per url keep max (warc_ts, lsn)."""
    best = {}
    for url, ts, lsn, op in rows:
        cur = best.get(url)
        if cur is None or (ts, lsn) > (cur[0], cur[1]):
            best[url] = (ts, lsn, op)
    return {u: (v[1], v[2]) for u, v in best.items()}


@settings(
    max_examples=12,
    deadline=None,
    # `spark` is session-scoped; hypothesis flags any function-scoped fixture
    # use conservatively, so the suppression stays documented here
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_lww_agg_matches_model(spark, events):
    rows = [
        (f"u{u}", dt.datetime(2024, 1, 1, 0, 0, ts), lsn + 1, op)
        for lsn, (u, ts, op) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, change_lsn long, op string"
    )
    got = {
        r.url: (r.change_lsn, r.op)
        for r in lww_dedup_agg(df).collect()
    }
    assert got == _model_lww(rows)


# -- extraction invariants ----------------------------------------------------

html_strategy = st.text(
    alphabet=st.sampled_from(list("abc <>/&\"'\n\t=!-pbr")), max_size=200
).map(lambda s: s.encode("utf-8"))


@settings(max_examples=200, deadline=None)
@given(html=html_strategy)
def test_extract_is_deterministic_and_tagfree(html):
    a, b = extract_text(html), extract_text(html)
    assert a == b  # deterministic
    # No complete tag survives — unless the input contained entities, whose
    # decoding can legitimately produce text that LOOKS like a tag
    # ("&lt;p&gt;" -> "<p>"), or an unterminated "<" (plain text, kept).
    if b"&" not in html:
        import re

        assert not re.search(r"<[^<>]*>", a, re.S)


@settings(max_examples=100, deadline=None)
@given(html=html_strategy)
def test_extract_idempotent_on_own_output(html):
    # extracting already-extracted text must not change it further, except
    # that entity decoding can re-expose '&'-sequences; assert stability on
    # the entity-free subset
    out = extract_text(html)
    if "&" not in out and "<" not in out:
        assert extract_text(out.encode("utf-8")) == out


# -- bucketized range join vs naive model ------------------------------------

range_events = st.lists(
    st.tuples(
        st.integers(0, 3),        # user (few keys -> co-key pairs likely)
        st.integers(0, 7200),     # ts offset seconds (spans several buckets)
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lefts=range_events, rights=range_events)
def test_range_join_matches_naive_model(spark, lefts, rights):
    """The bucketized equi-join must emit EXACTLY the pairs the quadratic
    definition emits — for any placement of events across bucket seams."""
    from migration_pair_spark.operators.timeseries import range_join

    t0 = dt.datetime(2024, 1, 1)

    def df(rows):
        return spark.createDataFrame(
            [
                (i, t0 + dt.timedelta(seconds=s), u)
                for i, (u, s) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long",
        )

    window_ms = 1800 * 1000
    got = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in range_join(df(lefts), df(rights), window_ms=window_ms).collect()
    }
    want = {
        (lu, li, ri)
        for li, (lu, ls) in enumerate(lefts)
        for ri, (ru, rs) in enumerate(rights)
        if lu == ru and ls - 1800 <= rs < ls
    }
    assert got == want


# -- stratified split: total, disjoint, deterministic -------------------------

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=30, unique=True))
def test_assign_split_total_and_stable(spark, ids):
    from migration_pair_spark.operators.sampling import assign_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = assign_split(df).collect()
    assert len(rows) == len(ids)                      # total: every row assigned
    assert {r.split for r in rows} <= {"train", "val", "test"}
    again = {(r.doc_id, r.split) for r in assign_split(df).collect()}
    assert {(r.doc_id, r.split) for r in rows} == again  # deterministic


# -- interval algebra of the exactly-once gate --------------------------------

ranges_strategy = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 60)).map(
        lambda t: (min(t), max(t))
    ),
    min_size=0,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(a=ranges_strategy, b=ranges_strategy)
def test_interval_algebra_against_set_model(a, b):
    """merge_ranges and subtract_ranges must agree with the brute-force set
    model for ANY interval soup — these functions gate exactly-once."""
    from migration_pair_spark.cdc.apply import merge_ranges, subtract_ranges

    def points(rs):
        return {p for lo, hi in rs for p in range(lo, hi + 1)}

    merged = merge_ranges(a)
    assert points(merged) == points(a)
    # merged output is sorted, disjoint, non-adjacent
    for (l1, h1), (l2, h2) in zip(merged, merged[1:]):
        assert h1 + 1 < l2
    assert all(lo <= hi for lo, hi in merged)

    diff = subtract_ranges(merge_ranges(a), merge_ranges(b))
    assert points(diff) == points(a) - points(b)
    for lo, hi in diff:
        assert lo <= hi


# ----- applied-LSN interval algebra (the exactly-once gate's core math) ----

_iv = st.tuples(st.integers(0, 60), st.integers(0, 60)).map(
    lambda t: (min(t), max(t))
)
_ivs = st.lists(_iv, max_size=8)


def _expand(ranges):
    out = set()
    for lo, hi in ranges:
        out.update(range(lo, hi + 1))
    return out


@given(ranges=_ivs)
def test_merge_ranges_is_canonical_and_lossless(ranges):
    from migration_pair_spark.cdc.apply import merge_ranges

    merged = merge_ranges(ranges)
    # lossless: covers exactly the same LSN set
    assert _expand(merged) == _expand(ranges)
    # canonical: sorted, disjoint, non-adjacent (steady state stays O(1))
    for (lo1, hi1), (lo2, hi2) in zip(merged, merged[1:]):
        assert lo1 <= hi1 and lo2 <= hi2
        assert lo2 > hi1 + 1
    # idempotent
    assert merge_ranges(merged) == merged


@given(intervals=_ivs, applied=_ivs)
def test_subtract_ranges_is_exact_set_difference(intervals, applied):
    from migration_pair_spark.cdc.apply import merge_ranges, subtract_ranges

    intervals_m, applied_m = merge_ranges(intervals), merge_ranges(applied)
    diff = subtract_ranges(intervals_m, applied_m)
    assert _expand(diff) == _expand(intervals_m) - _expand(applied_m)
    # the fresh set re-merged with applied covers exactly applied + batch —
    # the commit invariant (what the published ranges claim is applied)
    assert _expand(merge_ranges(applied_m + diff)) == (
        _expand(applied_m) | (_expand(intervals_m) - _expand(applied_m))
    )


# -- URL canonicalization (functions/webtext.py) -----------------------------

_label = st.text(alphabet="abXY9-", min_size=1, max_size=6).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
_url_parts = st.tuples(
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(["", "user:pw@", "u@"]),                  # userinfo
    st.lists(_label, min_size=1, max_size=3),                 # host labels
    st.sampled_from(["", ":80", ":443", ":8080"]),            # port
    st.sampled_from(["", "/", "/p", "/A/b"]),                 # path
    st.lists(                                                  # query params
        st.sampled_from(["a=1", "b=2", "z=", "utm_source=x", "ref=r"]),
        max_size=3,
    ),
    # fragments include a '?'-bearing one: a '?' first appearing inside
    # the fragment must NOT leak into the canonical query (review-caught)
    st.sampled_from(["", "#f", "#a b", "#sec?x=1"]),          # fragment
)


def _assemble(parts):
    scheme, userinfo, labels, port, path, params, frag = parts
    host = ".".join(labels)
    q = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{userinfo}{host}{port}{path}{q}{frag}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_url_parts, min_size=1, max_size=20))
def test_canonical_url_idempotent_and_part_exact(spark, parts_list):
    """For any URL assembled from known components: canonicalization is
    idempotent, and every output equals the canonical form computed by a
    pure-Python model of the documented rules."""
    from migration_pair_spark.functions import webtext as wt
    from pyspark.sql import functions as F

    urls = [_assemble(p) for p in parts_list]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = [
        r["c"] for r in df.select(wt.canonical_url(F.col("u")).alias("c")).collect()
    ]
    df2 = spark.createDataFrame([(c,) for c in once], "c string")
    twice = [
        r["o"] for r in df2.select(wt.canonical_url(F.col("c")).alias("o")).collect()
    ]
    assert once == twice

    def model(parts):
        scheme, _ui, labels, port, path, params, _frag = parts
        scheme = scheme.lower()
        host = ".".join(labels).lower()
        keep_port = port not in ("", ":80" if scheme == "http" else ":443")
        netloc = host + (port if keep_port and port else "")
        path = path or "/"
        keep = sorted(
            p for p in params
            if not p.lower().startswith(("utm_", "ref="))
        )
        q = ("?" + "&".join(keep)) if keep else ""
        return f"{scheme}://{netloc}{path}{q}"

    assert once == [model(p) for p in parts_list]


# -- bloom-filter soundness (lakehouse/table.py) ------------------------------

_key_lists = st.lists(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
        max_size=30, unique=True,
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_key_lists, st.integers(min_value=-(2**62), max_value=2**62))
def test_bloom_pruning_is_sound(spark, tmp_path_factory, commits, probe):
    """For ANY committed key sets and ANY probe value: bloom file pruning
    never drops a file that contains the probe (no false negatives —
    blooms may keep extra files, never lose the match), and lookup()
    equals the full-scan filter."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from migration_pair_spark.lakehouse.table import LakeTable

    path = str(tmp_path_factory.mktemp("bloomprop") / "t")
    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    t = LakeTable.create(
        spark, path, schema, key_col="k", n_buckets=1,
        bloom_filter_cols=("k",), bloom_ndv=100,
    )
    for i, keys in enumerate(commits):
        phys = t._physical_schema(t.manifest["schema_version"])
        df = (
            spark.createDataFrame(
                [{"k": k, "_lsn": i, "_deleted": False} for k in keys], phys
            )
            .coalesce(1)
            .withColumn("_bucket", t.bucket_expr())
        )
        t.append_buckets(df)
    entries = t.manifest["buckets"]["0"]
    kept, _ = t.bloom_prune_entries(entries, "k", probe)
    kept_paths = {e["path"] for e in kept}
    for e, keys in zip(entries, commits):
        if probe in keys:
            assert e["path"] in kept_paths  # soundness: owner never pruned
    want = sorted(r["k"] for r in t.read().filter(F.col("k") == probe).collect())
    got = sorted(r["k"] for r in t.lookup(probe).collect())
    assert got == want
