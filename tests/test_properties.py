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
