"""Vectorized HTML -> text extraction (the engine's deterministic-serialization
invariant).

Reference analog: the pure row-serialization function in
/root/reference/Tasks/Extraction.cs:61-93 (timestamp -> epoch millis, quote
doubling) — a deterministic pure function of the input row. The north rule
(BASELINE.json:6,15) lifts that invariant to "byte-identical extracted text
per url", computed by a *vectorized pandas UDF* with no per-row Python.

Design constraints:

- pure bytes -> str function of the html payload only (no locale, no
  environment, no library whose minor version changes output),
- implemented with pandas' C-level vectorized ``.str`` regex kernels so a
  whole Arrow batch is processed per call,
- golden-hash pinned in tests (tests/test_extract.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Regexes are all ASCII-only and version-stable (no \w-style unicode classes).
_SCRIPT_RE = r"(?is)<script\b.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
# Tags whose *closing* (or self) implies a line break in the extracted text.
_BLOCK_BREAK_RE = (
    r"(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol|/blockquote|/pre|/title)\s*>"
)
_ANY_TAG_RE = r"(?s)<[^>]*>"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # must be last: &amp;lt; -> &lt; (literal), not <
]


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a pandas Series of html payloads.

    Accepts ``bytes`` (binary column via Arrow) or ``str`` elements; null in
    -> null out. Every transformation below is a pandas C-level kernel over
    the whole batch — no Python-level per-row loop.
    """
    isnull = html.isna()
    s = html.fillna(b"")
    # Arrow hands BinaryType over as bytes objects.
    if len(s) and not isinstance(s.iloc[0], str):
        s = s.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b))
    s = s.astype("string")
    s = s.str.replace(_SCRIPT_RE, "", regex=True)
    s = s.str.replace(_STYLE_RE, "", regex=True)
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_BLOCK_BREAK_RE, "\n", regex=True)
    s = s.str.replace(_ANY_TAG_RE, " ", regex=True)
    for ent, repl in _ENTITIES:
        s = s.str.replace(ent, repl, regex=False)
    # Whitespace normalization: collapse runs of spaces/tabs, trim line ends,
    # collapse blank-line runs, strip the whole document.
    s = s.str.replace(r"[ \t\r\f\v]+", " ", regex=True)
    s = s.str.replace(r" ?\n ?", "\n", regex=True)
    s = s.str.replace(r"\n{2,}", "\n", regex=True)
    s = s.str.strip()
    out = s.astype(object)
    out[isnull] = None
    return out


def extract_text(html: bytes | None) -> str | None:
    """Scalar convenience wrapper (tests / oracle); same algorithm."""
    if html is None:
        return None
    return extract_text_series(pd.Series([html])).iloc[0]


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar pandas UDF: BinaryType -> StringType."""
    return extract_text_series(html)
