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
- implemented with Arrow's C++ RE2 kernels so a whole Arrow batch is
  processed per call (pandas ``.str`` would loop per row in Python),
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
# NOTE: the three removal passes above must stay SEQUENTIAL. A fused
# alternation is NOT equivalent: RE2 picks the leftmost match start, so a
# comment opener preceding a script whose body contains "-->" (IE
# conditional comments: "<!--[if IE]><script>if(a-->0){}</script>
# <![endif]-->") lets the comment alternative consume into the script and
# leak raw JS into the text. Sequential passes remove the script first.
# Golden-pinned in tests. The whitespace fusion below IS equivalent
# (" ?\n ?" then "\n{2,}" == " *\n[ \n]*", verified exhaustively over all
# short strings of the relevant alphabet).
_WS_NL_RE = r" *\n[ \n]*"
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
    -> null out. The regex passes run in Arrow's C++ RE2 kernels
    (``pyarrow.compute.replace_substring_regex``) over the whole batch —
    pandas ``.str.replace`` would fall back to a per-row Python ``re`` loop,
    which profiling showed to be the pipeline bottleneck (and the opposite
    of the mandated "no per-row Python"). Only the utf-8 decode maps per
    element, and ``bytes.decode`` is a C call.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    decoded = html.map(
        lambda b: b.decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray))
        else (None if b is None or (isinstance(b, float)) else str(b))
    )
    arr = pa.array(decoded, type=pa.string())
    arr = pc.replace_substring_regex(arr, pattern=_SCRIPT_RE, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_STYLE_RE, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_COMMENT_RE, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_BLOCK_BREAK_RE, replacement="\n")
    arr = pc.replace_substring_regex(arr, pattern=_ANY_TAG_RE, replacement=" ")
    for ent, repl in _ENTITIES:
        arr = pc.replace_substring(arr, pattern=ent, replacement=repl)
    # Whitespace normalization: collapse runs of spaces/tabs, trim line ends,
    # collapse blank-line runs, strip the whole document.
    arr = pc.replace_substring_regex(arr, pattern=r"[ \t\r\f\v]+", replacement=" ")
    arr = pc.replace_substring_regex(arr, pattern=_WS_NL_RE, replacement="\n")
    arr = pc.utf8_trim(arr, characters=" \t\r\n\f\v")
    return arr.to_pandas().astype(object).where(~html.isna(), None)


def extract_text(html: bytes | None) -> str | None:
    """Scalar convenience wrapper (tests / oracle); same algorithm."""
    if html is None:
        return None
    return extract_text_series(pd.Series([html])).iloc[0]


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar pandas UDF: BinaryType -> StringType."""
    return extract_text_series(html)


def _extract_arrow_array(html: "object") -> "object":
    """The same regex chain over a raw Arrow binary array — no pandas
    round-trip, no per-row Python objects. Used by the mapInArrow hot path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        arr = pc.cast(html, pa.string())
    except pa.ArrowInvalid:
        # rare fallback: batch contains invalid utf-8 -> per-element decode
        # with replacement (deterministic, matches the pandas path)
        arr = pa.array(
            [
                None if v is None else v.decode("utf-8", errors="replace")
                for v in html.to_pylist()
            ],
            type=pa.string(),
        )
    arr = pc.replace_substring_regex(arr, pattern=_SCRIPT_RE, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_STYLE_RE, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_COMMENT_RE, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_BLOCK_BREAK_RE, replacement="\n")
    arr = pc.replace_substring_regex(arr, pattern=_ANY_TAG_RE, replacement=" ")
    for ent, repl in _ENTITIES:
        arr = pc.replace_substring(arr, pattern=ent, replacement=repl)
    arr = pc.replace_substring_regex(arr, pattern=r"[ \t\r\f\v]+", replacement=" ")
    arr = pc.replace_substring_regex(arr, pattern=_WS_NL_RE, replacement="\n")
    return pc.utf8_trim(arr, characters=" \t\r\n\f\v")


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Append ``out_col`` = extract(html) via ``mapInArrow``: every column
    stays an Arrow buffer end-to-end; the only Python-side work is the RE2
    kernel chain on the html array. This is the CDC hot-path form — it
    benchmarks ~4x faster than the pandas_udf form at high core counts
    because no per-row bytes/str objects are ever materialized."""
    import pyarrow as pa
    from pyspark.sql import types as T

    out_fields = [(f.name, f.dataType) for f in df.schema.fields if f.name != out_col]
    out_schema = T.StructType(
        [df.schema[name] for name, _ in out_fields]
        + [T.StructField(out_col, T.StringType(), True)]
    )

    def mapper(batches):
        for batch in batches:
            cols = {name: batch.column(name) for name, _ in out_fields}
            cols[out_col] = _extract_arrow_array(batch.column(html_col))
            yield pa.RecordBatch.from_arrays(
                list(cols.values()), names=list(cols.keys())
            )

    return df.mapInArrow(mapper, schema=out_schema)
