"""Deterministic synthetic fixture generator (FIXTURES.md F1-F3).

Generates the pages base table and the binlog/WAL-style change-event stream
with seeded numpy — no external data, bit-identical across runs for a given
(seed, size). The change stream is written as N ordered parquet files so
Structured Streaming's file source with maxFilesPerTrigger=1 replays it as a
stream (FIXTURES.md F2).

Shapes derive from BASELINE.json:15 (input_hint) and the reference's row
model (/root/reference/Models/CColumn.cs:5-15) with its timestamp-as-epoch-
millis normalization (/root/reference/Tasks/Extraction.cs:67-68).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "the quick brown fox jumps over lazy dog spark merge upsert stream batch "
    "lake table snapshot commit watermark lineage schema epoch salt skew url "
    "page crawl fetch index token shard bucket partition shuffle window rank"
).split()

_LANGS = ["en", "de", "fr", "pt", "es", "zz"]

# Base timestamp: 2024-01-01T00:00:00Z in epoch microseconds.
_BASE_TS_US = 1_704_067_200_000_000

CHANGE_EVENT_COLUMNS = [
    "change_lsn",
    "op",
    "url",
    "warc_ts",
    "html",
    "lang",
    "schema_epoch",
]


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def make_urls(n_urls: int, n_sites: int = 20) -> list[str]:
    return [f"https://site{i % n_sites}.example/p/{i}" for i in range(n_urls)]


def make_html(i: int, rev: int, rng: np.random.Generator) -> bytes:
    """Deterministic synthetic page: template + seeded words (FIXTURES.md F1)."""
    words = " ".join(rng.choice(_WORDS, size=12))
    return (
        f"<html><head><title>T{i}</title><script>var x={rev};</script></head>"
        f"<body><h1>Page {i}</h1><p>rev {rev}: {words}</p>"
        f"<p>&amp; more &lt;text&gt;</p></body></html>"
    ).encode("utf-8")


def make_change_events(
    n_events: int,
    n_urls: int,
    seed: int = 42,
    zipf_s: float = 1.2,
    op_mix: tuple[float, float, float] = (0.6, 0.3, 0.1),
    words_per_doc: int = 12,
) -> pd.DataFrame:
    """The F2 change stream: strictly monotone unique change_lsn, zipf-skewed
    urls, out-of-order (per url) warc_ts with deliberate ties, 60/30/10
    insert/update/delete mix, html payload for non-deletes.
    """
    rng = _rng(seed)
    urls = np.asarray(make_urls(n_urls))

    lsn = np.arange(1, n_events + 1, dtype=np.int64)
    # zipf over url ranks, clipped to the url space -> a few hot urls dominate.
    ranks = rng.zipf(zipf_s, size=n_events) - 1
    url_idx = ranks % n_urls
    ops = rng.choice(np.array(["insert", "update", "delete"]), size=n_events, p=list(op_mix))
    # Non-monotone warc_ts: base + event-order millis + jitter that can go
    # backwards; quantized to whole seconds so same-url ties happen.
    jitter_s = rng.integers(-300, 300, size=n_events)
    ts_us = _BASE_TS_US + (lsn * 200_000) + jitter_s * 1_000_000
    ts_us = (ts_us // 1_000_000) * 1_000_000
    langs = rng.choice(np.array(_LANGS), size=n_events)
    revs = rng.integers(0, 1_000_000, size=n_events)

    # Vectorized page synthesis: the 12 body words come from one bulk draw
    # (seeded), so generation stays deterministic AND fast at 10^6+ events.
    word_idx = rng.integers(0, len(_WORDS), size=(n_events, words_per_doc))
    words_arr = np.array(_WORDS)
    html = [
        None
        if ops[i] == "delete"
        else (
            f"<html><head><title>T{url_idx[i]}</title><script>var x={revs[i]};</script></head>"
            f"<body><h1>Page {url_idx[i]}</h1><p>rev {revs[i]}: {' '.join(words_arr[word_idx[i]])}</p>"
            f"<p>&amp; more &lt;text&gt;</p></body></html>"
        ).encode("utf-8")
        for i in range(n_events)
    ]
    return pd.DataFrame(
        {
            "change_lsn": lsn,
            "op": ops,
            "url": urls[url_idx],
            "warc_ts": pd.to_datetime(ts_us, unit="us"),
            "html": html,
            "lang": langs,
            "schema_epoch": np.full(n_events, 1, dtype=np.int32),
        }
    )


def arrow_schema(epoch: int = 1) -> pa.schema:
    fields = [
        pa.field("change_lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.string()),
        pa.field("schema_epoch", pa.int32()),
    ]
    if epoch >= 2:
        fields.append(pa.field("fetch_status", pa.int32()))
    if epoch >= 3:
        fields = [
            pa.field("language", pa.string()) if f.name == "lang" else f for f in fields
        ]
        fields = [
            pa.field("fetch_status", pa.int64()) if f.name == "fetch_status" else f
            for f in fields
        ]
    return pa.schema(fields)


def write_change_stream(
    out_dir: str,
    n_events: int,
    n_urls: int,
    n_files: int,
    seed: int = 42,
    evolution: bool = False,
    words_per_doc: int = 12,
) -> pd.DataFrame:
    """Write the change stream as ``n_files`` ordered parquet files
    (file i named ``events-{i:05d}.parquet`` so lexical order == LSN order).

    With ``evolution=True`` the last two files are schema epochs 2 and 3
    (FIXTURES.md F3): epoch 2 adds fetch_status:int, epoch 3 renames
    lang->language and widens fetch_status to long. Returns the full event
    DataFrame (epoch-1 shape) for oracle computation.
    """
    os.makedirs(out_dir, exist_ok=True)
    df = make_change_events(n_events, n_urls, seed=seed, words_per_doc=words_per_doc)
    bounds = np.linspace(0, n_events, n_files + 1, dtype=int)
    rng = _rng(seed + 1)
    for i in range(n_files):
        chunk = df.iloc[bounds[i] : bounds[i + 1]].copy()
        epoch = 1
        if evolution and i >= n_files - 2:
            epoch = 2 if i == n_files - 2 else 3
        chunk["schema_epoch"] = np.int32(epoch)
        if epoch >= 2:
            chunk["fetch_status"] = rng.integers(200, 600, size=len(chunk)).astype(
                "int32" if epoch == 2 else "int64"
            )
        if epoch >= 3:
            chunk = chunk.rename(columns={"lang": "language"})
        table = pa.Table.from_pandas(chunk, schema=arrow_schema(epoch), preserve_index=False)
        pq.write_table(table, os.path.join(out_dir, f"events-{i:05d}.parquet"))
    # Strictly increasing mtimes (10 ms apart): Spark's file stream source
    # orders pending files by millisecond mtime and breaks ties
    # nondeterministically — files written back-to-back can land in the same
    # millisecond and replay out of LSN order. The engine's interval gate now
    # stays correct under that (cdc/apply.py), but deterministic in-order
    # delivery is what a real WAL tail provides and what the bench measures.
    base = os.stat(os.path.join(out_dir, f"events-{n_files - 1:05d}.parquet")).st_mtime
    for i in range(n_files):
        t = base + (i + 1) * 0.010
        os.utime(os.path.join(out_dir, f"events-{i:05d}.parquet"), (t, t))
    return df


def write_debezium_stream(
    out_dir: str,
    n_events: int,
    n_urls: int,
    n_files: int,
    seed: int = 42,
    evolution: bool = False,
    words_per_doc: int = 12,
) -> pd.DataFrame:
    """The SAME change stream as :func:`write_change_stream` (same seed =>
    same events, same epoch schedule, same fetch_status draws) serialized as
    Debezium-envelope JSONL files instead of parquet — one line per event,
    file i named ``events-{i:05d}.jsonl``.

    Deliberately written with stdlib ``json`` + ``base64`` rather than the
    engine's own serializer (sources/debezium.to_debezium_json) so the
    parser is validated against an INDEPENDENT encoder: html travels
    base64, warc_ts travels epoch millis, op travels c/u/d with every 7th
    insert as "r" (Debezium snapshot read — canonicalizes identically).
    Returns the full epoch-1 event DataFrame for oracle computation.
    """
    import base64
    import json

    os.makedirs(out_dir, exist_ok=True)
    df = make_change_events(n_events, n_urls, seed=seed, words_per_doc=words_per_doc)
    bounds = np.linspace(0, n_events, n_files + 1, dtype=int)
    rng = _rng(seed + 1)  # same stream as write_change_stream's fetch_status
    op_wire = {"insert": "c", "update": "u", "delete": "d"}
    n_inserts_seen = 0
    for i in range(n_files):
        chunk = df.iloc[bounds[i] : bounds[i + 1]]
        epoch = 1
        if evolution and i >= n_files - 2:
            epoch = 2 if i == n_files - 2 else 3
        fetch = (
            rng.integers(200, 600, size=len(chunk)) if epoch >= 2 else None
        )
        lines = []
        for j, r in enumerate(chunk.itertuples(index=False)):
            payload: dict = {
                "url": r.url,
                "warc_ts": int(r.warc_ts.value // 1_000_000),
                "html": (
                    base64.b64encode(r.html).decode("ascii")
                    if r.html is not None
                    else None
                ),
                ("language" if epoch >= 3 else "lang"): r.lang,
            }
            if fetch is not None:
                payload["fetch_status"] = int(fetch[j])
            op = op_wire[r.op]
            if r.op == "insert":
                n_inserts_seen += 1
                if n_inserts_seen % 7 == 0:
                    op = "r"
            env = {
                "before": payload if op == "d" else None,
                "after": None if op == "d" else payload,
                "source": {"lsn": int(r.change_lsn), "schema_epoch": epoch},
                "op": op,
                "ts_ms": int(r.warc_ts.value // 1_000_000),
            }
            lines.append(json.dumps(env, separators=(",", ":")))
        with open(os.path.join(out_dir, f"events-{i:05d}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
    # strictly increasing mtimes, same rationale as write_change_stream
    base_t = os.stat(os.path.join(out_dir, f"events-{n_files - 1:05d}.jsonl")).st_mtime
    for i in range(n_files):
        t = base_t + (i + 1) * 0.010
        os.utime(os.path.join(out_dir, f"events-{i:05d}.jsonl"), (t, t))
    return df


def make_pages(n_urls: int, seed: int = 42) -> pd.DataFrame:
    """The F1 base table: one current row per url (initial snapshot before
    any change events; lsn semantics: loaded rows carry _lsn=0)."""
    rng = _rng(seed)
    urls = make_urls(n_urls)
    revs = rng.integers(0, 1_000_000, size=n_urls)
    ts_us = _BASE_TS_US - 86_400_000_000 + rng.integers(0, 3600, size=n_urls) * 1_000_000
    langs = rng.choice(np.array(_LANGS), size=n_urls)
    html = [make_html(i, int(revs[i]), _rng(int(revs[i]))) for i in range(n_urls)]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(ts_us, unit="us"),
            "html": html,
            "text": [None] * n_urls,  # filled by the engine's extraction
            "lang": langs,
        }
    )


def oracle_final_state(events: pd.DataFrame) -> pd.DataFrame:
    """Independent (pandas) oracle for the final table state — FIXTURES.md F2:
    per url the event with max (warc_ts, change_lsn); url absent iff that
    winner is a delete. Text column is NOT computed here (the extraction UDF
    is validated separately by golden hashes)."""
    s = events.sort_values(["url", "warc_ts", "change_lsn"])
    winners = s.groupby("url", as_index=False).tail(1)
    return winners[winners["op"] != "delete"].reset_index(drop=True)
