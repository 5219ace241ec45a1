"""CDC -> dedup bridge: sweep a pages table's NEW row versions into an
incremental chunk-dedup index.

This closes the loop between the engine's two halves: the CDC tail keeps a
lake table of current web pages (cdc/runner.py), and the incremental dedup
family keeps a persisted chunk-key index of everything a training corpus
has already seen (operators/incremental.py). A re-crawled page usually
changes in part — boilerplate and untouched paragraphs are already in the
index, so sweeping each UPDATED VERSION through chunk-level dedup admits
only its genuinely novel spans into the corpus (the CCNet-style
"1 TB/day of crawl churn -> deduped training text" pipeline).

How a sweep finds its input — zone maps, not a second bookkeeping system:

- every current row in the pages table carries ``_lsn`` = the change event
  that produced it (COW carries untouched rows' old ``_lsn`` forward), so
  "row versions that appeared since X" is exactly
  ``read_range("_lsn", lo=X+1)``;
- the watermark X lives in the chunk corpus's OWN manifest (``sweep.lsn``
  property), written atomically with each sweep's corpus commit through
  the ingest's corpus_properties hook — one commit, nothing to desync or
  lose. A crash anywhere replays the same sweep; the gate makes the
  replay idempotent. (It is deliberately NOT derived from the corpus's
  applied doc-id intervals: a snapshot seed with caller-chosen ids above
  the current LSN would inflate a derived watermark and silently skip
  change rows forever — review-caught; legacy pre-property indexes keep
  the derived fallback);
- with ``stats_cols=("_lsn",)`` on the pages table the sweep scan PRUNES
  every file whose whole zone predates the watermark — steady-state sweep
  cost is O(files touched since last sweep), not O(table)
  (tests/test_cdc_dedup_sweep.py pins the skip count).

``_lsn`` satisfies the index gate's contracts for free: unique per event
(WAL order) and monotone across sweeps (each sweep reads strictly above
the previous high).

Deletes are skipped (a removed page contributes no text; its previously
accepted spans stay accepted — dedup acceptance is never retracted, same
contract as the index heal path).

Scope contract: a sweep covers CHANGE-DERIVED rows (``_lsn >= 1``, WAL
order). Rows loaded by a snapshot backfill carry ``_lsn = 0`` (many rows,
one lsn — no usable per-row id) and are deliberately never swept; seed the
index from a snapshot with an explicit one-off ``chunk-ingest`` batch
before tailing, exactly like seeding any other downstream consumer from
the snapshot + changelog pair — with doc ids BELOW the LSN space
(negative ids; the ingest gate's monotone check then fails loudly on any
collision instead of a sweep silently skipping overlapped change rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from migration_pair_spark.lakehouse.table import LakeTable
from migration_pair_spark.operators.incremental import (
    SWEEP_PROP,
    IncrementalChunkIndex,
)


def sweep_watermark(ix: IncrementalChunkIndex) -> int:
    """The highest pages-table ``_lsn`` already swept into the index.

    Authoritative source: the ``sweep.lsn`` corpus property each sweep
    commits atomically with its batch (stamped "0" at index create).
    Deriving it from the corpus's applied doc-id intervals (the original
    design) CONFLATED the two id spaces: a snapshot seed ingested with
    caller-chosen doc ids above the WAL's current LSN inflated the
    watermark and made every sweep skip real change rows forever,
    silently (review-caught). A missing property reads as 0 — any index
    old enough to lack it also predates the tokenizer stamp and cannot
    load at all without manual property surgery, which must set both
    (a derived fallback here would reproduce the inflated-watermark bug
    in exactly that migration state — review-caught, pass 2); a from-0
    re-sweep against an already-populated corpus then fails the monotone
    gate LOUDLY rather than skipping anything."""
    return int(ix.corpus.properties.get(SWEEP_PROP, "0"))


def sweep_into_chunk_index(
    pages: LakeTable,
    ix: IncrementalChunkIndex,
    text_col: str = "text",
    batch_id: str | None = None,
    auto_compact_files_per_bucket: int = 0,
) -> dict:
    """One sweep: ingest every page row version with ``_lsn`` above the
    index's watermark as a (doc_id=_lsn, text) batch, advancing the
    watermark property in the same commit. Returns the index ingest
    result plus sweep accounting. Idempotent: an immediate re-sweep is
    empty; a crash-replayed sweep is absorbed by the index gate.

    Seeding contract: seed doc ids must sit BELOW the WAL's LSN space
    (use negative ids) — seeds no longer move the watermark, and a seed
    id colliding with a later LSN now fails the ingest gate loudly
    instead of silently skipping the overlapped change rows."""
    pages.refresh()
    wm = sweep_watermark(ix)
    new = (
        pages.read_range("_lsn", lo=wm + 1, include_tombstones=True)
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col("_lsn").alias("doc_id"),
            F.col(text_col).alias("text"),
            # provenance for right-to-be-forgotten: purging a url from the
            # pages table extends into the swept corpus via
            # IncrementalChunkIndex.purge_source(url)
            F.col(pages.key_col).alias("src_key"),
        )
    )
    out = ix.ingest(
        new,
        batch_id or f"sweep-lsn-gt-{wm}",
        corpus_properties=lambda lo, hi: {SWEEP_PROP: str(hi)},
    )
    out["sweep_from_lsn"] = wm + 1
    # per-sweep maintenance (0 = never): the sweep loop is exactly the
    # micro-batched ingest whose corpus/index file counts otherwise grow
    # one file per (sweep x touched bucket) without bound — same policy
    # and metric as the CDC follow loop's auto_compact_files_per_bucket
    if auto_compact_files_per_bucket and not (
        out.get("replayed") or out.get("empty")
    ):
        compacted = ix.auto_compact(auto_compact_files_per_bucket)
        if compacted:
            out["auto_compact"] = {
                name: rec["buckets"] for name, rec in compacted.items()
            }
    return out
