"""Streaming corpus ingestion with incremental near-dup detection.

The operational loop the incremental index exists for — "new documents
arrive continuously into an already-deduped corpus" — expressed as the
engine's standard streaming composition: tail a documents directory with
Structured Streaming, route every micro-batch through
:meth:`IncrementalDeduper.ingest` inside ``foreachBatch``. Exactly-once
comes from the SAME two-layer design as the CDC loop (cdc/runner.py):

- the streaming checkpoint marks batch DELIVERY (a crashed batch is
  redelivered with the same batch_id on restart);
- the deduper's per-batch manifest gates make REDELIVERY idempotent —
  a fully-applied batch replays as a no-op, a batch that crashed between
  its corpus and index commits heals the missing half, and a batch id
  never double-ingests. Wiping the checkpoint and redelivering the whole
  directory converges to the identical corpus (pinned in
  tests/test_dedup_stream.py).

Delivery contract: document ids must be monotone in delivery order (the
LSN discipline — each file's ids exceed every previously-delivered id).
An out-of-order file trips the deduper's monotone gate and fails the
stream LOUDLY instead of silently mislabeling keepers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_STREAM_SCHEMA = "doc_id long, text string"


def run_dedup_stream(
    spark: SparkSession,
    deduper,
    docs_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    on_batch=None,
    auto_compact_files_per_bucket: int = 0,
) -> list[dict]:
    """Drain ``docs_dir`` (availableNow) through ``deduper`` and return one
    stats record per micro-batch ingested by THIS invocation. ``on_batch``
    (if given) is called with (batch_id, stats) after each batch — tests
    inject a mid-stream kill there.

    ``auto_compact_files_per_bucket`` (0 = never): after each applied
    batch, fold any corpus/index bucket that accumulated more than this
    many data files back to one file — the same maintenance policy (and
    metric) as the CDC follow loop's knob of the same name. A
    micro-batched stream otherwise grows one file per (batch x touched
    bucket) FOREVER, and the bucket-pruned probe's cost starts tracking
    batch history instead of data volume. Compaction is a normal
    committed rewrite: a crash mid-compact is invisible (manifest
    atomicity), and ingest equivalence is unaffected (pinned in
    tests/test_dedup_stream.py)."""
    results: list[dict] = []

    def handle(batch: DataFrame, batch_id: int) -> None:
        res = deduper.ingest(
            batch.select("doc_id", "text"), f"stream-{batch_id}"
        )
        stats = {
            k: v for k, v in res.items() if not isinstance(v, DataFrame)
        }
        if res.get("pairs") is not None:
            stats["n_pairs"] = res["pairs"].count()
        stats["batch_id"] = batch_id
        if auto_compact_files_per_bucket and not res.get("replayed"):
            compacted = deduper.auto_compact(auto_compact_files_per_bucket)
            if compacted:
                stats["auto_compact"] = {
                    name: rec["buckets"] for name, rec in compacted.items()
                }
        results.append(stats)
        if on_batch is not None:
            on_batch(batch_id, stats)

    query = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    return results
