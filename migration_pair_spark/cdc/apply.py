"""The exactly-once CDC MERGE loop (SURVEY.md §2.4).

Per micro-batch inside ``foreachBatch``:

1. read the committed LSN watermark from the target's snapshot properties,
2. if the whole batch is <= watermark -> already applied (restart replay):
   skip and log lineage ``skipped=true`` — the idempotence the reference got
   for free from Cassandra LWW (/root/reference/Tasks/MigrationTask.cs:101),
3. filter to events > watermark (handles *partial* overlap when restart
   re-batches differently), normalize mixed schema epochs, evolve the table
   schema if the batch carries a newer epoch,
4. LWW dedup per key as a max_by AGGREGATE (cdc/lww.py — map-side combine,
   skew-immune without salting),
5. vectorized text extraction on the winners only (never on losers — the
   Arrow kernel runs on at most one row per key per batch),
6. MERGE, by write mode: copy-on-write unions the winners with the CURRENT
   content of only the touched buckets, re-resolves per key over
   (warc_ts, _lsn) — the cross-batch LWW guard — and rewrites those buckets;
   merge-on-read appends the winners as delta files and defers the guard to
   read/compaction time. Deletes become tombstone rows (physical rows with
   _deleted=true) so a late event older than the delete still loses,
7. commit data + ``engine.max_lsn`` watermark + lineage in ONE atomic
   snapshot — this is what upgrades at-least-once replay to exactly-once.

The merge is aggregation, NOT a join: the target side has exactly one
resolved row per key and the batch side at most one winner per key, so no
skew and no join shuffle beyond the single hash partition by key.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("migration_pair_spark.cdc")

from migration_pair_spark.cdc.lww import lww_dedup_agg
from migration_pair_spark.functions.extract import with_extracted_text
from migration_pair_spark.lakehouse.table import LakeTable

WATERMARK_PROP = "engine.max_lsn"
EPOCH_PROP = "engine.schema_epoch"


def apply_cdc_batch(
    table: LakeTable,
    batch: DataFrame,
    batch_id: int = 0,
    salt_buckets: int = 16,  # used by the window-form LWW alternative only;
    # the default max_by aggregate needs no salt (map-side combine pre-folds
    # hot keys — see lww.lww_dedup_agg)
    epoch_registry: "dict[int, list] | None" = None,
    extract_text: bool = True,
    write_mode: str = "cow",
) -> dict:
    """Apply one micro-batch of change events to ``table``. Returns the
    lineage record (FIXTURES.md F4). Idempotent: re-applying any prefix,
    suffix or the whole stream converges to the same final snapshot.

    ``write_mode``:
      - ``"cow"`` (copy-on-write): touched buckets are read, merged and
        rewritten — reads stay cheap (1 row/key on disk), writes pay
        O(touched bucket bytes) per batch. Right when batches touch few
        buckets or reads dominate.
      - ``"mor"`` (merge-on-read): winners append as delta files — writes
        pay O(batch) regardless of table size; reads LWW-resolve per key
        until :meth:`LakeTable.compact` folds the deltas. Right for
        sustained high-rate streams whose keys spread across all buckets
        (measured: COW sustained throughput degrades with table size as
        every micro-batch rewrites nearly the whole table)."""
    t0 = time.monotonic()
    table.refresh()  # another writer (or a previous incarnation) may have committed

    # -- 1-2: watermark gate ------------------------------------------------
    # One column-pruned pass over the batch yields the gate stats AND the
    # touched-bucket set (winner urls == distinct batch urls, so the fresh
    # rows' bucket set is exactly the merge's write set).
    wm = int(table.properties.get(WATERMARK_PROP, "0"))
    per_bucket = (
        batch.groupBy(table.bucket_expr().alias("_b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("change_lsn").alias("lsn_min"),
            F.max("change_lsn").alias("lsn_max"),
            F.max("schema_epoch").alias("max_epoch"),
            F.sum((F.col("change_lsn") <= F.lit(wm)).cast("long")).alias("n_stale"),
        )
        .collect()
    )

    class _Stats:
        n = sum(r["n"] for r in per_bucket)
        n_stale = sum(r["n_stale"] or 0 for r in per_bucket)
        lsn_min = min((r["lsn_min"] for r in per_bucket), default=None)
        lsn_max = max((r["lsn_max"] for r in per_bucket), default=None)
        max_epoch = max((r["max_epoch"] or 1 for r in per_bucket), default=1)

    stats = _Stats
    touched = sorted(r["_b"] for r in per_bucket if r["n"] > (r["n_stale"] or 0))
    lineage_base = {
        "batch_id": batch_id,
        "lsn_min": int(stats.lsn_min) if stats.lsn_min is not None else None,
        "lsn_max": int(stats.lsn_max) if stats.lsn_max is not None else None,
        "rows_in_batch": int(stats.n),
        "table_version_before": table.version,
    }
    if stats.n == 0 or (stats.lsn_max is not None and stats.lsn_max <= wm):
        return {
            **lineage_base,
            "skipped": True,
            "rows_skipped": int(stats.n),
            "rows_upserted": 0,
            "rows_deleted": 0,
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }

    # -- 3: schema evolution (epoch-gated, BEFORE applying the data) ---------
    cur_epoch = int(table.properties.get(EPOCH_PROP, "1"))
    max_epoch = int(stats.max_epoch or 1)
    epoch_props = {}
    if epoch_registry and max_epoch > cur_epoch:
        for ep in range(cur_epoch + 1, max_epoch + 1):
            ops = epoch_registry.get(ep, [])
            if ops:
                table.evolve_schema(ops)
        epoch_props[EPOCH_PROP] = str(max_epoch)

    fresh = batch.filter(F.col("change_lsn") > F.lit(wm))

    # -- 4: LWW dedup per key (aggregate form: map-side combine makes the
    # shuffle O(distinct keys) and neutralizes hot-key skew without salting;
    # see lww.lww_dedup_agg docstring) ---------------------------------------
    key = table.key_col
    winners = lww_dedup_agg(
        fresh, key_cols=(key,), order_cols=("warc_ts", "change_lsn")
    )

    # -- 5: vectorized text extraction, winners only (mapInArrow: columns
    # stay Arrow buffers, the RE2 chain is the only Python-side work; delete
    # winners carry html=null and extract to null) ---------------------------
    if extract_text and "html" in winners.columns:
        winners = with_extracted_text(winners, html_col="html", out_col="text")

    # Project winners onto the physical table schema, casting every column to
    # the table's CURRENT type (the stream side may carry wider superset
    # types, e.g. fetch_status read as long before the widen epoch).
    proj = []
    for field in table.schema.fields:
        src = F.col(field.name) if field.name in winners.columns else F.lit(None)
        proj.append(src.cast(field.dataType).alias(field.name))
    winners_phys = winners.select(
        *proj,
        F.col("change_lsn").alias("_lsn"),
        (F.col("op") == "delete").alias("_deleted"),
    ).withColumn("_bucket", table.bucket_expr())

    # -- 6+7: merge + atomic commit (data + watermark + lineage in one
    # snapshot) -------------------------------------------------------------
    lineage = {
        **lineage_base,
        "skipped": False,
        "write_mode": write_mode,
        "rows_skipped": int(stats.n_stale or 0),  # already-applied (<= watermark)
        "wall_ms": None,  # filled after commit
    }
    import os

    if write_mode == "mor":
        # merge-on-read: append the winners as delta files — write cost is
        # O(batch); the cross-batch LWW guard moves to read/compaction time
        # (same max_by over the table's lww_order).
        new_version, added = table.append_delta_buckets(
            winners_phys,
            touched,
            properties={WATERMARK_PROP: str(int(stats.lsn_max)), **epoch_props},
            lineage=lineage,
        )
        new_files = [os.path.join(table.path, rel) for rel in added]
    else:
        # copy-on-write: union the touched buckets' current rows with the
        # winners and re-resolve. The heavy pipeline (dedup + extraction)
        # flows exactly ONCE, straight into the write. At most 2 resolved
        # rows per key meet in the re-rank (stored row + batch winner).
        current = table.read_buckets(touched).withColumn(
            "_bucket", table.bucket_expr()
        )
        merged = current.unionByName(winners_phys)
        final = lww_dedup_agg(merged, key_cols=(key,), order_cols=("warc_ts", "_lsn"))
        new_version = table.replace_buckets(
            final,
            touched,
            properties={WATERMARK_PROP: str(int(stats.lsn_max)), **epoch_props},
            lineage=lineage,
        )
        touched_set = set(touched)
        new_files = [
            os.path.join(table.path, e["path"])
            for b, files in table.manifest["buckets"].items()
            if int(b) in touched_set
            for e in files
        ]

    # Per-batch counters from a column-pruned scan of the committed rows with
    # _lsn > watermark (COW: rows that actually landed — losers of the
    # cross-batch guard are not counted; MOR: the appended winners). Only
    # (_lsn, _deleted) are read; the bucket comes from each file's
    # "_bucket=N" parent directory (part-file BASENAMES repeat across the
    # bucket dirs one task writes, so the dir component is the only safe key).
    op_counts: dict[bool, int] = {}
    bucket_counts: dict[str, int] = {}
    if new_files:
        from pyspark.sql import types as T

        count_schema = T.StructType(
            [
                T.StructField("_lsn", T.LongType(), True),
                T.StructField("_deleted", T.BooleanType(), True),
            ]
        )
        bucket_dir = F.element_at(F.split(F.input_file_name(), "/"), -2)
        applied_stats = (
            table.spark.read.schema(count_schema)
            .option("recursiveFileLookup", "true")
            .parquet(*new_files)
            .filter(F.col("_lsn") > F.lit(wm))
            .groupBy(
                F.regexp_extract(bucket_dir, r"_bucket=(\d+)", 1).alias("_b"),
                "_deleted",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in applied_stats:
            if r["_b"] == "":
                raise RuntimeError(
                    f"lineage counting: file outside a _bucket= dir in commit "
                    f"v{new_version}"
                )
            op_counts[r["_deleted"]] = op_counts.get(r["_deleted"], 0) + r["n"]
            bucket_counts[r["_b"]] = bucket_counts.get(r["_b"], 0) + r["n"]
    lineage["rows_upserted"] = int(op_counts.get(False, 0))
    lineage["rows_deleted"] = int(op_counts.get(True, 0))
    lineage["partition_counts"] = bucket_counts
    lineage["snapshot_id"] = new_version
    lineage["wall_ms"] = int((time.monotonic() - t0) * 1000)
    # Append-only per-table audit log (manifest holds the same record).
    _append_lineage(table, lineage)
    # Reference analog of the ExecutionTimeMeasured aspect's per-batch log
    # (/root/reference/Aspects/ExecutionTimeMeasured.cs:22-28).
    logger.info(
        "batch %s applied: lsn [%s, %s] upserted=%s deleted=%s skipped=%s "
        "snapshot=v%s wall=%.3fs",
        batch_id, lineage["lsn_min"], lineage["lsn_max"],
        lineage["rows_upserted"], lineage["rows_deleted"],
        lineage["rows_skipped"], new_version, lineage["wall_ms"] / 1000,
    )
    return lineage


def _append_lineage(table: LakeTable, lineage: dict) -> None:
    import json
    import os

    path = os.path.join(table.path, "lineage.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(lineage) + "\n")


def read_lineage(table: LakeTable) -> list[dict]:
    import json
    import os

    path = os.path.join(table.path, "lineage.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
