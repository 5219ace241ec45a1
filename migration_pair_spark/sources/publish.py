"""Snapshot publishing: the downstream-facing parquet SINK of the engine.

A CDC-maintained lake table is the engine's internal format (manifest +
bucket files); training jobs and external readers want a plain,
partition-laid-out parquet dataset. ``publish_snapshot`` materializes the
CURRENT resolved snapshot under ``out_dir/v{version}/`` — optionally
``partitionBy`` user columns (e.g. ``language`` for per-language corpus
shards) — and stamps a ``_PUBLISHED`` marker after the write.

Exactly-once by construction, the same argument as the changelog
materializer (cdc/changelog.py): snapshots are immutable and the export is
a pure function of (version, partition spec), so each version directory is
idempotent — an existing marker short-circuits, a crash mid-write leaves no
marker and the re-run overwrites. Publishing keeps the default v1
committer + ``_SUCCESS`` (external readers rely on staging-dir
invisibility), with ``_PUBLISHED`` as the engine-level commit point.

Reference analog: the reference's Extraction task exports the table to CSV
(/root/reference/Tasks/Extraction.cs) — this is the columnar,
partition-aware equivalent.
"""

from __future__ import annotations

import os

from migration_pair_spark.lakehouse.table import LakeTable


def published_versions(out_dir: str) -> list[int]:
    """Versions already published under ``out_dir`` (marker-complete)."""
    if not os.path.isdir(out_dir):
        return []
    out = []
    for name in os.listdir(out_dir):
        if name.startswith("v") and os.path.exists(
            os.path.join(out_dir, name, "_PUBLISHED")
        ):
            out.append(int(name[1:]))
    return sorted(out)


def _infer_partition_chain(d: str) -> list[str]:
    """The partitionBy column chain of an existing export, read off the
    directory layout (Spark nests one `col=value` level per partition
    column). Used only for legacy markers that recorded no spec."""
    cols: list[str] = []
    cur = d
    while True:
        subs = [
            n for n in sorted(os.listdir(cur))
            if "=" in n and not n.startswith("_")
            and os.path.isdir(os.path.join(cur, n))
        ]
        if not subs:
            return cols
        cols.append(subs[0].split("=", 1)[0])
        cur = os.path.join(cur, subs[0])


def publish_snapshot(
    table: LakeTable,
    out_dir: str,
    partition_by: tuple[str, ...] = (),
    version: int | None = None,
) -> str | None:
    """Publish ``version`` (default: current) as a plain parquet dataset.
    Returns the directory written, or None when that version is already
    published WITH THE SAME partition spec (idempotent per (version,
    spec) — the marker records the spec; a re-publish under a different
    ``partition_by`` fails loudly instead of handing back the wrong
    layout)."""
    table.refresh()
    v = table.version if version is None else version
    snap = table if version is None else table.at_version(version)
    for c in partition_by:
        if c not in [f.name for f in snap.schema.fields]:
            raise ValueError(f"partition_by: unknown column {c!r}")
    d = os.path.join(out_dir, f"v{v:08d}")
    marker = os.path.join(d, "_PUBLISHED")
    spec = ",".join(partition_by)
    if os.path.exists(marker):
        # the export is a pure function of (version, partition spec), so
        # the marker records the SPEC too: silently no-opping on a
        # different partition_by would hand the consumer the wrong layout
        # with no error (review-caught). Markers written before spec
        # recording ("ok") infer the spec from the on-disk partition
        # directory chain — assuming they were unpartitioned would both
        # false-raise on legacy partitioned re-publishes and reintroduce
        # the silent-no-op for mismatched ones (review-caught, pass 2).
        with open(marker) as f:
            have = f.read().strip()
        if have == "ok":
            have = ",".join(_infer_partition_chain(d))
        if have != spec:
            raise ValueError(
                f"version {v} already published to {d} with partition spec "
                f"[{have}]; refusing to no-op a publish with spec [{spec}] "
                f"— use a different out_dir for a different layout"
            )
        return None
    df = snap.read()
    w = df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(d, mode="overwrite")
    with open(marker, "w") as f:
        f.write(spec)
    return d
