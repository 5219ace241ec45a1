"""LakeTable: a hash-bucketed, snapshot-committed parquet table.

Layout on disk (all paths relative to the table root):

    manifests/v00000001.json      -- one immutable manifest per snapshot
    data/tx-<version>-<uuid>/...  -- data files written by one commit

A manifest is the complete table state: schema history, bucket -> data-file
map, snapshot properties, lineage of the committing batch. The *latest*
snapshot is the manifest with the highest version number; commit = write
temp file (fsync) + exclusive ``os.link`` publish (+ directory fsync) —
EEXIST on the link IS the optimistic-concurrency conflict, like an Iceberg
commit conflict. A crash between data write and manifest publish leaves only
invisible orphan files — the table state is unchanged, and the CDC watermark
gate makes the retried batch idempotent.

Scale notes (the design target is a 1000-executor cluster over ~100 TB):

- ``n_buckets`` is the copy-on-write granularity. A micro-batch rewrites
  only the buckets its keys hash into; at scale you size n_buckets so one
  bucket ~ a few GB (e.g. 4096 buckets for 10 TB of hot key space). The
  driver-side manifest holds one file list per bucket — O(n_buckets), not
  O(rows).
- Reads prune by bucket: ``read_buckets([...])`` opens only the named
  buckets' files, so the MERGE join never scans the full table.
- All data movement is executor-side DataFrame work; the driver only lists
  file names and writes a small JSON manifest.

System columns stored physically alongside the user schema:
    _lsn     long    -- change_lsn of the writing event (cross-batch LWW)
    _deleted boolean -- tombstone flag (late-arrival correctness: a delete
                        must keep beating older events that arrive later)
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SYSTEM_COLS = ["_lsn", "_deleted"]
#: bumped by every purge_keys commit; its PRESENCE is the zero-cost signal
#: the CDC apply path uses to know a suppression ledger exists
PURGE_EPOCH_PROP = "purge.epoch"


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency conflict: another writer published this
    snapshot version first (Iceberg CommitFailedException analog). The
    transaction's data files are orphans (invisible; vacuum collects
    them) — the loser refreshes and retries its WHOLE operation against
    the new table state. Recomputable operations (CDC apply, compact,
    purge, view refresh) do that automatically; see their
    ``conflict_retries`` parameters."""


def retry_conflicts(fn, retries: int, on_conflict):
    """The one optimistic-rebase loop every recomputable operation shares:
    run ``fn``; on CommitConflictError call ``on_conflict(error)`` (which
    must refresh whatever state ``fn`` recomputes from) and re-run, up to
    ``retries`` times; then re-raise."""
    attempt = 0
    while True:
        try:
            return fn()
        except CommitConflictError as e:
            attempt += 1
            if attempt > retries:
                raise
            on_conflict(e)
_SYSTEM_FIELDS = [
    T.StructField("_lsn", T.LongType(), True),
    T.StructField("_deleted", T.BooleanType(), True),
]

#: column types zone maps support (read_range): totally ordered scalars whose
#: parquet footer min/max round-trip through JSON. Binary and nested types
#: are refused at create; date is excluded only because nothing here uses it.
_STATS_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType,
    T.StringType, T.BooleanType, T.TimestampType, T.TimestampNTZType,
)

#: column types bloom filters support: the parquet physical types whose
#: parquet-mr bloom hash we can reproduce driver-side (INT32 / INT64 /
#: BINARY-utf8). Floats make no sense as point-lookup keys.
_BLOOM_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType,
)


def _stats_encode(v):
    """A footer-stat or predicate-bound value as its JSON zone-map encoding.
    Timestamps become epoch MICROS (naive == UTC: session TZ is pinned);
    everything else is already JSON-scalar. Encodings are only ever compared
    to encodings of the SAME column, so cross-type ordering never arises."""
    import datetime

    if isinstance(v, datetime.datetime):
        us = datetime.timedelta(microseconds=1)
        if v.tzinfo is not None:
            epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        else:
            epoch = datetime.datetime(1970, 1, 1)
        return (v - epoch) // us  # exact integer micros
    if isinstance(v, bool):
        return int(v)
    return v


def _footer_stats(
    fp: str, stats_cols: list[str]
) -> tuple[dict[str, list], int]:
    """One written file's zone map from its parquet footer: {col: [min,
    max]} (encoded per :func:`_stats_encode`) plus the row count. A column
    is omitted when ANY row group lacks exact min/max for it (conservative:
    no stats => never pruned). Spark writes stats through parquet-mr, whose
    (rare) long-string truncation keeps min a valid lower bound and max a
    valid upper bound, so pruning on them stays sound."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fp).metadata
    if md.num_row_groups == 0:
        return {}, 0
    name_to_idx = {
        md.row_group(0).column(j).path_in_schema: j
        for j in range(md.row_group(0).num_columns)
    }
    out: dict[str, list] = {}
    for c in stats_cols:
        j = name_to_idx.get(c)
        if j is None:
            continue
        lo = hi = None
        ok = True
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(j).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = _stats_encode(st.min), _stats_encode(st.max)
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if ok and lo is not None:
            out[c] = [lo, hi]
    return out, md.num_rows


@dataclass(frozen=True)
class AddColumn:
    name: str
    type: str  # Spark DDL type string, e.g. "int"


@dataclass(frozen=True)
class RenameColumn:
    old: str
    new: str


@dataclass(frozen=True)
class WidenColumn:
    name: str
    new_type: str


@dataclass(frozen=True)
class AddStructField:
    """Add a field INSIDE a struct column (multimodal metadata structs grow
    fields far more often than tables grow columns). Metadata-only like
    every evolution op; old rows read the field as null."""

    column: str
    name: str
    type: str  # Spark DDL type string


@dataclass(frozen=True)
class RenameStructField:
    """Rename a field inside a struct column; old files reconcile on read
    through the struct-rename history, like top-level renames."""

    column: str
    old: str
    new: str


@dataclass(frozen=True)
class DropColumn:
    """Drop a top-level column — metadata-only, like Iceberg's drop: old
    data files keep the bytes but reads project onto the current schema so
    the column disappears everywhere. The DROP HISTORY makes replays no-op
    and — crucially — fences old incarnations: a later re-ADD of the same
    name reads as NULL from files written before the re-add (Iceberg gets
    this from field ids; here the add/drop histories carry the same
    information as version ordinals)."""

    name: str


@dataclass(frozen=True)
class WidenStructField:
    """Widen a field inside a struct (or array<struct>) column, same
    promotion lattice as top-level WidenColumn. Metadata-only: old files'
    narrow struct fields are cast up on read by the recursive struct
    conform (``_conform`` rebuilds structs field-by-field and casts
    leaves)."""

    column: str
    name: str
    new_type: str


def _schema_from_json(s: str) -> T.StructType:
    return T.StructType.fromJson(json.loads(s))


class LakeTable:
    """One keyed, bucketed, snapshot-committed table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._manifest: dict | None = None

    # ------------------------------------------------------------- lifecycle

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_col: str,
        n_buckets: int = 16,
        properties: dict[str, str] | None = None,
        lww_order: tuple[str, ...] = ("warc_ts", "_lsn"),
        stats_cols: tuple[str, ...] = (),
        bloom_filter_cols: tuple[str, ...] = (),
        bloom_ndv: int = 1_000_000,
    ) -> "LakeTable":
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        phys = {f.name: f.dataType for f in schema.fields}
        phys.update({f.name: f.dataType for f in _SYSTEM_FIELDS})
        for c in stats_cols:
            if c not in phys:
                raise ValueError(f"stats_cols: unknown column {c!r}")
            if not isinstance(phys[c], _STATS_TYPES):
                raise ValueError(
                    f"stats_cols: unsupported type {phys[c].simpleString()} "
                    f"for {c!r} (numeric/string/boolean/timestamp only)"
                )
        for c in bloom_filter_cols:
            if c not in phys:
                raise ValueError(f"bloom_filter_cols: unknown column {c!r}")
            if not isinstance(phys[c], _BLOOM_TYPES):
                raise ValueError(
                    f"bloom_filter_cols: unsupported type "
                    f"{phys[c].simpleString()} for {c!r} "
                    f"(integer/long/string only)"
                )
        t = cls(spark, path)
        manifest = {
            "format_version": 1,
            "version": 1,
            "parent": None,
            "key_col": key_col,
            "n_buckets": n_buckets,
            "schema_version": 1,
            "schemas": {"1": schema.jsonValue()},
            "renames": [],  # [{"old":..., "new":..., "at_schema_version": v}]
            "buckets": {},  # bucket id (str) -> [{"path":..., "schema_version": v}]
            "properties": dict(properties or {}),
            "lineage": None,
            # merge-on-read state: True when any bucket holds delta files
            # whose rows must be LWW-resolved at read time by lww_order
            "mor": False,  # derived: kept for readers; authoritative set below
            "mor_buckets": [],  # bucket ids holding unresolved delta files
            "lww_order": list(lww_order),
            # zone maps: per-file min/max recorded for these columns at every
            # commit (parquet footer stats — no data scan); read_range prunes
            # files by them. Empty = zero overhead.
            "stats_cols": list(stats_cols),
            # bloom filters: parquet-native per-column-chunk blooms written
            # inline by every data write (parquet.bloom.filter.enabled#col).
            # Point predicates prune FILES by them (bloom_prune_entries /
            # lookup) and pushed IN-lists skip ROW GROUPS by them inside
            # parquet-mr — the data-skipping rung zone maps can't reach on
            # hash-distributed keys (min/max of a uniform key never prunes).
            "bloom_cols": list(bloom_filter_cols),
            "bloom_ndv": int(bloom_ndv),
        }
        t._write_manifest(manifest)
        t._manifest = manifest
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        t.refresh()
        if t._manifest is None:
            raise FileNotFoundError(f"no manifest under {path}")
        return t

    @staticmethod
    def exists(path: str) -> bool:
        return bool(glob.glob(os.path.join(path, "manifests", "v*.json")))

    def refresh(self) -> None:
        files = sorted(glob.glob(os.path.join(self.path, "manifests", "v*.json")))
        if files:
            with open(files[-1]) as f:
                self._manifest = json.load(f)

    # ------------------------------------------------------------- metadata

    @property
    def manifest(self) -> dict:
        if self._manifest is None:
            self.refresh()
        assert self._manifest is not None
        return self._manifest

    @property
    def version(self) -> int:
        return self.manifest["version"]

    @property
    def key_col(self) -> str:
        return self.manifest["key_col"]

    @property
    def n_buckets(self) -> int:
        return self.manifest["n_buckets"]

    @property
    def schema(self) -> T.StructType:
        m = self.manifest
        return _schema_from_json(json.dumps(m["schemas"][str(m["schema_version"])]))

    @property
    def properties(self) -> dict[str, str]:
        return dict(self.manifest["properties"])

    @property
    def lineage(self) -> dict | None:
        return self.manifest["lineage"]

    @property
    def lww_order(self) -> tuple[str, ...]:
        """The table's persisted last-writer-wins ordering (stored-row
        column names); the single source of truth for every resolve path
        (COW merge, MOR read, compaction)."""
        return tuple(self.manifest.get("lww_order", ["warc_ts", "_lsn"]))

    @property
    def is_merge_on_read(self) -> bool:
        """True while any bucket holds unresolved delta files (reads must
        LWW-resolve; compaction folds them). Iceberg analog: v2 table with
        outstanding delete files / write.merge.mode=merge-on-read."""
        return bool(self.mor_buckets) or bool(self.manifest.get("mor"))

    @property
    def mor_buckets(self) -> set[int]:
        """Buckets with unresolved deltas. Tables written before per-bucket
        tracking carry only the global bool — treat every nonempty bucket as
        unresolved for them."""
        m = self.manifest
        if "mor_buckets" in m:
            return {int(b) for b in m["mor_buckets"]}
        if m.get("mor"):
            return {int(b) for b, fs in m["buckets"].items() if fs}
        return set()

    def files_per_bucket(self) -> dict[int, int]:
        """Data-file count per bucket — the maintenance metric the
        auto-compaction policy reads (format-neutral: Iceberg derives it
        from the snapshot's manifest entries per bucket partition)."""
        return {
            int(b): len(files)
            for b, files in self.manifest["buckets"].items()
        }

    def snapshot_versions(self) -> list[int]:
        files = sorted(glob.glob(os.path.join(self.path, "manifests", "v*.json")))
        return [int(os.path.basename(p)[1:-5]) for p in files]

    # ------------------------------------------------------------- commit

    def _write_manifest(self, manifest: dict) -> None:
        """Atomic EXCLUSIVE publish. POSIX ``os.rename`` silently REPLACES an
        existing target, so rename alone (plus an exists() pre-check) is a
        TOCTOU race: two concurrent committers could both publish the same
        version and one snapshot's files + watermark would be silently lost.
        ``os.link`` fails with EEXIST if the target exists — that failure IS
        the optimistic-concurrency conflict (Iceberg commit-conflict analog);
        the loser must refresh and retry its whole batch."""
        mdir = os.path.join(self.path, "manifests")
        final = os.path.join(mdir, f"v{manifest['version']:08d}.json")
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
        # commit wall clock for the history() metadata view (Iceberg
        # snapshots.committed_at analog); absent on pre-existing manifests
        manifest["committed_at_ms"] = int(time.time() * 1000)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic + exclusive (EEXIST on conflict)
            # fsync the DIRECTORY too: without it a power loss after commit
            # returned success can lose the dirent while the streaming
            # checkpoint (separately persisted) has already marked the batch
            # done — the one ordering that breaks exactly-once
            # (review-caught)
            dfd = os.open(mdir, os.O_DIRECTORY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except FileExistsError:
            raise CommitConflictError(
                f"commit conflict: snapshot v{manifest['version']} already exists"
            ) from None
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:  # pragma: no cover
                pass

    def _table_write(
        self,
        df_with_bucket: DataFrame,
        tx_dir: str,
        max_rows_per_file: int | None = None,
    ) -> None:
        """The bucket-partitioned data write both commit paths share.

        Committer v2 + no _SUCCESS, scoped to TABLE writes only (per-write
        Hadoop options, not session config): v2 commits task files straight
        into the tx dir at task-commit time, removing the driver-side
        sequential rename of every file at job commit — safe HERE because
        visibility is governed by the MANIFEST, so a mid-job crash leaves
        only unreferenced (invisible) files, and _SUCCESS is meaningless.
        Plain parquet outputs elsewhere (e.g. curate's corpus export) keep
        the default v1 + _SUCCESS, whose staging-dir invisibility and
        completeness marker they DO rely on (review-caught, round 3)."""
        w = (
            df_with_bucket.write.partitionBy("_bucket")
            .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
            .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        )
        # parquet-native bloom filters, computed inline by the write tasks
        # (no extra pass over the data; ~1.2 MB/column chunk at the default
        # NDV). Written under CURRENT column names, like footer stats.
        ndv = str(self.manifest.get("bloom_ndv") or 1_000_000)
        for c in self.manifest.get("bloom_cols") or []:
            cur = self._current_name(c)
            w = w.option(f"parquet.bloom.filter.enabled#{cur}", "true").option(
                f"parquet.bloom.filter.expected.ndv#{cur}", ndv
            )
        if max_rows_per_file:
            # bounded sorted runs (clustered compaction): each output file
            # covers a narrow slice of the sort key, so zone maps get tight
            w = w.option("maxRecordsPerFile", max_rows_per_file)
        w.parquet(tx_dir, mode="errorifexists")

    def _next_manifest(self) -> dict:
        m = json.loads(json.dumps(self.manifest))  # deep copy
        m["parent"] = m["version"]
        m["version"] = m["version"] + 1
        return m

    def _collect_written_files(
        self, tx_dir: str, schema_version: int
    ) -> dict[int, list[dict]]:
        """Map one transaction directory's output back to manifest entries:
        {bucket id: [{path, schema_version}, ...]} — the single place the
        file-entry format lives (all commit paths share it). When the table
        declares ``stats_cols``, each entry also carries that file's zone
        map ({"stats": {col: [min, max]}, "rows": n}) read from the parquet
        FOOTER — no data scan. Footer reads here are driver-side and O(new
        files); on a real cluster the same stats would ride back from the
        write tasks, but either way the input is metadata the writer
        already produced."""
        out: dict[int, list[dict]] = {}
        # manifest stats_cols are creation-time names; files are written
        # under CURRENT names — chase the rename history forward so stats
        # keep being recorded across renames (read maps back per entry via
        # _name_at_version)
        stats_cols = [
            self._current_name(c) for c in self.manifest.get("stats_cols") or []
        ]
        for bdir in glob.glob(os.path.join(tx_dir, "_bucket=*")):
            b = int(os.path.basename(bdir).split("=", 1)[1])
            for fp in sorted(glob.glob(os.path.join(bdir, "*.parquet"))):
                entry = {
                    "path": os.path.relpath(fp, self.path),
                    "schema_version": schema_version,
                }
                if stats_cols:
                    st, rows = _footer_stats(fp, stats_cols)
                    entry["rows"] = rows
                    if st:
                        entry["stats"] = st
                out.setdefault(b, []).append(entry)
        return out

    # ------------------------------------------------------------- read path

    def _physical_schema(self, schema_version: int) -> T.StructType:
        base = _schema_from_json(
            json.dumps(self.manifest["schemas"][str(schema_version)])
        )
        return T.StructType(list(base.fields) + _SYSTEM_FIELDS)

    def _empty_df(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], self._physical_schema(self.manifest["schema_version"])
        )

    @staticmethod
    def _conform(expr: F.Column, have: T.DataType, want: T.DataType) -> F.Column:
        """Cast ``expr`` (of type ``have``) to ``want``, rebuilding structs
        field-by-field: Spark's struct cast requires matching field counts,
        but evolution ADDS fields — missing ones become nulls, extras drop,
        nested structs recurse. The isNull guard matters: ``F.struct`` of
        children from a NULL parent yields a non-null struct of nulls."""
        if have == want:
            return expr
        if isinstance(want, T.ArrayType):
            # array-of-struct evolution: conform each element (transform is
            # a Catalyst HOF — per-row JVM work, no Python stage)
            if not isinstance(have, T.ArrayType):
                return F.lit(None).cast(want)
            return F.when(expr.isNull(), F.lit(None).cast(want)).otherwise(
                F.transform(
                    expr,
                    lambda x: LakeTable._conform(
                        x, have.elementType, want.elementType
                    ),
                )
            )
        if isinstance(want, T.StructType):
            if not isinstance(have, T.StructType):
                return F.lit(None).cast(want)
            have_map = {f.name: f.dataType for f in have.fields}
            parts = []
            for f in want.fields:
                if f.name in have_map:
                    parts.append(
                        LakeTable._conform(
                            expr.getField(f.name), have_map[f.name], f.dataType
                        ).alias(f.name)
                    )
                else:
                    parts.append(F.lit(None).cast(f.dataType).alias(f.name))
            return F.when(expr.isNull(), F.lit(None).cast(want)).otherwise(
                F.struct(*parts)
            )
        return expr.cast(want)

    def _reconcile(self, df: DataFrame, from_version: int) -> DataFrame:
        """Map a DataFrame written at an older schema version onto the current
        schema (Iceberg name-mapping lite): each CURRENT field resolves to
        its physical write-time name by reverse-chasing the rename history
        (never a forward in-place rename walk — a dropped column whose name
        a later rename reuses would collide), struct-field renames rewrite
        in place, missing columns/fields read as nulls, widened types cast
        up."""
        m = self.manifest

        def cur_name(name: str) -> str:
            # chase a history-time column spelling to the CURRENT name
            # (struct renames are recorded under the column name as of
            # their own epoch, which a later top-level rename may move)
            for r in m["renames"]:
                if r["old"] == name:
                    name = r["new"]
            return name

        for r in m.get("struct_renames", []):
            # the df still carries WRITE-TIME column names here: resolve
            # the struct column's current spelling back to the file version
            col = self._name_at_version(cur_name(r["column"]), from_version)
            if r["at_schema_version"] <= from_version or col not in df.columns:
                continue
            have = df.schema[col].dataType
            if isinstance(have, T.StructType) and r["old"] in have.fieldNames():
                df = df.withColumn(
                    col,
                    F.col(col)
                    .withField(r["new"], F.col(col).getField(r["old"]))
                    .dropFields(r["old"]),
                )
            elif (
                isinstance(have, T.ArrayType)
                and isinstance(have.elementType, T.StructType)
                and r["old"] in have.elementType.fieldNames()
            ):
                # array-of-struct: rename inside each element via transform
                # (the lambda must be unary — transform treats a second
                # parameter as the element index; it is invoked eagerly, so
                # capturing the loop bindings here is safe)
                old_f, new_f = r["old"], r["new"]
                df = df.withColumn(
                    col,
                    F.transform(
                        F.col(col),
                        lambda x: x.withField(
                            new_f, x.getField(old_f)
                        ).dropFields(old_f),
                    ),
                )
        cur = self.schema
        # incarnation fence (drop + re-add): a column (re-)added at schema
        # version A must read as NULL from files written BEFORE A even when
        # they physically carry a same-named column — that column is a
        # dropped earlier incarnation (Iceberg fences this with field ids;
        # the add history + version ordinals carry the same information).
        # Normal adds are unaffected: pre-add files lack the column anyway.
        born: dict[str, int] = {}
        for a in m.get("adds", []):
            name = a["name"]
            for r in m["renames"]:
                if r["at_schema_version"] > a["at_schema_version"] and r["old"] == name:
                    name = r["new"]
            born[name] = max(born.get(name, 0), a["at_schema_version"])
        cols = []
        for field in cur.fields:
            phys = self._name_at_version(field.name, from_version)
            if phys in df.columns and from_version >= born.get(field.name, 0):
                cols.append(
                    self._conform(
                        F.col(phys),
                        df.schema[phys].dataType,
                        field.dataType,
                    ).alias(field.name)
                )
            else:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        for sc in SYSTEM_COLS:
            cols.append(F.col(sc))
        return df.select(*cols)

    def _read_files(self, entries: list[dict]) -> DataFrame | None:
        """Read a set of manifest file entries, reconciling schema versions."""
        if not entries:
            return None
        by_ver: dict[int, list[str]] = {}
        for e in entries:
            by_ver.setdefault(e["schema_version"], []).append(
                os.path.join(self.path, e["path"])
            )
        parts = []
        for ver, files in sorted(by_ver.items()):
            raw = (
                self.spark.read.schema(self._physical_schema(ver))
                # explicit leaf files; disable partition-dir inference
                .option("recursiveFileLookup", "true")
                .parquet(*files)
            )
            parts.append(self._reconcile(raw, ver))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _lww_resolve(self, df: DataFrame) -> DataFrame:
        """Merge-on-read resolution: one surviving row per key, the max by
        the table's lww_order (same max_by aggregate as the CDC hot path —
        duplicated here rather than imported to keep the lakehouse layer
        free of cdc dependencies)."""
        key = self.key_col
        order = self.manifest.get("lww_order", ["warc_ts", "_lsn"])
        payload = [c for c in df.columns if c != key]
        out = df.groupBy(key).agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(*[F.col(c) for c in order]),
            ).alias("_w")
        )
        return out.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])

    def read(self, include_tombstones: bool = False) -> DataFrame:
        """Current snapshot as a DataFrame (user schema; tombstones filtered;
        delta files LWW-resolved when the table is in merge-on-read state)."""
        entries = [e for files in self.manifest["buckets"].values() for e in files]
        df = self._read_files(entries)
        if df is None:
            df = self._empty_df()
        if self.manifest.get("mor"):
            df = self._lww_resolve(df)
        if not include_tombstones:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).drop(
                *SYSTEM_COLS
            )
        return df

    def manifest_at(self, version: int) -> dict:
        """The committed manifest of an older snapshot (manifests are
        immutable and retained — this IS the time-travel metadata)."""
        p = os.path.join(self.path, "manifests", f"v{version:08d}.json")
        with open(p) as f:
            return json.load(f)

    def at_version(self, version: int, schema_from: "dict | None" = None) -> "LakeTable":
        """Time travel: a read-only view of the table at ``version``.

        ``schema_from``: optionally borrow a NEWER manifest's schema registry
        and rename history while keeping ``version``'s file lists — that
        reads the old snapshot's rows RECONCILED ONTO the newer schema
        (nulls for later-added columns, later renames applied), which is what
        a cross-version diff needs to compare rows by name. Iceberg analog:
        reading an old snapshot with the table's current schema.
        """
        m_old = self.manifest_at(version)
        m = m_old
        if schema_from is not None:
            m = {
                **schema_from,
                "buckets": m_old["buckets"],
                "mor": m_old.get("mor", False),
                "version": m_old["version"],
                "properties": m_old["properties"],
            }
            # per-bucket MOR state must track the OLD file lists too —
            # inheriting the newer manifest's mor_buckets would make
            # is_merge_on_read/mor_buckets on the time-travel view
            # misreport the old snapshot's resolve needs (advisor-caught).
            # A pre-tracking manifest OMITS the key so the legacy
            # every-nonempty-bucket fallback still applies to the view.
            m.pop("mor_buckets", None)
            if "mor_buckets" in m_old:
                m["mor_buckets"] = m_old["mor_buckets"]
        snap = LakeTable(self.spark, self.path)
        snap._manifest = m
        return snap

    def read_buckets(self, bucket_ids: list[int], resolve: bool = False) -> DataFrame:
        """Scan ONLY the named buckets (with system columns + tombstones) —
        the bucket-pruned side of the MERGE. ``resolve=True`` applies
        merge-on-read LWW resolution (raw duplicates otherwise; the COW merge
        resolves in its own aggregate anyway)."""
        wanted = set(bucket_ids)
        entries = [
            e
            for b, files in self.manifest["buckets"].items()
            if int(b) in wanted
            for e in files
        ]
        df = self._read_files(entries)
        df = df if df is not None else self._empty_df()
        if resolve and self.manifest.get("mor"):
            df = self._lww_resolve(df)
        return df

    def _current_name(self, name: str) -> str:
        """A column name chased forward through the rename history to its
        current spelling."""
        for r in self.manifest["renames"]:
            if r["old"] == name:
                name = r["new"]
        return name

    # ---------------------------------------------------------- metadata views

    def history(self) -> DataFrame:
        """Metadata view, one row per committed snapshot (Iceberg
        ``history``/``snapshots`` analog): version chain, commit wall
        clock, file/row counts, and the commit's lineage record. Built
        from the retained manifests — metadata only, no data scan. Row
        counts are exact when the table records zone maps (entries carry
        ``rows``), null otherwise."""
        rows = []
        for v in self.snapshot_versions():
            m = self.manifest_at(v)
            lin = m.get("lineage") or {}
            entries = [e for fs in m["buckets"].values() for e in fs]
            n_rows = (
                sum(e["rows"] for e in entries)
                if entries and all("rows" in e for e in entries)
                else None
            )
            if not lin:
                op = "create" if m.get("parent") is None else "commit"
            elif lin.get("compaction"):
                op = "compact"
            elif "rescale_parents" in lin or "rescale" in lin:
                op = "rescale"
            elif "schema_evolution" in lin:
                op = "evolve"
            elif "dedup_ingest" in lin or "emb_ingest" in lin:
                op = "dedup-ingest"
            elif "batch_id" in lin:
                op = "cdc-apply"
            else:
                op = "commit"
            rows.append(
                (
                    v,
                    m.get("parent"),
                    m.get("committed_at_ms"),
                    m.get("schema_version"),
                    len(entries),
                    n_rows,
                    bool(m.get("mor")),
                    op,
                    json.dumps(lin) if lin else None,
                )
            )
        return self.spark.createDataFrame(
            rows,
            "version int, parent int, committed_at_ms long, "
            "schema_version int, n_files int, n_rows long, mor boolean, "
            "operation string, lineage_json string",
        )

    def files(self, version: int | None = None) -> DataFrame:
        """Metadata view, one row per data file of a snapshot (Iceberg
        ``files`` analog): bucket, relative path, write-time schema
        version, row count and zone-map stats (JSON) when recorded.
        Metadata only — the scan-planning facts read_range prunes with,
        exposed for inspection."""
        m = self.manifest if version is None else self.manifest_at(version)
        rows = []
        for b, fs in sorted(m["buckets"].items(), key=lambda kv: int(kv[0])):
            for e in fs:
                rows.append(
                    (
                        int(b),
                        e["path"],
                        e["schema_version"],
                        e.get("rows"),
                        json.dumps(e["stats"]) if e.get("stats") else None,
                    )
                )
        return self.spark.createDataFrame(
            rows,
            "bucket int, path string, schema_version int, n_rows long, "
            "stats_json string",
        )

    def _name_at_version(self, current: str, ver: int) -> str:
        """A CURRENT column name as it was spelled at schema version
        ``ver`` (walks the rename history backwards; zone-map stats are
        recorded under write-time names)."""
        name = current
        for r in reversed(self.manifest["renames"]):
            if r["at_schema_version"] > ver and r["new"] == name:
                name = r["old"]
        return name

    def prune_entries(
        self, entries: list[dict], col: str, lo=None, hi=None
    ) -> tuple[list[dict], int]:
        """Zone-map file pruning: drop entries whose recorded [min, max]
        for ``col`` provably misses [lo, hi] (either bound may be None =
        unbounded). Entries without stats for the column are KEPT — pruning
        is only ever an optimization. Returns (kept, n_skipped)."""
        lo_e = _stats_encode(lo) if lo is not None else None
        hi_e = _stats_encode(hi) if hi is not None else None
        kept: list[dict] = []
        skipped = 0
        for e in entries:
            st = (e.get("stats") or {}).get(
                self._name_at_version(col, e["schema_version"])
            )
            try:
                miss = st is not None and (
                    (hi_e is not None and st[0] > hi_e)
                    or (lo_e is not None and st[1] < lo_e)
                )
            except TypeError:
                # bound type doesn't order against the stored encoding
                # (e.g. a string bound on a timestamp column) — pruning is
                # an optimization, so KEEP the file; the DataFrame filter
                # will raise/compare per SQL semantics downstream
                miss = False
            if miss:
                skipped += 1
                continue
            kept.append(e)
        return kept, skipped

    def _bloom_might_contain(self, fp: str, col_name: str, value) -> bool | None:
        """One file's parquet bloom-filter verdict for ``col_name == value``:
        False means the value is PROVABLY absent (safe to skip the file),
        True means it may be present, None means no determination (a row
        group without a bloom — e.g. a fully dictionary-encoded chunk, where
        parquet-mr drops the bloom because dictionary filtering is already
        exact — an unsupported physical type, or a read error).

        Driver-side via the running JVM's parquet-mr (the same classes the
        executor-side reader uses for bloom row-group skipping): only the
        footer and the bloom bytes are read, never data pages. The hash is
        parquet-mr's own (xxhash64 seed 0 over the PLAIN encoding),
        dispatched on the FILE's physical type so widened columns (int32
        files under a now-bigint schema) still test correctly.

        The hash is computed through parquet's shaded openhft
        ``LongHashFunction`` (width-named methods: hashLong/hashInt/
        hashBytes) and NEVER through ``bloom.hash(...)``: py4j auto-unboxes
        java.lang.Long returns to Python ints and re-converts small ints as
        java ``int``, silently selecting the ``hash(int)`` overload — an
        INT64 value below 2^31 then hashes as 4 bytes instead of 8 and
        every membership test false-negatives (found the hard way; pinned
        in tests/test_bloom.py with planted SMALL keys)."""
        jvm = self.spark._jvm
        try:
            hasher = jvm.shaded.parquet.net.openhft.hashing.LongHashFunction.xx(0)
        except Exception:
            return None
        try:
            reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
                jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                    jvm.org.apache.hadoop.fs.Path(fp),
                    self.spark._jsc.hadoopConfiguration(),
                )
            )
        except Exception:
            return None
        try:
            blocks = reader.getFooter().getBlocks()
            hit = False
            for gi in range(blocks.size()):
                cols = blocks.get(gi).getColumns()
                meta = None
                for ci in range(cols.size()):
                    c = cols.get(ci)
                    if c.getPath().toDotString() == col_name:
                        meta = c
                        break
                if meta is None:
                    return None
                bloom = reader.readBloomFilter(meta)
                if bloom is None:
                    return None
                phys = meta.getPrimitiveType().getPrimitiveTypeName().toString()
                if phys == "INT64":
                    h = hasher.hashLong(int(value))
                elif phys == "INT32":
                    iv = int(value)
                    if not (-(2**31) <= iv < 2**31):
                        continue  # out of int32 range: absent from this chunk
                    h = hasher.hashInt(iv)
                elif phys == "BINARY" and isinstance(value, str):
                    h = hasher.hashBytes(bytearray(value.encode("utf-8")))
                else:
                    return None
                if bloom.findHash(h):
                    hit = True
            return hit
        except Exception:
            return None
        finally:
            try:
                reader.close()
            except Exception:  # pragma: no cover
                pass

    def bloom_prune_entries(
        self, entries: list[dict], col: str, value
    ) -> tuple[list[dict], int]:
        """Bloom-filter FILE pruning for a point predicate ``col == value``:
        drop entries whose blooms prove the value absent from every row
        group. The complement of zone-map pruning: min/max never prunes a
        hash-distributed key (every file spans the keyspace), a bloom
        prunes exactly there. Entries are KEPT on any doubt — pruning is
        only ever an optimization. Returns (kept, n_skipped)."""
        if value is None:
            return entries, 0
        kept: list[dict] = []
        skipped = 0
        for e in entries:
            name = self._name_at_version(col, e["schema_version"])
            verdict = self._bloom_might_contain(
                os.path.join(self.path, e["path"]), name, value
            )
            if verdict is False:
                skipped += 1
            else:
                kept.append(e)
        return kept, skipped

    def read_range(
        self, col: str, lo=None, hi=None, include_tombstones: bool = False
    ) -> DataFrame:
        """``read()`` restricted to ``lo <= col <= hi`` (either bound may
        be None), with manifest-level FILE pruning by the table's zone maps
        before the scan plans — the beyond-bucket-pruning scan path for
        range predicates the bucket hash can't help with (time windows over
        ``warc_ts``, incremental ``_lsn`` sweeps). Semantically identical
        to ``read().filter(col BETWEEN lo AND hi)`` (pinned in
        tests/test_zonemaps.py): surviving files still apply the predicate
        (parquet row-group pushdown inside them), null values never match,
        and MOR buckets skip file pruning entirely (their winner is only
        known after resolving ALL delta files, so dropping one by value
        range could resurrect an older row — the filter still applies after
        resolution)."""
        pred_col = col
        if col not in {f.name for f in self.schema.fields} | set(SYSTEM_COLS):
            raise ValueError(f"read_range: unknown column {col!r}")
        mor_set = self.mor_buckets if self.manifest.get("mor") else set()
        entries: list[dict] = []
        for b, files in self.manifest["buckets"].items():
            if int(b) in mor_set:
                entries.extend(files)
            else:
                kept, _ = self.prune_entries(files, col, lo, hi)
                entries.extend(kept)
        df = self._read_files(entries)
        if df is None:
            df = self._empty_df()
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col(pred_col) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(pred_col) <= F.lit(hi))
        if self.manifest.get("mor"):
            df = self._lww_resolve(df).filter(pred)
        else:
            df = df.filter(pred)
        if not include_tombstones:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).drop(
                *SYSTEM_COLS
            )
        return df

    def bucket_expr(self, col: str | None = None) -> F.Column:
        """The bucket id of a key value: pmod(xxhash64(key), n_buckets)."""
        return F.pmod(F.xxhash64(F.col(col or self.key_col)), F.lit(self.n_buckets))

    # ------------------------------------------------------------- write path

    def replace_buckets(
        self,
        df_with_bucket: DataFrame,
        touched_buckets: list[int],
        properties: dict[str, str] | None = None,
        lineage: dict | None = None,
        max_rows_per_file: int | None = None,
    ) -> int:
        """Copy-on-write commit: ``df_with_bucket`` (physical schema + a
        ``_bucket`` int column) becomes the new content of ``touched_buckets``;
        all other buckets carry over untouched. Returns the new version.
        ``max_rows_per_file`` bounds output file size (sorted-compaction
        path — see :meth:`compact`)."""
        m = self._next_manifest()
        txid = f"tx-{m['version']:08d}-{uuid.uuid4().hex[:8]}"
        tx_rel = os.path.join("data", txid)
        tx_dir = os.path.join(self.path, tx_rel)

        # No repartition before the write: Spark's dynamic-partition writer
        # routes rows to bucket directories per task (concurrent writers, or
        # a local sort past 64 buckets/task — session.py), so skipping the
        # extra full shuffle of the merged output saves the single largest
        # data movement of a MERGE. Cost: up to one file per (task x bucket)
        # per snapshot instead of one per bucket — bounded by compact().
        t_exec = time.monotonic()
        self._table_write(df_with_bucket, tx_dir, max_rows_per_file)
        t_commit = time.monotonic()

        # Map the written files back into the manifest, bucket by bucket.
        new_files = self._collect_written_files(tx_dir, m["schema_version"])
        stray = set(new_files) - set(touched_buckets)
        if stray:
            raise ValueError(
                f"replace_buckets: rows landed in buckets {sorted(stray)} "
                f"outside touched_buckets {sorted(touched_buckets)} — refusing "
                f"to commit (the stray rows would be silently orphaned)"
            )
        for b in touched_buckets:
            m["buckets"][str(b)] = new_files.get(b, [])
        if properties:
            m["properties"].update(properties)
        m["lineage"] = lineage
        # phase attribution (Spark write job vs driver-side commit work),
        # recorded INTO the caller's lineage record rather than a new
        # attribute: the CDC loop reads tables only through the
        # UpsertTarget seam (tests/test_interface.py), and lineage is
        # already the seam's advisory side-channel
        if lineage is not None:
            lineage["write_phases"] = {
                "write_exec_ms": int((t_commit - t_exec) * 1000),
                "commit_ms": int((time.monotonic() - t_commit) * 1000),
            }
        self._write_manifest(m)
        self._manifest = m
        return m["version"]

    def append_delta_buckets(
        self,
        df_with_bucket: DataFrame,
        touched_buckets: list[int],
        properties: dict[str, str] | None = None,
        lineage: dict | None = None,
    ) -> tuple[int, list[str]]:
        """Merge-on-read commit: APPEND the rows as delta files to the
        touched buckets (no read, no rewrite — write cost is O(batch), not
        O(bucket)). Readers LWW-resolve per key until :meth:`compact` folds
        the deltas. Returns (new version, relpaths of the added files)."""
        m = self._next_manifest()
        txid = f"tx-{m['version']:08d}-{uuid.uuid4().hex[:8]}"
        tx_dir = os.path.join(self.path, "data", txid)
        self._table_write(df_with_bucket, tx_dir)
        written = self._collect_written_files(tx_dir, m["schema_version"])
        added: list[str] = []
        for b, entries in written.items():
            m["buckets"].setdefault(str(b), []).extend(entries)
            added.extend(e["path"] for e in entries)
        m["mor"] = True
        prior = set(m.get("mor_buckets", []))
        m["mor_buckets"] = sorted(prior | set(written))
        if properties:
            m["properties"].update(properties)
        m["lineage"] = lineage
        self._write_manifest(m)
        self._manifest = m
        return m["version"], added

    def append_buckets(
        self,
        df_with_bucket: DataFrame,
        properties: dict[str, str] | None = None,
        lineage: dict | None = None,
    ) -> int:
        """APPEND-ONLY commit: add the rows as new files to their buckets
        with NO merge-on-read marking — for tables whose key is a ROUTING
        key rather than a unique row key (e.g. the dedup signature index:
        many (bucket_key, doc_id) rows share one LSH bucket, so MOR's
        per-key LWW resolution would silently collapse them). The caller
        owns row-level uniqueness (the deduper's batch gate guarantees each
        batch lands exactly once); ``compact`` folds files without
        resolution on a non-MOR table. Write cost is O(batch) like the MOR
        path. Returns the new version."""
        m = self._next_manifest()
        txid = f"tx-{m['version']:08d}-{uuid.uuid4().hex[:8]}"
        tx_dir = os.path.join(self.path, "data", txid)
        self._table_write(df_with_bucket, tx_dir)
        for b, entries in self._collect_written_files(
            tx_dir, m["schema_version"]
        ).items():
            m["buckets"].setdefault(str(b), []).extend(entries)
        if properties:
            m["properties"].update(properties)
        m["lineage"] = lineage
        self._write_manifest(m)
        self._manifest = m
        return m["version"]

    def append_bucketed(
        self,
        df: DataFrame,
        properties: dict[str, str] | None = None,
        lineage: dict | None = None,
    ) -> int:
        """Bulk load (pristine initial snapshot): bucket the rows and write
        every bucket. ``df`` is in user schema; system columns defaulted."""
        full = df
        if "_lsn" not in full.columns:
            full = full.withColumn("_lsn", F.lit(0).cast("long"))
        if "_deleted" not in full.columns:
            full = full.withColumn("_deleted", F.lit(False))
        full = full.withColumn("_bucket", self.bucket_expr())
        return self.replace_buckets(
            full, list(range(self.n_buckets)), properties, lineage
        )

    def compact(
        self,
        bucket_ids: list[int] | None = None,
        sort_by: list[str] | None = None,
        max_rows_per_file: int | None = None,
        conflict_retries: int = 3,
    ) -> int:
        """Maintenance: fold each chosen bucket into one file per bucket —
        LWW-resolving merge-on-read deltas (one surviving row per key) and
        bounding the read amplification both write paths accumulate. A full
        compaction clears the table's merge-on-read state.

        CLUSTERED compaction (the OPTIMIZE ... ZORDER-lite this table
        format supports): ``sort_by`` orders rows by those columns within
        each bucket (a per-partition sort — no extra shuffle beyond the
        bucket repartition that's already here), and ``max_rows_per_file``
        splits each bucket into bounded sorted runs. Together with
        ``stats_cols`` zone maps this makes every output file cover a
        NARROW slice of the sort key, so ``read_range`` on that key prunes
        most of a bucket instead of reading all of it — the way a 100-TB
        table keeps time-window scans O(window), not O(table). Row order
        inside a snapshot is semantically free (reads LWW-resolve or are
        already one-row-per-key), so clustering never changes results
        (pinned in tests/test_sorted_compaction.py).

        CONCURRENCY: compaction racing a live writer (a maintenance CLI
        against a running cdc-run) loses the optimistic commit and, being
        a pure content-preserving fold, simply refreshes and recomputes —
        up to ``conflict_retries`` times (Iceberg's rewrite_data_files
        retry analog). The losing attempt's files are invisible orphans
        (vacuum collects them). tests/test_conflicts.py."""
        return retry_conflicts(
            lambda: self._compact_once(bucket_ids, sort_by, max_rows_per_file),
            conflict_retries,
            lambda _e: self.refresh(),
        )

    def _compact_once(
        self,
        bucket_ids: list[int] | None,
        sort_by: list[str] | None,
        max_rows_per_file: int | None,
    ) -> int:
        buckets = bucket_ids if bucket_ids is not None else [
            int(b) for b, files in self.manifest["buckets"].items() if files
        ]
        if not buckets:
            return self.version
        df = self.read_buckets(buckets, resolve=True).withColumn(
            "_bucket", self.bucket_expr()
        )
        compacted = df.repartition(len(buckets), F.col("_bucket"))
        if sort_by:
            compacted = compacted.sortWithinPartitions("_bucket", *sort_by)
        version = self.replace_buckets(
            compacted,
            buckets,
            lineage={
                "compaction": True,
                "buckets": buckets,
                **({"sort_by": sort_by} if sort_by else {}),
            },
            max_rows_per_file=max_rows_per_file,
        )
        # per-bucket accounting: compacted buckets are resolved; the global
        # flag clears when NO bucket holds deltas (review-caught: a single
        # global bool forced a full-table resolve on every read forever
        # after any PARTIAL compaction — steady-state auto-compaction never
        # compacts every bucket at once)
        remaining = sorted(self.mor_buckets - set(buckets))
        if self.is_merge_on_read:
            m = self._next_manifest()
            m["mor_buckets"] = remaining
            m["mor"] = bool(remaining)
            m["lineage"] = {
                "compaction_mor_buckets_cleared": sorted(set(buckets)),
                "mor_buckets_remaining": remaining,
            }
            self._write_manifest(m)
            self._manifest = m
            version = m["version"]
        return version

    def rescale(
        self, target_n_buckets: int, parents_per_commit: int | None = None
    ) -> int:
        """Maintenance: grow ``n_buckets`` to ``target_n_buckets`` (an exact
        multiple of the current count) — the missing migration path when the
        "one bucket ~ a few GB" sizing rule breaks at 10x data growth.

        ``pmod(h, n*k) mod n == pmod(h, n)``, so each parent bucket p's keys
        land exactly in child buckets {p, p+n, ..., p+(k-1)n}: the rewrite
        is per-parent local (no cross-parent shuffle of the whole table) and
        proceeds in CHUNKS of parents, one commit per chunk:

        - phase 1 (per chunk): read the parent buckets (LWW-resolving
          merge-on-read deltas like :meth:`compact` — a rescaled parent
          leaves MOR state), rewrite their rows into child-tagged files,
          and commit a manifest that still keys them under the PARENT id
          with a ``child_bucket`` tag per entry. Every intermediate
          manifest is fully consistent — ``n_buckets`` is unchanged, a
          parent's file set is the union of its child files — so the table
          stays readable (and even bucket-pruned-readable) THROUGHOUT.
        - phase 2: one metadata-only commit flips ``n_buckets`` and re-keys
          every entry by its child tag. Atomic like every commit.

        Idempotent on crash-retry: re-running ``rescale(target)`` resumes
        from the manifest's progress state (parents whose entries all carry
        child tags are done; a concurrent COW merge that rewrote a parent
        mid-migration strips its tags, and that parent is simply migrated
        again — self-healing). A completed rescale re-run is a no-op.
        Like ``compact``, run it without concurrent writers for efficiency;
        correctness survives interleaving because visibility is manifest-
        atomic either way."""
        n_old = self.n_buckets
        if target_n_buckets == n_old and "rescale" not in self.manifest:
            return self.version  # completed (or never needed) — no-op replay
        state = self.manifest.get("rescale")
        if state is not None and state["target"] != target_n_buckets:
            raise ValueError(
                f"rescale to {target_n_buckets} conflicts with in-progress "
                f"rescale to {state['target']}"
            )
        if state is None:
            if target_n_buckets <= n_old or target_n_buckets % n_old != 0:
                raise ValueError(
                    f"target_n_buckets must be a multiple of {n_old} "
                    f"greater than it (got {target_n_buckets})"
                )

        def done_parents(m: dict) -> set[int]:
            listed = set(m.get("rescale", {}).get("migrated", []))
            return {
                p
                for p in listed
                if all(
                    "child_bucket" in e for e in m["buckets"].get(str(p), [])
                )
            }

        todo = sorted(
            int(b)
            for b, files in self.manifest["buckets"].items()
            if files and int(b) not in done_parents(self.manifest)
        )
        chunk = parents_per_commit or max(len(todo), 1)
        while todo:
            batch, todo = todo[:chunk], todo[chunk:]
            df = self.read_buckets(batch, resolve=True)
            child = F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(target_n_buckets))
            dfb = df.withColumn("_bucket", child).repartition(
                max(len(batch) * (target_n_buckets // n_old), 1), F.col("_bucket")
            )
            m = self._next_manifest()
            txid = f"tx-{m['version']:08d}-{uuid.uuid4().hex[:8]}"
            tx_dir = os.path.join(self.path, "data", txid)
            self._table_write(dfb, tx_dir)
            new_files: dict[int, list[dict]] = {p: [] for p in batch}
            for c, entries in self._collect_written_files(
                tx_dir, m["schema_version"]
            ).items():
                p = c % n_old
                if p not in new_files:
                    raise ValueError(
                        f"rescale: child bucket {c} maps to parent {p} "
                        f"outside this chunk {batch} — refusing to commit"
                    )
                new_files[p].extend({**e, "child_bucket": c} for e in entries)
            for p in batch:
                m["buckets"][str(p)] = new_files[p]
            m["rescale"] = {
                "target": target_n_buckets,
                "migrated": sorted(
                    set(m.get("rescale", {}).get("migrated", [])) | set(batch)
                ),
            }
            remaining_mor = sorted(self.mor_buckets - set(batch))
            m["mor_buckets"] = remaining_mor
            m["mor"] = bool(remaining_mor)
            m["lineage"] = {"rescale_parents": batch, "target": target_n_buckets}
            self._write_manifest(m)
            self._manifest = m
        # phase 2: metadata-only cutover
        m = self._next_manifest()
        new_buckets: dict[str, list[dict]] = {}
        for _b, files in m["buckets"].items():
            for e in files:
                c = e["child_bucket"]  # all parents migrated by construction
                new_buckets.setdefault(str(c), []).append(
                    {k: v for k, v in e.items() if k != "child_bucket"}
                )
        m["buckets"] = new_buckets
        m["n_buckets"] = target_n_buckets
        m.pop("rescale", None)
        m["lineage"] = {
            "rescale_finalized": {"from": n_old, "to": target_n_buckets}
        }
        self._write_manifest(m)
        self._manifest = m
        return m["version"]

    # ----------------------------------------------------------- retention

    def expire_snapshots(self, keep_last: int = 10) -> list[int]:
        """Delete manifests older than the newest ``keep_last`` snapshots
        (Iceberg ``expire_snapshots`` analog). Time travel, changelog spans
        and IVM feeds reaching past the horizon fail loudly afterwards —
        run retention BEHIND the changelog's emission point (the feed
        directory's markers name it). The current snapshot is never
        expired. Returns the expired version numbers.

        Crash-safe: manifests are self-contained immutable files, so
        deletion order doesn't matter and a re-run just deletes less."""
        versions = self.snapshot_versions()
        expired = versions[:-keep_last] if keep_last > 0 else versions[:-1]
        for v in expired:
            try:
                os.unlink(os.path.join(self.path, "manifests", f"v{v:08d}.json"))
            except FileNotFoundError:  # pragma: no cover - concurrent expire
                pass
        return expired

    def vacuum(self, older_than_s: float = 3600.0) -> list[str]:
        """Delete data files no RETAINED manifest references (Iceberg
        ``remove_orphan_files`` analog). Orphans come from two places, both
        invisible by construction: crashes between data write and manifest
        publish (incl. committer-v2 partial task output), and
        :meth:`expire_snapshots` dropping the last manifest that referenced
        a file. ``older_than_s`` is the safety horizon: files younger than
        it are kept even when unreferenced, because a CONCURRENT writer's
        uncommitted transaction looks exactly like an orphan until its
        manifest publishes (Iceberg's remove_orphan_files has the same
        guard for the same reason). Returns deleted relpaths."""
        import time as _time

        referenced: set[str] = set()
        for v in self.snapshot_versions():
            m = self.manifest_at(v)
            for files in m["buckets"].values():
                for e in files:
                    referenced.add(e["path"])
                    # Hadoop LocalFS writes a `.{name}.crc` checksum twin
                    # next to each data file; it lives and dies with it
                    d, base = os.path.split(e["path"])
                    referenced.add(os.path.join(d, f".{base}.crc"))
        deleted: list[str] = []
        cutoff = _time.time() - older_than_s
        data_root = os.path.join(self.path, "data")
        # Snapshot every directory's mtime BEFORE deleting anything: our own
        # unlinks bump the containing dir's mtime and a child rmdir bumps
        # the parent's, which would make stale trees look fresh and strand
        # empty tx directories across runs (review-caught, round 3).
        dir_mtimes: dict[str, float] = {}
        for dirpath, _dirs, _files in os.walk(data_root):
            try:
                dir_mtimes[dirpath] = os.path.getmtime(dirpath)
            except OSError:  # pragma: no cover - racer
                pass
        pruned_dirs: set[str] = set()
        for dirpath, _dirs, files in os.walk(data_root, topdown=False):
            dir_was_stale = dir_mtimes.get(dirpath, cutoff + 1) <= cutoff
            deleted_here = 0
            for fn in files:
                fp = os.path.join(dirpath, fn)
                rel = os.path.relpath(fp, self.path)
                if rel in referenced:
                    continue
                try:
                    if os.path.getmtime(fp) > cutoff:
                        continue
                    os.unlink(fp)
                    deleted.append(rel)
                    deleted_here += 1
                except FileNotFoundError:  # pragma: no cover - racer
                    continue
            # prune now-empty transaction directories when the dir was
            # already stale OR we just emptied it of stale content (files
            # or child dirs of a dead transaction). A freshly created
            # EMPTY staging dir is neither — a concurrent writer's
            # in-flight output stays untouched; rmdir's ENOTEMPTY guards
            # against files landing between the unlink and the prune.
            emptied_children = any(
                os.path.dirname(d) == dirpath for d in pruned_dirs
            )
            if dirpath != data_root and (
                dir_was_stale or deleted_here or emptied_children
            ):
                try:
                    os.rmdir(dirpath)
                    pruned_dirs.add(dirpath)
                except OSError:
                    pass
        return deleted

    # ---------------------------------------------------------------- purge

    def _purge_keys_df(self, keys) -> DataFrame:
        """Normalize a purge key set (list or one-column DataFrame) into a
        distinct one-column DataFrame named/typed like the key column."""
        return self._values_df(self.key_col, keys)

    def _append_suppression(self, keys_df: DataFrame) -> None:
        """Append keys to the table's suppression ledger (parquet files
        under ``<root>/suppression/``; duplicates are harmless — readers
        distinct). Written BEFORE the purge rewrite commits so a crash
        between the two leaves suppression ACTIVE-pending (rows remain but
        a purge re-run heals) rather than rows-gone-but-resurrectable."""
        import shutil

        d = os.path.join(self.path, "suppression")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-suppress-{uuid.uuid4().hex[:8]}")
        keys_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        try:
            for fp in sorted(glob.glob(os.path.join(tmp, "*.parquet"))):
                os.replace(
                    fp, os.path.join(d, f"purge-{uuid.uuid4().hex[:12]}.parquet")
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def suppressed_keys(self) -> "DataFrame | None":
        """Distinct keys in the suppression ledger, or None when the table
        has never been purged. The existence probe is one driver-side
        glob — tables that never purge pay nothing on the CDC hot path."""
        files = glob.glob(os.path.join(self.path, "suppression", "*.parquet"))
        if not files:
            return None
        return (
            self.spark.read.parquet(*files).select(self.key_col).distinct()
        )

    def _purge_candidates(
        self, entries: list[dict], values: list, col: "str | None" = None
    ) -> tuple[list[dict], list[dict]]:
        """Split file entries into (may contain ANY of ``values``, provably
        clean) for ``col`` (default: the key column) — zone maps first,
        then parquet blooms, kept on any doubt. Each file is probed
        against at most one value once it's known hit (hits move out of
        the probe set)."""
        col = col or self.key_col
        remaining = list(entries)
        hits: list[dict] = []
        for v in values:
            if not remaining:
                break
            kz, _ = self.prune_entries(remaining, col, lo=v, hi=v)
            if col in (self.manifest.get("bloom_cols") or []):
                kz, _ = self.bloom_prune_entries(kz, col, v)
            hit_paths = {e["path"] for e in kz}
            if hit_paths:
                hits.extend(e for e in remaining if e["path"] in hit_paths)
                remaining = [e for e in remaining if e["path"] not in hit_paths]
        return hits, remaining

    def purge_keys(
        self,
        keys,
        file_prune: bool = True,
        conflict_retries: int = 3,
        record_suppression: bool = True,
    ) -> int:
        """Right-to-be-forgotten erasure (takedowns, robots revocations):
        physically REMOVE every stored row — tombstones and merge-on-read
        delta versions included — whose key is in ``keys`` from the current
        snapshot, and record the keys in the suppression ledger so future
        change events for them are dropped at the apply gate (the CDC layer
        reads :meth:`suppressed_keys`; see cdc/apply.py). One atomic
        commit: rewritten buckets + the bumped ``purge.epoch`` property.

        Scale shape: keys hash to buckets, and within each touched bucket
        only the files whose zone maps / parquet blooms cannot rule the key
        out are rewritten (``file_prune=True``) — on a bloom-indexed key a
        purge of k URLs rewrites ~k files out of a 100-TB table, never the
        buckets wholesale. The key list is collected driver-side to drive
        file pruning (bounded: purge sets are takedown-scale); for purge
        sets too large to collect pass ``file_prune=False`` — keys stay
        distributed and every file of every bucket rewrites via one
        anti-join.

        Erasure across RETAINED HISTORY is completed by retention, exactly
        as in Iceberg/Delta: older snapshots still reference the pre-purge
        files until ``expire_snapshots`` + ``vacuum`` drop them —
        :meth:`verify_purged` reports which retained versions still hold
        matching rows. Key RENAME evolution after rows were written is not
        supported under purge (keys are located by current name).

        CONCURRENCY: a purge racing a live writer loses the optimistic
        commit, refreshes and recomputes (the anti-join rewrite is
        idempotent against any newer state; the ledger append happened
        once, before the first attempt) — up to ``conflict_retries``
        times. tests/test_conflicts.py.

        ``record_suppression=False`` skips the ledger and the epoch bump —
        for tables whose keys are never re-submitted by construction (e.g.
        a dedup corpus behind a monotone-id gate), where suppression state
        would only accumulate dead weight.

        Returns the committed version."""
        kdf = self._purge_keys_df(keys)
        if record_suppression:
            self._append_suppression(kdf)
        return retry_conflicts(
            lambda: self._purge_once(
                kdf, self.key_col, file_prune,
                arm_suppression=record_suppression,
            ),
            conflict_retries,
            lambda _e: self.refresh(),
        )

    def purge_matching(
        self,
        col: str,
        values,
        file_prune: bool = True,
        conflict_retries: int = 3,
    ) -> int:
        """Erasure by a NON-KEY column — the provenance variant of
        :meth:`purge_keys` (e.g. a dedup corpus whose rows carry the
        source url in a ``src_key`` column). Values can't route to
        buckets (they don't hash the key), so every bucket's files are
        PROBED — still file-pruned by the column's zone maps / blooms
        when recorded (create the table with ``bloom_filter_cols``
        including the column), so the rewrite stays ~O(files containing
        the values). No suppression ledger and no purge.epoch bump: those
        gate FUTURE key-routed events, which a non-key purge does not
        define. Same conflict-rebase loop as purge_keys."""
        if col not in self.schema.names:
            raise ValueError(f"purge_matching: unknown column {col!r}")
        kdf = self._values_df(col, values)
        return retry_conflicts(
            lambda: self._purge_once(kdf, col, file_prune),
            conflict_retries,
            lambda _e: self.refresh(),
        )

    def _values_df(self, col: str, values) -> DataFrame:
        ctype = self.schema[col].dataType
        if isinstance(values, DataFrame):
            src = F.col(values.columns[0])
            # a key that NULLS OUT under the cast (e.g. a non-numeric
            # string against a long key column) would silently vanish
            # from the purge set — a right-to-be-forgotten request that
            # erases nothing, with no error and no lineage trace
            # (advisor-caught). One bounded count per purge (purges are
            # rare admin ops) buys the loud failure.
            cast_df = values.select(
                src.alias("_raw"), src.cast(ctype).alias(col)
            )
            n_bad = cast_df.where(
                F.col("_raw").isNotNull() & F.col(col).isNull()
            ).count()
            if n_bad:
                raise ValueError(
                    f"purge: {n_bad} key value(s) do not cast to {col!r}'s "
                    f"type {ctype.simpleString()} and would silently be "
                    "dropped from the purge set — fix the inputs"
                )
            vdf = cast_df.select(col)
        else:
            vdf = self.spark.createDataFrame(
                [(v,) for v in values], T.StructType([T.StructField(col, ctype)])
            )
        return vdf.where(F.col(col).isNotNull()).distinct()

    def _purge_once(
        self,
        kdf: DataFrame,
        col: str,
        file_prune: bool,
        arm_suppression: bool = False,
    ) -> int:
        by_key = col == self.key_col
        m = self._next_manifest()
        if by_key and file_prune:
            # key values route to their buckets: probe only those
            rows = kdf.withColumn("_b", self.bucket_expr()).collect()
            by_bucket: dict[int, list] = {}
            for r in rows:
                by_bucket.setdefault(int(r["_b"]), []).append(r[col])
            n_keys = len(rows)
        elif by_key:
            brows = (
                kdf.select(self.bucket_expr().alias("_b"))
                .distinct()
                .collect()
            )
            by_bucket = {int(r["_b"]): [] for r in brows}  # [] = probe all
            n_keys = kdf.count()
        else:
            # non-key purge: values can land in ANY bucket; every bucket's
            # files are probed (and zone/bloom-pruned per value)
            vals = [r[col] for r in kdf.collect()] if file_prune else []
            by_bucket = {
                int(b): vals for b, fs in m["buckets"].items() if fs
            }
            n_keys = len(vals) if file_prune else kdf.count()

        candidates: list[dict] = []
        survivors: dict[int, list[dict]] = {}
        for b, vals in sorted(by_bucket.items()):
            entries = m["buckets"].get(str(b), [])
            if not entries:
                continue
            if file_prune:
                hit, clean = self._purge_candidates(entries, vals, col)
            else:
                hit, clean = list(entries), []
            if hit:
                candidates.extend(hit)
                survivors[b] = clean

        lineage = {
            "purge": True,
            "col": col,
            "n_keys": int(n_keys),
            "buckets": sorted(survivors),
            "files_rewritten": len(candidates),
        }
        if arm_suppression:
            # ledger-recorded key purges arm apply-side suppression;
            # non-key and no-ledger purges gate nothing downstream
            m["properties"][PURGE_EPOCH_PROP] = str(
                int(m["properties"].get(PURGE_EPOCH_PROP, "0")) + 1
            )
        m["lineage"] = lineage
        if not candidates:
            # nothing stored matches — the metadata-only commit still bumps
            # purge.epoch (key purges) so suppression activates
            self._write_manifest(m)
            self._manifest = m
            return m["version"]

        txid = f"tx-{m['version']:08d}-{uuid.uuid4().hex[:8]}"
        tx_dir = os.path.join(self.path, "data", txid)
        # broadcast only when the key set was driver-collected anyway
        # (file_prune): the file_prune=False escape hatch exists for purge
        # sets too large to materialize on the driver, and a broadcast
        # hint there would defeat it (review-caught)
        anti = F.broadcast(kdf) if file_prune else kdf
        kept = (
            self._read_files(candidates)
            .join(anti, on=col, how="left_anti")
            .withColumn("_bucket", self.bucket_expr())
        )
        self._table_write(kept, tx_dir)
        new_files = self._collect_written_files(tx_dir, m["schema_version"])
        stray = set(new_files) - set(survivors)
        if stray:
            raise ValueError(
                f"purge: rows landed in buckets {sorted(stray)} outside "
                f"the touched set {sorted(survivors)} — refusing to commit"
            )
        for b, clean in survivors.items():
            m["buckets"][str(b)] = clean + new_files.get(b, [])
        self._write_manifest(m)
        self._manifest = m
        return m["version"]

    def verify_purged(self, keys) -> dict[int, int]:
        """Erasure audit: for each RETAINED snapshot version, the number of
        stored rows (tombstones included) whose key is in ``keys``. Empty
        dict == erasure is complete across retained history. Pre-purge
        versions holding rows are EXPECTED until ``expire_snapshots`` +
        ``vacuum`` run — this is the check that tells you when to run them
        (and that they worked). File-pruned per version via zone maps and
        blooms, so post-retention audits read ~no data."""
        kdf = self._purge_keys_df(keys)
        values = [r[self.key_col] for r in kdf.collect()]
        out: dict[int, int] = {}
        for v in self.snapshot_versions():
            snap = self.at_version(v)
            entries = [
                e for files in snap.manifest["buckets"].values() for e in files
            ]
            cand, _ = snap._purge_candidates(entries, values)
            if not cand:
                continue
            df = snap._read_files(cand)
            n = df.join(F.broadcast(kdf), on=self.key_col, how="left_semi").count()
            if n:
                out[v] = int(n)
        return out

    def lookup(self, key_value) -> DataFrame:
        """Point read: the current row(s) for one key, touching ONLY the
        bucket the key hashes into — at 100 TB this reads a few files, not
        the table. When the table records key zone maps (``stats_cols``
        includes the key) the bucket's files additionally prune by the
        key's [min, max] — on a key-clustered bucket
        (``compact(sort_by=[key])``) that is ONE file. Skipped for MOR
        buckets (all delta files participate in resolution). Returns 0 or
        1 rows (post LWW-resolution, tombstones filtered)."""
        # cast the literal to the KEY COLUMN's type before hashing: Spark's
        # xxhash64 hashes int and bigint differently, so an uncast Python int
        # literal would land in the wrong bucket for a bigint key
        # (review-caught)
        key_type = self.schema[self.key_col].dataType
        bucket = (
            self.spark.range(1)
            .select(
                F.pmod(
                    F.xxhash64(F.lit(key_value).cast(key_type)),
                    F.lit(self.n_buckets),
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        b = int(bucket)
        entries = self.manifest["buckets"].get(str(b), [])
        mor = self.manifest.get("mor") and b in self.mor_buckets
        if not mor:
            entries, _ = self.prune_entries(
                entries, self.key_col, key_value, key_value
            )
            # bloom pruning after zone maps: on an unclustered table the
            # key's [min, max] spans the keyspace in every file, so the
            # bloom is the only metadata that can prove absence. O(bucket
            # files) footer+bloom reads, no data pages.
            if self.key_col in (self.manifest.get("bloom_cols") or []):
                entries, _ = self.bloom_prune_entries(
                    entries, self.key_col, key_value
                )
        df = self._read_files(entries)
        if df is None:
            df = self._empty_df()
        elif mor:
            df = self._lww_resolve(df)
        return (
            df.filter(F.col(self.key_col) == key_value)
            .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
            .drop(*SYSTEM_COLS)
        )

    # ------------------------------------------------------------ time travel

    def snapshot(self, version: int) -> "LakeTable":
        """Time travel: a read-only view of the table at an earlier snapshot
        (alias of :meth:`at_version` kept for the original API)."""
        return self.at_version(version)

    # ------------------------------------------------------------- evolution

    def evolve_schema(
        self,
        ops: "list[AddColumn | RenameColumn | WidenColumn | DropColumn | AddStructField | RenameStructField | WidenStructField]",
    ) -> int:
        """Apply add/rename/widen/drop (top-level) and add/rename/widen
        (struct fields) as a metadata-only commit (no data rewrite);
        old files are reconciled on read. Incompatible ops hard-fail —
        reference analog: the schema-compliance gate
        /root/reference/Tasks/EndToEnd.cs:51-85, turned from a rejector into
        an evolver (SURVEY.md §1, O3).

        IDEMPOTENT per op: an op whose effect is already present (column
        exists with the same type / rename already applied / already widened)
        is a no-op. Evolution commits its own manifest BEFORE the epoch's
        data commit advances EPOCH_PROP; a crash in that window replays the
        same epoch ops, which must re-apply cleanly instead of wedging every
        retry with 'column already exists'. Returns the current version
        unchanged when all ops were no-ops."""
        m = self._next_manifest()
        cur = _schema_from_json(json.dumps(m["schemas"][str(m["schema_version"])]))
        fields = list(cur.fields)
        names = [f.name for f in fields]
        new_sv = m["schema_version"] + 1

        def chase(name: str) -> str:
            # follow the rename history so a replayed op from before a later
            # rename epoch checks against the column's CURRENT name — else a
            # replay straddling a rename wedges ('cannot widen missing x')
            # or re-adds a spurious column (review-caught)
            for r in m["renames"]:
                if r["old"] == name:
                    name = r["new"]
            return name

        def chase_from(name: str, sv: int) -> str:
            # version-aware chase: only renames AFTER sv apply — lets a
            # history entry recorded under a since-reused name resolve to
            # the column it actually described at the time
            for r in m["renames"]:
                if r["at_schema_version"] > sv and r["old"] == name:
                    name = r["new"]
            return name

        widens = m.setdefault("widens", [])
        adds = m.setdefault("adds", [])
        drops = m.setdefault("drops", [])
        widen_ok = {
            ("int", "bigint"),
            ("smallint", "int"),
            ("smallint", "bigint"),
            ("tinyint", "smallint"),
            ("tinyint", "int"),
            ("tinyint", "bigint"),
            ("float", "double"),
            ("int", "double"),
            ("bigint", "double"),
        }
        changed = False
        for op in ops:
            if isinstance(op, AddColumn):
                want = T._parse_datatype_string(op.type)
                # the ADD HISTORY distinguishes a replay (this exact add was
                # applied before — possibly renamed/widened since) from a
                # genuine re-add of a retired name (review-caught: a pure
                # name-chase skipped legitimate re-adds; a pure name check
                # wedged replays that straddle a rename epoch).
                # DOCUMENTED LIMITATION: re-adding a name that was itself
                # ADDED by evolution and later renamed away matches its own
                # history entry and no-ops — by state alone that case is
                # indistinguishable from a crash-replay of the original
                # epoch, and wedging every replay is the worse failure.
                # Re-adds with a different type still hard-fail below.
                # An add entry is SUPERSEDED (no longer evidence of a
                # replay) once a later DROP retired that incarnation — a
                # genuine re-add after a drop must apply, not no-op.
                if any(
                    a["name"] == op.name
                    and a["type"] == want.simpleString()
                    and not any(
                        d["name"] == chase_from(a["name"], a["at_schema_version"])
                        and d["at_schema_version"] > a["at_schema_version"]
                        for d in drops
                    )
                    for a in adds
                ):
                    continue
                if op.name in names:
                    have = fields[names.index(op.name)].dataType
                    # already applied if present with the wanted type OR a
                    # valid widening of it (pre-history manifests)
                    if have == want or (
                        want.simpleString(),
                        have.simpleString(),
                    ) in widen_ok:
                        continue
                    raise ValueError(
                        f"column {op.name} already exists with type "
                        f"{have.simpleString()} (wanted {want.simpleString()})"
                    )
                fields.append(T.StructField(op.name, want, True))
                names.append(op.name)
                adds.append(
                    {
                        "name": op.name,
                        "type": want.simpleString(),
                        "at_schema_version": new_sv,
                    }
                )
                changed = True
            elif isinstance(op, RenameColumn):
                # Replay detection uses the manifest's RENAME HISTORY, which
                # distinguishes the two both-names-exist cases exactly: a
                # replayed rename (old re-added by a later epoch) is in the
                # history and must no-op; a GENUINE rename whose target name
                # collides with a different existing column is not, and must
                # hard-fail instead of silently stranding the old column
                # (both review-caught, round 2).
                replayed = any(
                    r["old"] == op.old and r["new"] == op.new
                    for r in m["renames"]
                )
                if replayed or (op.new in names and op.old not in names):
                    continue  # already applied (history, or effect present)
                if op.new in names:
                    raise ValueError(
                        f"cannot rename {op.old} -> {op.new}: target column "
                        f"already exists"
                    )
                if op.old not in names:
                    raise ValueError(f"cannot rename missing column {op.old}")
                i = names.index(op.old)
                fields[i] = T.StructField(op.new, fields[i].dataType, fields[i].nullable)
                names[i] = op.new
                m["renames"].append(
                    {"old": op.old, "new": op.new, "at_schema_version": new_sv}
                )
                changed = True
            elif isinstance(op, WidenColumn):
                cur_name = chase(op.name)
                if cur_name not in names:
                    raise ValueError(f"cannot widen missing column {op.name}")
                i = names.index(cur_name)
                old_t = fields[i].dataType.simpleString()
                new_t = T._parse_datatype_string(op.new_type)
                replayed = any(
                    chase(w["name"]) == cur_name and w["to"] == new_t.simpleString()
                    for w in widens
                )
                if old_t == new_t.simpleString() or replayed:
                    # replayed op — already at the target type, or the WIDEN
                    # HISTORY records this exact step (a later epoch may have
                    # widened further; history is what distinguishes a replay
                    # from a genuinely incompatible narrowing request, which
                    # must hard-fail — review-caught x2, round 2)
                    continue
                if (old_t, new_t.simpleString()) not in widen_ok:
                    raise ValueError(
                        f"incompatible widen {op.name}: {old_t} -> {new_t.simpleString()}"
                    )
                fields[i] = T.StructField(cur_name, new_t, True)
                widens.append(
                    {
                        "name": cur_name,
                        "from": old_t,
                        "to": new_t.simpleString(),
                        "at_schema_version": new_sv,
                    }
                )
                changed = True
            elif isinstance(op, AddStructField):
                col = chase(op.column)
                if col not in names:
                    raise ValueError(
                        f"cannot add field to missing column {op.column}"
                    )
                i = names.index(col)
                dt = fields[i].dataType
                # the op targets the element struct when the column is an
                # array<struct<...>> (per-region/per-frame multimodal
                # metadata — VERDICT r4 item #5)
                is_array = isinstance(dt, T.ArrayType) and isinstance(
                    dt.elementType, T.StructType
                )
                target = dt.elementType if is_array else dt
                if not isinstance(target, T.StructType):
                    raise ValueError(
                        f"cannot add field to non-struct column {col} "
                        f"({dt.simpleString()})"
                    )
                want = T._parse_datatype_string(op.type)
                sadds = m.setdefault("struct_adds", [])
                # replay detection mirrors top-level adds, including the
                # documented limitation there: a same-type re-add of a field
                # that evolution added and a later rename retired is
                # state-indistinguishable from a crash-replay and no-ops
                if any(
                    a["column"] == col
                    and a["name"] == op.name
                    and a["type"] == want.simpleString()
                    for a in sadds
                ):
                    continue
                if op.name in target.fieldNames():
                    have = target[op.name].dataType
                    if have == want:
                        continue  # effect present (pre-history manifests)
                    raise ValueError(
                        f"field {col}.{op.name} already exists with type "
                        f"{have.simpleString()} (wanted {want.simpleString()})"
                    )
                new_struct = T.StructType(
                    list(target.fields) + [T.StructField(op.name, want, True)]
                )
                fields[i] = T.StructField(
                    col,
                    T.ArrayType(new_struct, dt.containsNull)
                    if is_array
                    else new_struct,
                    fields[i].nullable,
                )
                sadds.append(
                    {
                        "column": col,
                        "name": op.name,
                        "type": want.simpleString(),
                        "at_schema_version": new_sv,
                    }
                )
                changed = True
            elif isinstance(op, RenameStructField):
                col = chase(op.column)
                if col not in names:
                    raise ValueError(
                        f"cannot rename field in missing column {op.column}"
                    )
                i = names.index(col)
                dt = fields[i].dataType
                is_array = isinstance(dt, T.ArrayType) and isinstance(
                    dt.elementType, T.StructType
                )
                target = dt.elementType if is_array else dt
                if not isinstance(target, T.StructType):
                    raise ValueError(
                        f"cannot rename field in non-struct column {col}"
                    )
                srenames = m.setdefault("struct_renames", [])
                replayed = any(
                    r["column"] == col and r["old"] == op.old and r["new"] == op.new
                    for r in srenames
                )
                fnames = target.fieldNames()
                if replayed or (op.new in fnames and op.old not in fnames):
                    continue  # already applied (history, or effect present)
                if op.new in fnames:
                    raise ValueError(
                        f"cannot rename {col}.{op.old} -> {op.new}: target "
                        f"field already exists"
                    )
                if op.old not in fnames:
                    raise ValueError(
                        f"cannot rename missing field {col}.{op.old}"
                    )
                renamed = T.StructType(
                    [
                        T.StructField(
                            op.new if f.name == op.old else f.name,
                            f.dataType,
                            f.nullable,
                        )
                        for f in target.fields
                    ]
                )
                fields[i] = T.StructField(
                    col,
                    T.ArrayType(renamed, dt.containsNull)
                    if is_array
                    else renamed,
                    fields[i].nullable,
                )
                srenames.append(
                    {
                        "column": col,
                        "old": op.old,
                        "new": op.new,
                        "at_schema_version": new_sv,
                    }
                )
                changed = True
            elif isinstance(op, DropColumn):
                cur_name = chase(op.name)
                if cur_name not in names:
                    # replay iff the drop history records it; a drop of a
                    # column re-added by a LATER epoch cannot replay (the
                    # later epoch proves this one's EPOCH_PROP advanced),
                    # so name-absent + history-present is exactly a replay
                    if any(d["name"] == cur_name for d in drops):
                        continue
                    raise ValueError(f"cannot drop missing column {op.name}")
                protected = {m["key_col"], *m.get("lww_order", [])}
                if cur_name in protected:
                    raise ValueError(
                        f"cannot drop {cur_name}: merge key / LWW order "
                        f"columns are structural"
                    )
                i = names.index(cur_name)
                del fields[i]
                del names[i]
                drops.append(
                    {"name": cur_name, "at_schema_version": new_sv}
                )
                # scrub zone-map / bloom declarations that chased to the
                # dropped name — future commits must not look for it
                for key in ("stats_cols", "bloom_cols"):
                    kept = [
                        c
                        for c in m.get(key) or []
                        if chase(c) != cur_name
                    ]
                    if m.get(key) and kept != m[key]:
                        m[key] = kept
                changed = True
            elif isinstance(op, WidenStructField):
                col = chase(op.column)
                if col not in names:
                    raise ValueError(
                        f"cannot widen field in missing column {op.column}"
                    )
                i = names.index(col)
                dt = fields[i].dataType
                is_array = isinstance(dt, T.ArrayType) and isinstance(
                    dt.elementType, T.StructType
                )
                target = dt.elementType if is_array else dt
                if not isinstance(target, T.StructType):
                    raise ValueError(
                        f"cannot widen field in non-struct column {col}"
                    )
                srenames = m.get("struct_renames", [])

                def fchase(fname: str) -> str:
                    for r in srenames:
                        if chase(r["column"]) == col and r["old"] == fname:
                            fname = r["new"]
                    return fname

                fname = fchase(op.name)
                if fname not in target.fieldNames():
                    raise ValueError(
                        f"cannot widen missing field {col}.{op.name}"
                    )
                old_t = target[fname].dataType.simpleString()
                new_t = T._parse_datatype_string(op.new_type)
                swidens = m.setdefault("struct_widens", [])
                replayed = any(
                    chase(w["column"]) == col
                    and fchase(w["name"]) == fname
                    and w["to"] == new_t.simpleString()
                    for w in swidens
                )
                if old_t == new_t.simpleString() or replayed:
                    continue  # replay, or already at the target type
                if (old_t, new_t.simpleString()) not in widen_ok:
                    raise ValueError(
                        f"incompatible widen {col}.{op.name}: "
                        f"{old_t} -> {new_t.simpleString()}"
                    )
                widened = T.StructType(
                    [
                        T.StructField(f.name, new_t, True)
                        if f.name == fname
                        else f
                        for f in target.fields
                    ]
                )
                fields[i] = T.StructField(
                    col,
                    T.ArrayType(widened, dt.containsNull)
                    if is_array
                    else widened,
                    fields[i].nullable,
                )
                swidens.append(
                    {
                        "column": col,
                        "name": fname,
                        "from": old_t,
                        "to": new_t.simpleString(),
                        "at_schema_version": new_sv,
                    }
                )
                changed = True
            else:  # pragma: no cover
                raise TypeError(f"unknown evolution op {op!r}")
        if not changed:
            return self.version  # full replay — nothing to commit
        m["schema_version"] = new_sv
        m["schemas"][str(new_sv)] = T.StructType(fields).jsonValue()
        # own lineage, not the parent's (deep-copied by _next_manifest):
        # without this the history() view labels evolution commits with the
        # PREVIOUS commit's record
        m["lineage"] = {
            "schema_evolution": [repr(op) for op in ops],
            "new_schema_version": new_sv,
        }
        self._write_manifest(m)
        self._manifest = m
        return m["version"]
