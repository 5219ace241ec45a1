"""Engine configuration — a frozen dataclass loaded once.

Reference analog: O14, the `SettingsModel` bound from appsettings.json
(/root/reference/Models/SettingsModel.cs:3-43, /root/reference/Settings.cs:9-14).
Deliberately dropped: the reference re-binds config on EVERY property access
(`reloadOnChange: true`), which makes a running migration's batch size
mutable mid-flight; this engine freezes configuration at load (SURVEY.md §2
O14 disposition).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, fields


@dataclass(frozen=True)
class EngineConfig:
    # target table
    table_path: str = "./pages_table"
    key_col: str = "url"
    n_buckets: int = 32
    # change stream
    events_dir: str = "./change_events"
    checkpoint_dir: str = "./checkpoints/cdc"
    max_files_per_trigger: int = 1
    # reference's InsertionBatch analog (micro-batch size bound); the
    # reference defaults to 100_000 statements per flush when unset
    # (/root/reference/Models/SettingsModel.cs:10)
    max_events_per_batch: int = 100_000
    # execution
    master: str | None = None
    shuffle_partitions: int | None = None
    extract_text: bool = True
    # "cow" (rewrite touched buckets) or "mor" (append deltas, resolve on
    # read, fold via compact) — see cdc.apply.apply_cdc_batch
    write_mode: str = "cow"
    coalesce_bucket_files: bool = False
    # csv snapshot round-trip (reference Extraction/Insertion file settings,
    # /root/reference/appsettings.json; delimiter default "," matches
    # /root/reference/Models/SettingsModel.cs:41)
    csv_delimiter: str = ","
    empty_numeric_as_zero: bool = False

    @classmethod
    def load(cls, path: str | None = None, **overrides) -> "EngineConfig":
        data: dict = {}
        if path and os.path.exists(path):
            with open(path) as f:
                data.update(json.load(f))
        data.update({k: v for k, v in overrides.items() if v is not None})
        known = {f.name for f in fields(cls)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**data)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)
