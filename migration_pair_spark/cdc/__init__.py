"""CDC core: salted LWW dedup, the exactly-once MERGE apply loop, schema
evolution, the batch/streaming runners (SURVEY.md §2.4, §7), the
snapshot-diff changelog feed, and incremental view maintenance."""

from migration_pair_spark.cdc.changelog import (
    apply_changes,
    materialize_changelog,
    snapshot_diff,
)
from migration_pair_spark.cdc.ivm import aggregate_delta, apply_delta
from migration_pair_spark.cdc.runner import CdcPipeline

__all__ = [
    "CdcPipeline",
    "snapshot_diff",
    "materialize_changelog",
    "apply_changes",
    "aggregate_delta",
    "apply_delta",
]
