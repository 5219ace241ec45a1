"""UpsertTarget seam contract (SURVEY.md §7 S0 promise, VERDICT r1 #10):
LakeTable satisfies the protocol, and the CDC merge loop can run against a
proxy that REJECTS any attribute outside it — i.e. swapping in an Iceberg
adapter is provably a config switch, not a rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migration_pair_spark import synth
from migration_pair_spark.cdc.apply import apply_cdc_batch
from migration_pair_spark.cdc.runner import PAGES_SCHEMA
from migration_pair_spark.lakehouse import LakeTable, UpsertTarget
from migration_pair_spark.lakehouse.interface import UpsertTarget as _Proto

SEAM = {
    name
    for name in vars(_Proto)
    if not name.startswith("_") or name in ()
}


def test_laketable_satisfies_protocol(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), PAGES_SCHEMA, key_col="url", n_buckets=4
    )
    assert isinstance(t, UpsertTarget)


class SeamProxy:
    """Forwards ONLY protocol members; anything else is a seam violation."""

    def __init__(self, inner):
        object.__setattr__(self, "_inner", inner)

    def __getattr__(self, name):
        if name not in SEAM:
            raise AssertionError(
                f"CDC loop reached outside the UpsertTarget seam: {name!r}"
            )
        return getattr(object.__getattribute__(self, "_inner"), name)


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_cdc_loop_runs_through_the_seam_only(spark, tmp_path, write_mode):
    events = spark.createDataFrame(
        synth.make_change_events(300, 40, seed=7),
        schema="change_lsn long, op string, url string, warc_ts timestamp, "
        "html binary, lang string, schema_epoch int",
    ).withColumn("language", F.lit(None).cast("string")).withColumn(
        "fetch_status", F.lit(None).cast("long")
    )
    table = LakeTable.create(
        spark, str(tmp_path / "pages"), PAGES_SCHEMA, key_col="url", n_buckets=4
    )
    proxy = SeamProxy(table)
    lin = apply_cdc_batch(proxy, events, batch_id=0, write_mode=write_mode)
    assert not lin["skipped"]
    assert lin["rows_upserted"] > 0
    # replay through the seam: skipped by the interval gate
    lin2 = apply_cdc_batch(proxy, events, batch_id=1, write_mode=write_mode)
    assert lin2["skipped"]
    # state is real: final rows match the pandas oracle's url set
    oracle = synth.oracle_final_state(synth.make_change_events(300, 40, seed=7))
    got = sorted(r.url for r in table.read().select("url").collect())
    assert got == sorted(oracle["url"])


def test_seam_proxy_rejects_out_of_protocol_access(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), PAGES_SCHEMA, key_col="url", n_buckets=4
    )
    proxy = SeamProxy(t)
    with pytest.raises(AssertionError, match="outside the UpsertTarget seam"):
        _ = proxy.manifest  # implementation detail, not part of the seam


def test_maintenance_loop_runs_through_the_seam_only(spark, tmp_path):
    """The auto-compaction policy (the other table-touching path in
    CdcPipeline) must also stay inside the protocol — review-caught r2: it
    previously read table.manifest directly."""
    from migration_pair_spark.cdc.runner import CdcPipeline

    events = spark.createDataFrame(
        synth.make_change_events(300, 40, seed=7),
        schema="change_lsn long, op string, url string, warc_ts timestamp, "
        "html binary, lang string, schema_epoch int",
    ).withColumn("language", F.lit(None).cast("string")).withColumn(
        "fetch_status", F.lit(None).cast("long")
    )
    table = LakeTable.create(
        spark, str(tmp_path / "pages"), PAGES_SCHEMA, key_col="url", n_buckets=4
    )
    apply_cdc_batch(SeamProxy(table), events, batch_id=0, write_mode="mor")
    more = events.withColumn("change_lsn", F.col("change_lsn") + 1000)
    apply_cdc_batch(SeamProxy(table), more, batch_id=1, write_mode="mor")
    pipe = CdcPipeline(
        table_path=str(tmp_path / "pages"),
        n_buckets=4,
        auto_compact_files_per_bucket=1,  # 2 delta files/bucket > 1 -> fold
    )
    lineage = {"skipped": False}
    pipe._maybe_auto_compact(SeamProxy(table), lineage)
    assert lineage.get("auto_compacted_buckets"), lineage
    table.refresh()
    assert max(table.files_per_bucket().values()) <= 1


def test_iceberg_adapter_conforms_to_protocol(spark):
    """The IcebergTable adapter (lakehouse/iceberg.py) presents the FULL
    UpsertTarget surface — the config switch is code, not a documented
    mapping. Construction needs no Iceberg jars (only method execution
    does), so conformance is pinned in this sandbox; execution is gated on
    IcebergTable.available()."""
    import inspect

    from migration_pair_spark.lakehouse.iceberg import IcebergTable
    from migration_pair_spark.lakehouse.table import LakeTable as _LT

    t = IcebergTable(spark, "catalog.db.pages")
    # surface check at the CLASS level: isinstance() on a runtime_checkable
    # protocol hasattr-probes the INSTANCE, which would execute the lazy
    # property getters (they query the absent catalog); the class carries
    # the same attributes without evaluation
    proto_attrs = [
        a
        for a in dir(_Proto)
        if not a.startswith("_")
        and (callable(getattr(_Proto, a, None)) or isinstance(
            getattr(_Proto, a, None), property
        ))
    ]
    assert len(proto_attrs) >= 15  # the protocol surface, not a stub list
    missing = [a for a in proto_attrs if not hasattr(type(t), a)]
    assert not missing, f"adapter lacks protocol members: {missing}"
    assert not IcebergTable.available(spark)  # sandbox truth: no jars
    # method signatures match the protocol's (arity drift would break the
    # CDC loop at call time even though the runtime_checkable passes)
    for name in (
        "read_buckets", "replace_buckets", "append_delta_buckets",
        "evolve_schema", "compact", "bucket_expr", "files_per_bucket",
    ):
        got = inspect.signature(getattr(IcebergTable, name))
        want = inspect.signature(getattr(_LT, name))
        assert list(got.parameters) == list(want.parameters), name
