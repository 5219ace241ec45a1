"""Physical-plan assertions: the scale-critical plan properties must not
regress (filter pushdown, column pruning, broadcast dimension joins,
map-side combine for LWW, no superfluous shuffles).

These are the `.explain("formatted")` audits the build demands, frozen as
tests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migration_pair_spark.cdc.lww import lww_dedup_agg
from migration_pair_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def plan_of(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_pushdown_and_column_pruning(spark):
    plan = plan_of(REGISTRY["q1_pricing_summary"].fn(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning reaches the scan: no orderkey/partkey/suppkey read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_dimension_joins_broadcast(spark):
    plan = plan_of(REGISTRY["dim_join_agg"].fn(spark, SF), "simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # partial aggregation before the exchange
    assert "partial_count" in plan


def test_lww_agg_has_map_side_combine(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").alias("url"),
        F.col("ts").alias("warc_ts"),
        F.col("event_id").alias("change_lsn"),
        "event_type",
    )
    plan = plan_of(lww_dedup_agg(ev), "simple")
    # partial_max_by BEFORE the hash exchange: each map partition forwards at
    # most one candidate per key — the skew-immunity argument (lww.py)
    assert "partial_max_by" in plan
    assert plan.index("partial_max_by") > plan.index("max_by")  # final, then partial (printed top-down)
    assert plan.count("Exchange hashpartitioning") == 1


def test_lww_agg_single_shuffle(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").alias("url"),
        F.col("ts").alias("warc_ts"),
        F.col("event_id").alias("change_lsn"),
    )
    plan = plan_of(lww_dedup_agg(ev), "simple")
    assert plan.count("Exchange") == 1


def test_semi_anti_plans_use_semi_joins(spark):
    plan = plan_of(REGISTRY["semi_anti_customers"].fn(spark, SF), "simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_topk_uses_limit_not_full_sort_materialization(spark):
    plan = plan_of(REGISTRY["top_revenue_orders"].fn(spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan  # top-k pushdown, not global sort


def test_window_query_uses_group_limit_pushdown(spark):
    # Spark 3.5+ WindowGroupLimit prunes rank<=1 rows before the full sort
    plan = plan_of(REGISTRY["lww_latest_state"].fn(spark, SF), "simple")
    assert "WindowGroupLimit" in plan
