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
    # Spark 3.5+ WindowGroupLimit prunes rank<=k rows before the full sort
    # (pinned on the brute-force top-k query — the r6 optimization moved
    # lww_latest_state off the window form entirely; see the next test)
    plan = plan_of(REGISTRY["embedding_topk_cosine"].fn(spark, SF), "simple")
    assert "WindowGroupLimit" in plan


def test_lww_latest_state_is_single_shuffle_aggregate(spark):
    """r6: the catalog LWW rows run the max_by AGGREGATE (one map-side-
    combined shuffle), not the salted two-phase window (two shuffles +
    per-partition sorts of every row)."""
    plan = plan_of(REGISTRY["lww_latest_state"].fn(spark, SF), "simple")
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "max_by" in plan or "MaxBy" in plan


def test_embedding_neardup_has_no_cartesian(spark):
    """VERDICT r1 #3: near-dup must come from the SRP bucket equi-join, never
    an all-pairs cartesian (that shape dies at 10^9 vectors)."""
    plan = plan_of(REGISTRY["embedding_neardup_pairs"].fn(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_candidate_distinct_carries_ids_only(spark):
    """VERDICT r1 #5: the candidate dedup must not shuffle the 64-float
    vectors — the exchange feeding the distinct carries only id columns."""
    plan = plan_of(REGISTRY["embedding_ann_lsh"].fn(spark, SF))
    # the HashAggregate pair implementing the distinct keys on exactly the
    # two id columns; no _q/embedding array rides through it
    assert "CartesianProduct" not in plan
    dedup_lines = [
        l for l in plan.splitlines()
        if "Keys" in l and "query_id" in l and "neighbor_id" in l
    ]
    assert dedup_lines, "candidate distinct not found in plan"
    assert all("_q" not in l and "embedding" not in l for l in dedup_lines)


def test_multimodal_meta_has_no_python_stage(spark):
    """VERDICT r1 #2: metadata extraction is octet_length/md5 built-ins; any
    Arrow/Python eval node in this plan is a regression."""
    plan = plan_of(REGISTRY["multimodal_meta"].fn(spark, SF), "simple")
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan


def test_multimodal_dims_has_no_python_stage(spark):
    """Header parsing (PNG/GIF/JPEG dims) is hex/conv/substring built-ins
    plus one aggregate HOF — a Python eval node here is a regression."""
    plan = plan_of(REGISTRY["multimodal_dims"].fn(spark, SF), "simple")
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan


def test_audio_meta_has_no_python_stage(spark):
    """Audio/container header parsing (WAV chunk walk, MP4 box walks) is
    hex/conv/substring built-ins plus aggregate HOFs — a Python eval node
    here is a regression (VERDICT r4 item #4, multimodal_dims precedent)."""
    plan = plan_of(REGISTRY["audio_meta"].fn(spark, SF), "simple")
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan


def test_video_frame_sample_no_python_stage(spark):
    """MP4 frame extraction (five box walks + stsz/stsc/stco + substring
    slices) is all Catalyst built-ins; the mapInPandas form exists only for
    the general multi-chunk layout (sample_frames_table)."""
    plan = plan_of(REGISTRY["video_frame_sample"].fn(spark, SF), "simple")
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan


def test_jaccard_verify_broadcasts_survive_to_joins(spark):
    """VERDICT r1 #7: the broadcast hints in jaccard_verify must reach their
    joins (a hint placed before union/distinct is silently stripped)."""
    from migration_pair_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sig = dd.minhash_signatures(docs)
    pairs = dd.lsh_candidate_pairs(sig)
    plan = plan_of(dd.jaccard_verify(docs, pairs), "simple")
    # candidate-doc semi-join AND the pairs join both broadcast
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    semi = [l for l in plan.splitlines() if "LeftSemi" in l]
    assert any("BroadcastHashJoin" in l for l in semi)


def test_range_join_is_hash_equi_join(spark):
    """The interval join must plan as a hash equi-join on (key, bucket) with
    the range check as a residual filter — never a per-key nested loop or
    cartesian (the naive inequality-join plan that dies at scale)."""
    plan = plan_of(REGISTRY["range_join_click_purchase"].fn(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_hierarchical_rollup_single_raw_scan(spark):
    """Daily grain folds from the hourly partials: exactly one scan of the
    events parquet feeds both grains (the continuous-aggregate shape)."""
    plan = plan_of(REGISTRY["hypertable_rollup"].fn(spark, SF))
    # the hourly partial is materialized ONCE (eager localCheckpoint at
    # build time); both union branches read the checkpointed blocks — the
    # returned plan contains NO parquet scan at all
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 2


def test_stratified_split_no_shuffle_before_agg(spark):
    """Split assignment is a pure per-row projection: the only exchange in
    the plan is the final groupBy's."""
    plan = plan_of(REGISTRY["stratified_split_docs"].fn(spark, SF), "simple")
    assert plan.count("Exchange") == 1


def test_per_stratum_sample_is_two_phase_topk(spark):
    """sample_per_stratum must run as a TWO-PHASE top-k: a PARTIAL
    WindowGroupLimit on the map side (each input partition keeps <= k rows
    per stratum BEFORE the exchange, so the shuffle carries k x maps rows
    per stratum, never the stratum) and a FINAL one after — i.e. no task
    ever sorts a full hot stratum ('en' at web scale is billions of docs).
    Catalyst's InferWindowGroupLimit produces exactly this shape from the
    window expression; this pin keeps it from regressing (e.g. a rank
    filter rewritten in a way the rule no longer matches)."""
    plan = plan_of(REGISTRY["stratified_sample_docs"].fn(spark, SF), "simple")
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan
    # the partial limit sits BELOW the exchange (map side)
    ipartial = plan.index("Partial")
    iexchange = plan.index("Exchange")
    assert ipartial > iexchange, "partial top-k must be below the shuffle"


def test_tfidf_topk_window_group_limit(spark):
    """Top-k per doc prunes via WindowGroupLimit before the window sort."""
    plan = plan_of(REGISTRY["tfidf_top_terms"].fn(spark, SF), "simple")
    assert "WindowGroupLimit" in plan


def test_ivf_probe_is_equi_join_on_cell(spark):
    """The inverted-list probe joins candidates by cell equality (broadcast
    of the tiny probe table); only the centroid scoring is a bounded
    O(N x n_cells) broadcast nested loop — never a corpus-corpus cartesian."""
    plan = plan_of(REGISTRY["embedding_ann_ivf"].fn(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    # candidate generation: broadcast hash join (probes side is broadcast)
    assert "BroadcastHashJoin" in plan
    # centroid scoring: BNLJ appears, but only against the n_cells side
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast (eval sets are tiny; the
    corpus is the big side and must not shuffle for the match): one
    BroadcastHashJoin on the shingle hash, no SortMergeJoin, no cartesian."""
    plan = plan_of(REGISTRY["decontaminate_docs"].fn(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_dedup_hash_agg_no_sort(spark):
    """The chunk keeper is min() over a PACKED BIGINT (doc_id, cpos): a
    struct-typed min buffer silently demotes the keeper aggregate to
    SortAggregate + a per-partition Sort of every exploded chunk row
    (observed before the fix). Pin the hash-agg shape: no Sort, no Window,
    no SortAggregate anywhere in the executed plan."""
    plan = plan_of(REGISTRY["chunk_dedup_docs"].fn(spark, SF), "simple")
    assert "SortAggregate" not in plan
    assert "Window" not in plan
    import re

    assert not re.search(r"\bSort\b", plan.replace("SortMergeJoin", ""))
