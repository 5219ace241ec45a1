"""Incremental view maintenance over the snapshot-diff changelog: keep a
downstream aggregate in sync with the table WITHOUT rescanning it.

The changelog's retract convention (cdc/changelog.py) makes this mechanical
for invertible aggregates (count, sum): every ``insert`` / ``update_after``
row contributes +measure, every ``delete`` / ``update_before`` row
contributes -measure. Folding those signed deltas into the previous
aggregate state gives exactly the aggregate of the new table state —
O(changed keys) work per batch instead of O(table), which is the difference
between a dashboard that keeps up with a 10^10-event stream and one that
rescans 100 TB per refresh.

Non-invertible aggregates (min/max/distinct) are deliberately out of scope:
they need either full per-group recomputation on retraction or auxiliary
state (e.g. a count-per-value map); the engine exposes the changelog so a
consumer can build that, but ships only the always-safe invertible core.

Correctness contract (pinned in tests/test_ivm.py): for any batch sequence,
fold(state_0, feeds...) == direct aggregate of the final table state —
including through updates, deletes, and schema evolution (the feed carries
images in the newest schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADD = ("insert", "update_after")
_SUB = ("delete", "update_before")


def aggregate_delta(
    feed: DataFrame,
    dims: tuple[str, ...],
    measures: dict[str, "F.Column | str"],
) -> DataFrame:
    """Signed per-group deltas of one (or more) changelog batches.

    ``measures`` maps output name -> numeric column/expression to sum
    (``F.lit(1)`` gives a count). Returns one row per changed group:
    (dims..., <name>_delta ...).
    """
    sign = (
        F.when(F.col("change_type").isin(*_ADD), F.lit(1))
        .when(F.col("change_type").isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    aggs = []
    for name, m in measures.items():
        col = F.col(m) if isinstance(m, str) else m
        # no pre-sum integer cast: a fractional measure (e.g. a quality
        # score) must sum exactly, not truncate row-by-row (review-caught)
        aggs.append(F.sum(sign * col).alias(f"{name}_delta"))
    return feed.groupBy(*[F.col(d) for d in dims]).agg(*aggs)


def apply_delta(
    state: DataFrame,
    delta: DataFrame,
    dims: tuple[str, ...],
    measure_names: tuple[str, ...],
) -> DataFrame:
    """Fold signed deltas into the aggregate state: full-outer merge on the
    dims, add deltas, drop groups whose counts reach zero (a group must
    carry a measure named 'n' counting rows for the drop rule; callers that
    do not track 'n' keep zero-rows).

    The drop rule requires each folded delta to come from a CONSISTENT
    changelog batch (a snapshot_diff span, or a union of whole spans):
    there, n == 0 implies every contributing row was retracted, so all
    other sums are 0 too and dropping the group is exact. Folding an
    arbitrary FRAGMENT of a feed can strand a group at n == 0 with
    nonzero sums, which this drop would silently lose (pinned by the
    ivm_fold_rollup catalog query, which folds temporal prefixes).

    Scale shape: one hash join on the group keys — both sides are
    aggregate-sized (groups, not rows); the state never rescans the table.
    """
    # NULL-SAFE join on the dims: a null dimension value (e.g. language
    # before lang-id backfill) is a legitimate group; plain equality would
    # never match its state row and the group would split into duplicates
    # that compound every batch (review-caught).
    s_, d_ = state.alias("_s"), delta.alias("_d")
    cond = None
    for c in dims:
        eq = F.col(f"_s.{c}").eqNullSafe(F.col(f"_d.{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = s_.join(d_, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"_s.{c}"), F.col(f"_d.{c}")).alias(c) for c in dims
    ]
    for name in measure_names:
        out_cols.append(
            (
                F.coalesce(F.col(f"_s.{name}"), F.lit(0))
                + F.coalesce(F.col(f"_d.{name}_delta"), F.lit(0))
            ).alias(name)
        )
    out = joined.select(*out_cols)
    if "n" in measure_names:
        out = out.filter(F.col("n") > 0)
    return out


def empty_state(
    spark,
    dims_schema: str,
    measure_names: tuple[str, ...],
    measure_types: "dict[str, str] | None" = None,
) -> DataFrame:
    """An empty aggregate state with the right columns, e.g.
    ``empty_state(spark, 'lang string', ('n', 'chars'))``.

    Measures default to ``long``; FRACTIONAL measures (aggregate_delta
    explicitly supports them — 'no pre-sum integer cast') must be declared
    via ``measure_types`` (e.g. ``{"revenue": "double"}``): a long-typed
    state column would silently coerce to double on the first
    ``apply_delta`` fold, so batch-0 state schema would differ from every
    later batch (advisor-caught)."""
    types = measure_types or {}
    schema = dims_schema + ", " + ", ".join(
        f"{m} {types.get(m, 'long')}" for m in measure_names
    )
    return spark.createDataFrame([], schema)
