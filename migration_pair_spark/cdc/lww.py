"""Last-writer-wins dedup with salted two-phase skew breaking.

Semantic seed: Cassandra INSERT-is-an-LWW-upsert in the reference
(/root/reference/Tasks/MigrationTask.cs:101-102 — plain INSERT, reconciled
last-writer-wins by the database). Spark has no implicit LWW, so the engine
implements it explicitly as a window rank:

    row_number() over (partition by key order by warc_ts desc, change_lsn desc) = 1

The change stream is zipf-skewed on url (FIXTURES.md F2), and a plain
``Window.partitionBy(url)`` would hotspot one task per hot url at 10^10
events. AQE's skew-join splitting does NOT cover window partitions, so we
break the skew ourselves with the standard two-phase trick (SURVEY.md §4.2):

  phase 1: partition by (url, salt) where salt = pmod(xxhash64(change_lsn), S)
           — the hot url's rows split across S buckets; keep 1 winner each.
  phase 2: partition by url over the <=S survivors per url — trivially small.

Correctness: the salt derives from change_lsn (unique), never from the
ordering columns, so the global winner is the max over bucket winners —
phase 2 returns exactly the unsalted result (proved by test_lww.py's
salt-invariance test: same winners with salt=1 and salt=16).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SALT = "_lww_salt"
_RN = "_lww_rn"


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str] = ("url",),
    order_cols: Sequence[str] = ("warc_ts", "change_lsn"),
    salt_buckets: int = 16,
    salt_source: str = "change_lsn",
) -> DataFrame:
    """Return exactly one row per key: the max by ``order_cols`` (desc, with
    later columns as tiebreakers). Two-phase salted execution; the output is
    identical for any ``salt_buckets`` >= 1.
    """
    key_cols = list(key_cols)
    order = [F.col(c).desc_nulls_last() for c in order_cols]

    if salt_buckets <= 1:
        w = Window.partitionBy(*key_cols).orderBy(*order)
        return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)

    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*key_cols, _SALT).orderBy(*order)
    phase1 = (
        salted.withColumn(_RN, F.row_number().over(w1))
        .filter(F.col(_RN) == 1)
        .drop(_RN, _SALT)
    )
    # Phase 2 input is <= salt_buckets rows per key — no skew left.
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return phase1.withColumn(_RN, F.row_number().over(w2)).filter(F.col(_RN) == 1).drop(_RN)


def lww_dedup_agg(
    df: DataFrame,
    key_cols: Sequence[str] = ("url",),
    order_cols: Sequence[str] = ("warc_ts", "change_lsn"),
) -> DataFrame:
    """LWW dedup as an AGGREGATE instead of a window: per key, keep the row
    whose ``struct(order_cols)`` is maximal (lexicographic struct comparison
    gives exactly the (warc_ts, change_lsn) total order).

    This is the CDC hot-path implementation. Versus the window form it

    - gets map-side partial aggregation (combiners): each input partition
      forwards AT MOST ONE candidate per key to the shuffle, so the shuffle
      volume is ~|distinct keys per partition|, not |rows| — at 10^10 events
      with zipf-hot urls this is the difference between shuffling terabytes
      and shuffling the key space;
    - needs no salting: the hot key's rows are pre-combined in every map
      partition, so no single reducer ever sees more than (#map partitions)
      rows for a key;
    - skips the per-partition sort a window requires.

    Output column order: key_cols first, then the remaining columns in input
    order. Semantics identical to ``lww_dedup`` (asserted in test_lww.py).
    """
    key_cols = list(key_cols)
    payload = [c for c in df.columns if c not in key_cols]
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    out = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("_w")
    )
    return out.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
