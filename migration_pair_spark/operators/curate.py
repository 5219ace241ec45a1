"""End-to-end corpus curation: the composition a training-data user actually
runs — exact dedup, near-dup cluster dedup, quality/language gates, token
accounting, and the deterministic train/val/test split, in one DataFrame
pipeline (CLI: ``python -m migration_pair_spark curate``).

Stage order is the cost order — each stage shrinks the corpus the next one
scans:

1. **exact dedup** (md5 groupBy, one shuffle) drops byte-identical copies —
   on web crawls typically the largest single reduction;
1.5. *(opt-in)* **chunk-level span dedup** (``chunk_dedup_w``): CCNet-style
   corpus-wide first-occurrence keep of w-word chunks REWRITES each text to
   its surviving spans and drops fully-duplicated docs — it runs before the
   gates so quality/lang score the text that will actually be trained on
   (boilerplate stripped), at the cost of the rewrite's keeper shuffle +
   one corpus join;
2. **quality + language gates**: pure per-row Catalyst expressions
   (functions/textstats.py) — no shuffle, and they run BEFORE the expensive
   near-dup stage so rejected documents never pay for shingling (keeper
   selection therefore happens among gate-passing documents — the keeper of
   a cluster whose min-id member failed the gate is the surviving min id);
3. **near-dup dedup** (MinHash -> banded LSH -> exact-Jaccard verify ->
   connected components, operators/dedup.py) keeps one doc per duplicate
   cluster (min id); all joins are candidate- or edge-sized, never corpus²;
4. **annotate + split**: token counts and the md5-nibble split
   (operators/sampling.py) — per-row, no shuffle; the split column is the
   write partition key, so the three sets land in separate directories
   without a repartition.

Every stage is the already-oracled operator — this module only composes
them; correctness of the composition is pinned in tests/test_curate.py by
recomputing the expected keep-set in pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from migration_pair_spark.functions import textstats
from migration_pair_spark.operators import dedup as dd
from migration_pair_spark.operators.sampling import assign_split


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    neardup_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_salt: str = "split",
    benchmark: DataFrame | None = None,
    decontaminate_min_shared: int = 2,
    chunk_dedup_w: int | None = None,
) -> DataFrame:
    """The curated corpus: one row per kept document with
    (original columns, quality, pred_lang, n_tokens, split).

    Drops: exact duplicates (keep min id per identical text), duplicated
    spans when ``chunk_dedup_w`` is set (each text is rewritten to its
    corpus-wide first-occurrence w-word chunks; fully-duplicated docs drop
    out), documents
    below ``min_quality`` or outside ``langs`` (None = keep all), documents
    contaminated by ``benchmark`` (shared word n-grams,
    operators/decontaminate.py — runs AFTER the cheap gates and BEFORE the
    expensive near-dup stage, so contaminated docs never pay for
    shingling), and near-dup cluster non-keepers (exact Jaccard >=
    ``neardup_threshold``).
    """
    # 1. exact dedup — semi-join the corpus down to the per-text keepers
    keepers = dd.exact_dedup(docs, text_col, id_col).select(
        F.col("keeper_doc_id").alias(id_col)
    )
    # (keepers is an aggregate — AQE broadcasts the semi-join side when it
    # fits; at web scale it stays a shuffled semi-join, which is correct)
    docs1 = docs.join(keepers, id_col, "left_semi")

    # 1.5 opt-in span-level dedup: rewrite each doc to its first-occurrence
    # chunks; a doc whose every span appeared earlier vanishes entirely
    # (deduped_text = ''). Inner join back on id to swap the text column —
    # one corpus shuffle, paid only when the stage is on.
    if chunk_dedup_w is not None:
        # drop on n_kept == 0 (every span seen before), NOT on empty
        # deduped_text: an empty-or-whitespace doc's single chunk can be
        # globally FIRST (n_kept = 1) while still reassembling to '' — such
        # a doc duplicated nothing and must survive this stage like it
        # survives with the stage off (review-caught, reproduced)
        rewritten = dd.chunk_dedup(docs1, text_col, id_col, w=chunk_dedup_w).select(
            F.col(id_col), F.col("n_kept"), F.col("deduped_text")
        )
        docs1 = (
            docs1.drop(text_col)
            .join(rewritten.filter(F.col("n_kept") > 0), id_col)
            .withColumnRenamed("deduped_text", text_col)
            .drop("n_kept")
        )

    # 2. per-row gates FIRST: rejected docs never pay for shingling
    gated = (
        docs1.withColumn("quality", textstats.quality_score(F.col(text_col)))
        .withColumn("pred_lang", textstats.lang_id(F.col(text_col)))
        .filter(F.col("quality") >= F.lit(min_quality))
    )
    if langs is not None:
        gated = gated.filter(F.col("pred_lang").isin(*langs))

    # 2.5 benchmark decontamination (broadcast benchmark shingle set; the
    # corpus side never shuffles before the pair count)
    if benchmark is not None:
        from migration_pair_spark.operators.decontaminate import clean_corpus

        gated = clean_corpus(
            gated, benchmark, min_shared=decontaminate_min_shared,
            id_col=id_col, text_col=text_col,
        )

    # 3. near-dup cluster dedup over the gated corpus. dedup_clusters runs
    # eagerly (per-round convergence counts), so the shingle cache is fully
    # consumed by the time it returns — unpersist before handing back the
    # (lazy) result instead of leaking the largest intermediate for the
    # session lifetime.
    arr = dd.shingle_arrays(gated, text_col, id_col).persist()
    try:
        sig = dd.minhash_signatures(gated, text_col, id_col, arrays_df=arr)
        cand = dd.lsh_candidate_pairs(sig, id_col)
        pairs = dd.jaccard_verify(
            gated, cand, text_col, id_col, threshold=neardup_threshold, arrays_df=arr
        )
        clusters = dd.dedup_clusters(gated, pairs, id_col)
    finally:
        arr.unpersist()
    keep2 = clusters.filter(F.col("keeper_doc_id") == F.col(id_col)).select(id_col)
    docs2 = gated.join(keep2, id_col, "left_semi")

    # 4. annotations + split (no shuffle)
    out = docs2.withColumn(
        "n_tokens", textstats.token_count(F.col(text_col)).cast("long")
    )
    return assign_split(out, key_col=id_col, salt=split_salt)


def write_curated(df: DataFrame, out_dir: str) -> dict:
    """Write the curated corpus partitioned by split (train/val/test land in
    separate directories — no repartition: the dynamic-partition writer
    routes rows per task). Returns per-split counts + token totals —
    observed ON the write job itself (round-2 verdict nit: the old shape
    re-read the written output for one extra scan)."""
    from pyspark.sql import Observation

    splits = ("train", "val", "test")
    obs = Observation("curate-stats")
    metrics = [F.count(F.lit(1)).alias("n_all")]
    for s in splits:
        is_s = F.col("split") == s
        metrics.append(F.count(F.when(is_s, 1)).alias(f"n_{s}"))
        metrics.append(F.sum(F.when(is_s, F.col("n_tokens"))).alias(f"t_{s}"))
    df.observe(obs, *metrics).write.partitionBy("split").parquet(
        out_dir, mode="errorifexists"
    )
    got = obs.get
    # Observation can only count pre-declared split names; a row with any
    # OTHER split value is written to disk but invisible to the stats. Fail
    # loudly instead of silently under-reporting (advisor-caught, round 3) —
    # assign_split only ever emits train/val/test, so this guards external
    # callers feeding their own split column.
    accounted = sum(int(got[f"n_{s}"]) for s in splits)
    if accounted != int(got["n_all"]):
        raise ValueError(
            f"write_curated: {int(got['n_all']) - accounted} rows carry a "
            f"split value outside {splits} — they were written under their "
            f"own split= directories but are not in the returned stats"
        )
    return {
        s: {"n_docs": int(got[f"n_{s}"]), "n_tokens": int(got[f"t_{s}"] or 0)}
        for s in splits
        if got[f"n_{s}"]
    }
