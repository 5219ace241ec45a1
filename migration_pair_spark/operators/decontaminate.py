"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams — the standard guard against
eval contamination in LLM training-data pipelines (the n-gram-overlap rule
of the GPT-3/PaLM appendix methodology, re-expressed Spark-first).

Semantics: a corpus doc is CONTAMINATED when it shares at least
``min_shared`` distinct word ``n``-gram shingles with any single benchmark
doc. Output is one row per contaminated (doc, benchmark) pair with the
shared count — the drop/audit set; ``clean_corpus`` applies it as an
anti-join.

Scale shape (the part that matters at 100 TB):

- word n-grams explode NARROWLY (doc_id, shingle-hash): the text never
  enters the join — xxhash64 collapses arbitrary-length shingles to 8
  bytes before the exchange;
- the benchmark side is the SMALL side by construction (eval sets are
  thousands of docs, the corpus billions): its shingle set BROADCASTS, so
  the corpus side never shuffles for the match — one broadcast hash join
  on the shingle hash, then one groupBy (doc, bench) count;
- shared-shingle counting is exact-distinct because each side dedupes its
  shingle set first (a phrase repeated inside one doc counts once).

All tokenization is engine-neutral (split on ``\\s+``, space-rejoined
n-grams with the same short-document truncation on both engines), so the
catalog query's DuckDB oracle is EXACT with a deterministic benchmark
stand-in (every ``bench_mod``-th doc) — no external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shingle): DISTINCT space-joined word ``n``-grams per doc.
    Documents shorter than ``n`` tokens contribute their full token run
    (slice truncates identically in Spark and DuckDB); empty/null texts
    contribute nothing."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        docs.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
            ).alias("_p"),
            toks.alias("_toks"),
        )
        .select(
            F.col(id_col),
            F.array_join(F.slice("_toks", F.col("_p"), n), " ").alias("shingle"),
        )
        .distinct()
    )


def _shingle_hashes(
    docs: DataFrame, out_id: str, n: int, id_col: str, text_col: str
) -> DataFrame:
    return word_ngrams(docs, n=n, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias(out_id), F.xxhash64("shingle").alias("_sh")
    )


def contaminated_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, shared_shingles) for every corpus/benchmark pair
    sharing >= ``min_shared`` distinct word ``n``-grams. The benchmark side
    is broadcast; the corpus side reaches the pair aggregation without a
    pre-join shuffle (plan-pinned in tests/test_plans.py)."""
    c = _shingle_hashes(corpus, "doc_id", n, id_col, text_col)
    b = _shingle_hashes(benchmark, "bench_id", n, id_col, text_col)
    return (
        c.join(F.broadcast(b), "_sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= min_shared)
    )


def clean_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus contaminated docs (left-anti on the flag set).
    Benchmark members present in the corpus itself are dropped too — a doc
    is never 'decontaminated by being its own benchmark match' (self-pairs
    count)."""
    flagged = (
        contaminated_pairs(
            corpus, benchmark, n=n, min_shared=min_shared,
            id_col=id_col, text_col=text_col,
        )
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return corpus.join(flagged, id_col, "left_anti")


def oracle_contaminated_sql(bench_mod: int, n: int = 3, min_shared: int = 2) -> str:
    """DuckDB twin over the ``documents`` view with the deterministic
    benchmark stand-in ``doc_id % bench_mod == 0``: same ``\\s+`` split,
    same 1-based slice with the same short-doc truncation, same distinct
    sets, same pair-count filter. Self-pairs are excluded in BOTH engines
    by the catalog query's ``doc_id <> bench_id`` (a corpus that contains
    its own benchmark docs would flag them trivially)."""
    return f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    pos AS (
        SELECT doc_id, toks,
               CAST(unnest(range(1, greatest(len(toks) - {n - 1}, 1) + 1)) AS INT) AS p
        FROM t
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[p:p + {n - 1}], ' ') AS shingle
        FROM pos
    ),
    pairs AS (
        SELECT s.doc_id, b.doc_id AS bench_id, count(*) AS shared_shingles
        FROM sh s JOIN sh b ON b.shingle = s.shingle
        WHERE b.doc_id % {bench_mod} = 0 AND s.doc_id <> b.doc_id
        GROUP BY s.doc_id, b.doc_id
    )
    SELECT doc_id, bench_id, CAST(shared_shingles AS BIGINT) AS shared_shingles
    FROM pairs WHERE shared_shingles >= {min_shared}
    """
