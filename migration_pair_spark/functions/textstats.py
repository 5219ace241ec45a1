"""Text-analysis column functions for the training-data pipeline: token
counting, quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst column expressions (JVM-side, whole-stage-codegen'd) — no
UDFs. Each has an exact ANSI-SQL equivalent used by the DuckDB oracle, so
every function here is value-checked cross-engine at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram language-ID heuristic.
# Deliberately tiny and fixed: the heuristic is a deterministic scoring
# function, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
    "pt": [" o ", " e ", " os "],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish regex split)."""
    return F.size(F.split(F.trim(col), r"\s+"))


def occurrences(col: Column, needle: str) -> Column:
    """Number of (possibly overlapping-free) occurrences of a literal."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def digit_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, "[0-9]", ""))


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, "[.,;:!?'\"()-]", ""))


def quality_score(col: Column) -> Column:
    """Length/punctuation/token-shape quality heuristic in [0, 1]:
    favors texts with enough tokens, few digits, and moderate punctuation."""
    toks = token_count(col).cast("double")
    chars = F.length(col).cast("double")
    digits = digit_count(col).cast("double")
    punct = punct_count(col).cast("double")
    score = (
        F.least(F.lit(1.0), toks / F.lit(20.0))
        * (F.lit(1.0) - F.least(F.lit(1.0), digits / F.greatest(chars, F.lit(1.0)) * 4))
        * (F.lit(1.0) - F.least(F.lit(1.0), punct / F.greatest(toks, F.lit(1.0))))
    )
    return F.round(score, 4)


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-occurrence score per language over the padded, lowercased text."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return {
        lang: sum(occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax of lang_scores with deterministic tiebreak (alphabetical lang
    order, 'zz' fallback when all scores are 0)."""
    scores = lang_scores(col)
    langs = sorted(scores)
    best = F.lit("zz")
    best_score = F.lit(0).cast("long")
    # fold right-to-left so earlier (alphabetical) languages win ties with >
    for lang in reversed(langs):
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the text (exact-dup key)."""
    return F.md5(col)


def oracle_occurrences_sql(expr: str, needle: str) -> str:
    """The DuckDB-side twin of :func:`occurrences` (kept adjacent so the two
    implementations evolve together)."""
    esc = needle.replace("'", "''")
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{esc}', ''))) / {len(needle)} AS BIGINT)"
    )


def oracle_lang_id_sql(text_expr: str) -> str:
    """DuckDB SQL equivalent of :func:`lang_id` (same fold, same tiebreak)."""
    padded = f"(' ' || lower({text_expr}) || ' ')"
    score_sqls = {
        lang: " + ".join(oracle_occurrences_sql(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best, best_score = "'zz'", "CAST(0 AS BIGINT)"
    for lang in reversed(sorted(score_sqls)):
        s = f"({score_sqls[lang]})"
        best = f"CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END"
    return best


def repetition_stats(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """Gopher-style repetition quality signals per document:
    (id, n_tokens, n_distinct_tokens, max_token_count, dup_token_frac).

    High duplicate-token fraction / a single token dominating the document
    are the classic low-quality markers (boilerplate, keyword stuffing,
    scraped nav bars) that corpus filters threshold on.

    Scale shape: one narrow explode (id, token) and two hash aggregations
    with map-side combine — shuffle volume is O(distinct (doc, token)), the
    text itself never shuffles. Exact integer counts; the fraction is one
    IEEE double division both engines round identically.
    """
    from pyspark.sql import DataFrame  # noqa: F401 (signature clarity)

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = (
        docs.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col), F.explode(toks).alias("_tok"))
    )
    counts = exploded.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
            F.max("_c").cast("long").alias("max_token_count"),
        )
        .withColumn(
            "dup_token_frac",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                4,
            ),
        )
    )


def oracle_repetition_sql() -> str:
    """DuckDB twin of :func:`repetition_stats` over the ``documents`` view
    (same \\s+ split, same exact counts, same double division)."""
    return """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    counts AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct_tokens,
           CAST(max(c) AS BIGINT) AS max_token_count,
           round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4)
               AS dup_token_frac
    FROM counts GROUP BY doc_id
    """
