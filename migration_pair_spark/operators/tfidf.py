"""TF-IDF term scoring over the documents table (training-data text
analysis: characteristic-term extraction per document).

Engine-exactness: the damped form ``tf * ln(N/df)`` would hinge on the two
engines' ``ln`` agreeing to the last ulp (libm implementations differ — a
1-ulp wobble can flip a rank at a near-tie). The undamped inverse-frequency
score ``tf * N / df`` is rank-equivalent per document for fixed N and
computed here as ``double(tf*N) / double(df)`` — integer inputs below 2^53
and one correctly-rounded IEEE division, so Spark and DuckDB produce the
SAME double, and the (score DESC, term ASC) row_number tie-break cannot
diverge. (Same playbook as operators/similarity's integer cosine.)

Scale shape (100 TB of documents):
- tokenize = per-row ``regexp_extract_all`` + ``explode`` — narrow, no
  shuffle;
- tf = groupBy(doc_id, term) — ONE wide shuffle, map-side combined;
- df = groupBy(term) over the tf pairs (already distinct per doc), a second,
  much smaller shuffle (vocab-sized);
- score join on term: vocab is tiny relative to the corpus (Heaps' law) but
  can exceed the broadcast cap at web scale, so it stays a shuffle hash
  join — AQE converts it to broadcast when df fits;
- top-k per doc = row_number window partitioned by doc_id, which rides the
  tf shuffle's partitioning (WindowGroupLimit prunes to k per doc before
  the final sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z]+"


def doc_terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — term frequency per document."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per doc by tf * (N / df); ties broken by
    term. Returns (doc_id, term, tf, df, score)."""
    n_docs = docs.count()  # one scalar; the plan itself stays fully lazy
    tf = doc_terms(docs, text_col)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").withColumn(
        "score",
        (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df").cast("double"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )


def oracle_tfidf_sql(k: int = 3) -> str:
    """DuckDB twin (N computed inline; same integer-exact score)."""
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term ASC) AS rn
          FROM scored)
    WHERE rn <= {k}
    """
