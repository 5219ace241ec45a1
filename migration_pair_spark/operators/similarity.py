"""Similarity search over an embedding column (array<float>).

Two paths, as the scale plan requires:

- **Brute-force cosine top-k** (the correctness baseline): broadcast the
  query set, compute dot products with ``zip_with`` + ``aggregate`` (pure
  Catalyst higher-order functions, JVM-side — no Python in the hot path),
  rank per query. Cost O(|queries| x |corpus|); right answer, small queries.
- **LSH-bucketed ANN** (the scale path): sign-random-projection signatures
  from a seeded, driver-generated hyperplane set embedded as literal arrays
  (deterministic, still no UDF), bucket join, cosine rank within bucket.
  Cost O(|corpus|) + bucket-local ranking; approximate recall, tested
  against the brute-force baseline in tests/test_operators.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded). Returns
    (query_id, neighbor_id, cosine). Query side is broadcast; ties broken by
    neighbor id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    sim = F.when(
        (_norm(F.col("_qv")) == 0) | (_norm(F.col("_cv")) == 0), F.lit(0.0)
    ).otherwise(_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("_sim", sim)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_sim"), round_to).alias("cosine"),
        )
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes for sign-random-projection LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def srp_signature(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Bit-string signature: one char per plane ('1' if dot >= 0). Planes are
    literal arrays, so the whole signature is a Catalyst expression."""
    bits = [
        F.when(
            _dot(F.col(vec_col), F.array(*[F.lit(w) for w in plane])) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent SRP signatures; a corpus
    vector is a candidate for a query iff they share a bucket in ANY table.
    Then exact cosine rank over the (much smaller) candidate set."""
    tables = [
        hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            F.col(vec_col),
            F.explode(
                F.array(
                    *[
                        F.concat(F.lit(f"t{t}:"), srp_signature(vec_col, planes))
                        for t, planes in enumerate(tables)
                    ]
                )
            ).alias("_bucket"),
        )

    qb = with_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)), "query_id"
    ).withColumnRenamed(vec_col, "_qv")
    cb = with_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        "neighbor_id",
    ).withColumnRenamed(vec_col, "_cv")

    cand = (
        cb.join(F.broadcast(qb), ["_bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .distinct()
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (
        _norm(F.col("_qv")) * _norm(F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("_sim", sim)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_sim"), round_to).alias("cosine"),
        )
    )
