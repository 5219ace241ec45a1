"""Similarity search and near-duplicate detection over an embedding column
(``array<float>``).

Three paths, as the scale plan requires:

- **Brute-force cosine top-k** (the correctness baseline): broadcast the
  query set, compute dot products with ``zip_with`` + ``aggregate`` (pure
  Catalyst higher-order functions, JVM-side — no Python in the hot path),
  rank per query. Cost O(|queries| x |corpus|); right answer, small queries.
- **LSH-bucketed ANN** (the scale path for top-k): sign-random-projection
  signatures, bucket join, exact cosine rank within the candidate set.
- **LSH-bucketed near-dup pairs** (the scale path for dedup): the same SRP
  buckets drive a bucket self-join; only co-bucketed pairs are verified with
  exact cosine. No all-pairs/cartesian join anywhere (plan-pinned in
  tests/test_plans.py).

Cross-engine determinism (what makes the DuckDB oracles EXACT, not
approximate): all signature and dot-product math is INTEGER math.

- Embeddings are quantized once: ``q_i = round(v_i * 1e6)`` as BIGINT —
  identical in both engines (float->double cast is exact; round-half-away
  matches; values never land on a representable .5 boundary in practice).
- Hyperplanes are Rademacher (+1/-1) weights derived from
  ``md5('t{t}p{p}i{i}')`` — regenerable bit-identically in any engine with
  an md5 function, so the oracle SELF-GENERATES the planes instead of
  embedding thousands of float literals. (Same trick as
  operators/dedup.simhash; SRP with +-1 weights is a valid LSH family.)
- Signature bits and pair dots are integer sums — order-independent, so
  Spark's sequential ``aggregate`` and DuckDB's unordered ``sum`` agree
  exactly (float sums would differ in the last ulp and could flip a sign).
- Cosine = ``double(dot) / sqrt(double(n2_a) * double(n2_b))``: the inputs
  are exact integers below 2^53, and IEEE-754 division/multiply/sqrt are
  correctly rounded, so both engines produce the SAME double — ranking and
  thresholding cannot diverge.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Quantization step: 1e-6 of the embedding's unit scale. 64 dims x (4e6)^2
# per dot term keeps every sum far below 2^62 (no BIGINT overflow).
QUANT = 1_000_000
EMB_DIM = 64


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


# --------------------------------------------------------- integer SRP LSH


def srp_weights(n_tables: int, n_planes: int, dim: int = EMB_DIM) -> list:
    """Rademacher hyperplane weights: w[t][p][i] = +1 iff the first hex char
    of md5('t{t}p{p}i{i}') is below '8', else -1 — an unbiased coin any
    engine reproduces (the DuckDB oracle regenerates these in SQL)."""
    return [
        [
            [
                1
                if hashlib.md5(f"t{t}p{p}i{i}".encode()).hexdigest()[0] < "8"
                else -1
                for i in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def quantized(vec_col) -> F.Column:
    """array<float> -> array<long>: each value rounded at 1e-6."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(float(QUANT))).cast("long")
    )


def _int_dot(a, b) -> F.Column:
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _srp_sig_udf(weights: list):
    """Arrow-batched signature kernel: all tables' bucket strings for a batch
    of QUANTIZED (int64) vectors in ONE numpy matmul.

    Why a UDF here when 'UDFs are the slow path': the signature is dense
    linear algebra — n_tables*n_planes signed sums per row. The pure-Catalyst
    formulation (an ``aggregate`` fold per plane over a 64-literal array) is
    interpreted per element: measured 10.1 s for 2,000 vectors x 32 planes at
    sf0.1, vs ~0.1 s for the equivalent (B,64)@(64,32) int64 matmul. The math
    is IDENTICAL — integer sums, order-independent — so the exact DuckDB
    oracle is untouched; quantization stays in Catalyst (``quantized``), so
    no float rounding happens in Python at all."""
    from pyspark.sql.pandas.functions import pandas_udf

    n_tables, n_planes = len(weights), len(weights[0])
    dim = len(weights[0][0])
    # (dim, n_tables*n_planes) int64 plane matrix, planes of a table adjacent
    w_mat = np.array(weights, dtype=np.int64).reshape(n_tables * n_planes, -1).T
    pow2 = 1 << np.arange(n_planes - 1, -1, -1, dtype=np.int64)

    @pandas_udf("array<string>")
    def sig(q: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype=object)
        # Degraded inputs mirror the SQL oracle exactly: a NULL vector has no
        # unnest rows -> no signature (return null: posexplode emits nothing);
        # a short vector contributes only its present dims (zero-pad), extra
        # dims beyond the plane matrix contribute nothing (truncate).
        mat = np.zeros((len(q), dim), dtype=np.int64)
        valid = np.ones(len(q), dtype=bool)
        for i, v in enumerate(q):
            if v is None:
                valid[i] = False
                continue
            # element-level nulls arrive as None/NaN (object or float
            # array); the oracle's unnest+sum skips them, i.e. they
            # contribute 0 — map through float64 (exact below 2^53) and
            # zero the NaNs instead of crashing the kernel (review-caught)
            a = np.asarray(v, dtype=np.float64)[:dim]
            a = np.nan_to_num(a, nan=0.0).astype(np.int64)
            mat[i, : len(a)] = a
        bits = (mat @ w_mat) >= 0  # (B, n_tables*n_planes)
        codes = bits.reshape(len(q), n_tables, n_planes).astype(np.int64) @ pow2
        # bucket strings via a lookup over the batch's DISTINCT codes — O(unique),
        # never the 2**n_planes table a literal LUT would need
        fmt = {c: format(c, f"0{n_planes}b") for c in np.unique(codes)}
        out = [
            [fmt[c] for c in row] if ok else None
            for row, ok in zip(codes.tolist(), valid.tolist())
        ]
        return pd.Series(out)

    return sig


def _srp_bucket_rows(
    df: DataFrame,
    out_id: str,
    id_col: str,
    vec_col: str,
    weights: list,
) -> DataFrame:
    """(id, vec) -> exploded (out_id, _t, _bucket): one row per LSH table,
    bucket = the table's bit-string signature over the quantized vector.
    Quantization is Catalyst (exact, shared with the verify stage); the
    signed sums run as one Arrow-batched integer matmul (see _srp_sig_udf)."""
    sig = _srp_sig_udf(weights)
    return (
        df.select(F.col(id_col).alias(out_id), quantized(vec_col).alias("_q"))
        .select(out_id, F.posexplode(sig(F.col("_q"))).alias("_t", "_bucket"))
    )


def _quantized_side(df: DataFrame, out_id: str, id_col: str, vec_col: str) -> DataFrame:
    """(id, quantized vector, integer squared norm) for exact-cosine verify."""
    qv = quantized(vec_col)
    return df.select(
        F.col(id_col).alias(out_id), qv.alias(f"_q_{out_id}")
    ).withColumn(f"_n2_{out_id}", _int_dot(F.col(f"_q_{out_id}"), F.col(f"_q_{out_id}")))


def _exact_cosine(dot_col, n2_a, n2_b) -> F.Column:
    """double(dot)/sqrt(double(n2a)*double(n2b)) — the one shared formula both
    engines must use verbatim (ulp-identical given exact integer inputs)."""
    return dot_col.cast("double") / F.sqrt(
        n2_a.cast("double") * n2_b.cast("double")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = EMB_DIM,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent SRP signatures; a corpus
    vector is a candidate for a query iff they share a bucket in ANY table.
    Then exact cosine rank over the (much smaller) candidate set.

    Scale shape: the bucket join carries ONLY ids — candidate dedup
    (``distinct``) never shuffles the vectors; they are re-attached to the
    deduped pairs afterwards (one hash join per side)."""
    w = srp_weights(n_tables, n_planes, dim)
    qb = _srp_bucket_rows(queries, "query_id", id_col, vec_col, w)
    cb = _srp_bucket_rows(corpus, "neighbor_id", id_col, vec_col, w)
    cand = (
        cb.join(F.broadcast(qb), ["_t", "_bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qs = _quantized_side(queries, "query_id", id_col, vec_col)
    cs = _quantized_side(corpus, "neighbor_id", id_col, vec_col)
    sim = _exact_cosine(
        _int_dot(F.col("_q_query_id"), F.col("_q_neighbor_id")),
        F.col("_n2_query_id"),
        F.col("_n2_neighbor_id"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(F.broadcast(qs), "query_id")
        .join(cs, "neighbor_id")
        .withColumn("_sim", sim)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_sim"), round_to).alias("cosine"),
        )
    )


def neardup_params(threshold: float) -> tuple[int, int]:
    """Threshold-adaptive SRP parameterization (n_planes, n_tables).

    SRP collision probability per table is ``(1 - theta/pi)^n_planes``; the
    knee that makes LSH *selective* (candidates a few percent of all pairs
    while recall stays ~1) moves with the threshold:

    - cosine >= 0.8 (production near-dup regime — quasi-duplicate training
      documents): (8, 8). A random/orthogonal pair collides in a table with
      p = 0.5^8 = 0.0039, union over 8 tables ~3% of pairs; a cosine-0.99
      pair is caught with p > 0.9999. Candidate volume is pinned (< 5% of
      all pairs) in tests/test_operators.py on the planted hi-sim fixture.
    - 0.6 <= cosine < 0.8: (4, 16).
    - cosine < 0.6 (this repo's synthetic corpus, 'near-dups' at 0.35-0.5
      where ANY LSH family is weakly selective): (2, 24), tuned for recall
      1.0 vs the all-pairs oracle at every shipped sf — the regime the
      low-threshold CORRECTNESS row proves exact."""
    if threshold >= 0.8:
        return 8, 8
    if threshold >= 0.6:
        return 4, 16
    return 2, 24


def neardup_candidates_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 2,
    n_tables: int = 24,
    dim: int = EMB_DIM,
    max_bucket: int | None = None,
) -> DataFrame:
    """SRP bucket self-join candidate pairs (vec_a < vec_b), ids only through
    the distinct. Exposed separately from :func:`neardup_pairs_lsh` so tests
    can pin candidate VOLUME (selectivity), not just plan shape.

    ``max_bucket`` is the hot-bucket guard (same exemplar-star policy and
    recall contract as dedup.lsh_candidate_pairs — the cap runs through the
    shared dedup.capped_self_join, tiny-agg + broadcast, never a window
    sort): SRP buckets above the cap contribute only their minimum-id
    exemplar on the left join side, so an embedding mega-cluster emits
    O(m) star candidates instead of O(m^2). Default ``None`` = exact
    enumeration (required by the all-pairs oracles; at permissive
    thresholds SRP buckets are inherently coarse, so production ingest
    sets the cap via IncrementalEmbeddingIndex)."""
    from migration_pair_spark.operators.dedup import capped_self_join

    w = srp_weights(n_tables, n_planes, dim)
    b = _srp_bucket_rows(emb, "vec_id_x", id_col, vec_col, w)
    return capped_self_join(
        b, ["_t", "_bucket"], "vec_id_x", max_bucket, "vec_a", "vec_b"
    )


def neardup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int | None = None,
    dim: int = EMB_DIM,
    round_to: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs, scale-shaped: SRP bucket self-join for
    candidates (ids only through the distinct), exact integer-quantized
    cosine verify >= ``threshold``. Mirrors the candidates+verify structure
    of operators/dedup.lsh_dup_pairs; no all-pairs join.

    ``n_planes``/``n_tables`` default to the threshold-adaptive
    :func:`neardup_params` — at production thresholds (>= 0.8) candidates
    prune to a few percent of all pairs (volume pinned in
    tests/test_operators.py); at this repo's synthetic low-threshold regime
    the parameters are tuned for recall 1.0 vs the all-pairs oracle."""
    if n_planes is None or n_tables is None:
        d_planes, d_tables = neardup_params(threshold)
        n_planes = n_planes if n_planes is not None else d_planes
        n_tables = n_tables if n_tables is not None else d_tables
    cand = neardup_candidates_lsh(
        emb, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables, dim=dim,
    )
    qa = _quantized_side(emb, "vec_a", id_col, vec_col)
    qb = _quantized_side(emb, "vec_b", id_col, vec_col)
    sim = _exact_cosine(
        _int_dot(F.col("_q_vec_a"), F.col("_q_vec_b")),
        F.col("_n2_vec_a"),
        F.col("_n2_vec_b"),
    )
    return (
        cand.join(qa, "vec_a")
        .join(qb, "vec_b")
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= F.lit(threshold))
        .select("vec_a", "vec_b", F.round(F.col("_sim"), round_to).alias("cosine"))
    )


# ----------------------------------------------------------- DuckDB oracles

_QUANT_EX = f"""
    ex AS (
        SELECT vec_id,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * {QUANT}) AS BIGINT) AS q,
               CAST(unnest(range(len(embedding))) AS INT) AS i
        FROM embeddings
    ),
    norms AS (SELECT vec_id, sum(q * q) AS n2 FROM ex GROUP BY vec_id)
"""


def _planes_sql(n_tables: int, n_planes: int, dim: int = EMB_DIM) -> str:
    """SQL that regenerates srp_weights() inside DuckDB (same md5 rule)."""
    return f"""
    planes AS (
        SELECT CAST(tt.t AS INT) AS t, CAST(pp.p AS INT) AS p, CAST(ii.i AS INT) AS i,
               CASE WHEN substr(md5('t' || tt.t || 'p' || pp.p || 'i' || ii.i), 1, 1) < '8'
                    THEN 1 ELSE -1 END AS w
        FROM (SELECT unnest(range({n_tables})) AS t) tt,
             (SELECT unnest(range({n_planes})) AS p) pp,
             (SELECT unnest(range({dim})) AS i) ii
    )"""


def _sig_sql() -> str:
    return """
    bits AS (
        SELECT e.vec_id, pl.t, pl.p,
               CASE WHEN sum(e.q * pl.w) >= 0 THEN '1' ELSE '0' END AS bit
        FROM ex e JOIN planes pl ON pl.i = e.i
        GROUP BY e.vec_id, pl.t, pl.p
    ),
    sig AS (
        SELECT vec_id, t, string_agg(bit, '' ORDER BY p) AS bucket
        FROM bits GROUP BY vec_id, t
    )"""


def ann_lsh_oracle_sql(
    k: int = 3, n_planes: int = 4, n_tables: int = 8, query_max_id: int = 5
) -> str:
    """Exact DuckDB twin of :func:`ann_lsh_topk` over the ``embeddings``
    view: same quantization, same md5-derived planes, same integer dots, same
    cosine formula — identical rows by construction."""
    return f"""
    WITH {_QUANT_EX},
    {_planes_sql(n_tables, n_planes)},
    {_sig_sql()},
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM sig q JOIN sig c ON q.t = c.t AND q.bucket = c.bucket
                               AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {query_max_id}
    ),
    dots AS (
        SELECT cand.query_id, cand.neighbor_id, sum(a.q * b.q) AS dot
        FROM cand
        JOIN ex a ON a.vec_id = cand.query_id
        JOIN ex b ON b.vec_id = cand.neighbor_id AND b.i = a.i
        GROUP BY cand.query_id, cand.neighbor_id
    ),
    sims AS (
        SELECT query_id, neighbor_id,
               CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS sim
        FROM dots JOIN norms na ON na.vec_id = query_id
                  JOIN norms nb ON nb.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM sims)
    WHERE rn <= {k}
    """


def neardup_oracle_sql(threshold: float = 0.35) -> str:
    """All-pairs ground truth for :func:`neardup_pairs_lsh` (quantized cosine,
    same formula). The LSH operator must return EXACTLY this set — i.e. the
    oracle independently proves recall 1.0 at the tested sf, not merely that
    the LSH pipeline agrees with itself."""
    return f"""
    WITH {_QUANT_EX},
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.q * b.q) AS dot
        FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    sims AS (
        SELECT vec_a, vec_b,
               CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS sim
        FROM dots JOIN norms na ON na.vec_id = vec_a
                  JOIN norms nb ON nb.vec_id = vec_b
    )
    SELECT vec_a, vec_b, round(sim, 4) AS cosine
    FROM sims WHERE sim >= {threshold}
    """


# ------------------------------------------- production-regime hi-sim fixture

HI_DUP_EVERY = 5
HI_ID_OFFSET = 1_000_000
HI_AMP = 0.1


def hi_sim_corpus(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dup_every: int = HI_DUP_EVERY,
    id_offset: int = HI_ID_OFFSET,
    amp: float = HI_AMP,
) -> DataFrame:
    """Deterministic production-regime corpus DERIVED from the embeddings
    table (no external data): every ``dup_every``-th vector gets a planted
    near-duplicate at ``vec_id + id_offset`` whose elements are scaled by
    ``1 +- amp`` (sign from ``md5('hi{id}i{i}')`` — the same engine-neutral
    coin as :func:`srp_weights`, so the DuckDB oracle regenerates the corpus
    bit-identically).

    Geometry: elementwise scaling by 1+-amp with random signs keeps
    cosine(original, dup) ~= 1/sqrt(1+amp^2) (~0.995 at amp=0.1) while
    background pairs stay at the corpus's own spread (<~0.5) — so a 0.9
    threshold separates planted pairs from background by a wide margin, the
    regime where SRP-LSH is genuinely selective. All arithmetic is
    double-precision IEEE ops both engines round identically, and the
    quantized integer pipeline downstream is exact, so the all-pairs oracle
    remains EXACT, not approximate."""
    def _sign(i):
        return F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("hi"),
                        F.col(id_col).cast("string"),
                        F.lit("i"),
                        i.cast("string"),
                    )
                ),
                1,
                1,
            )
            < "8",
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    # both branches are narrow projections — the fixture adds ZERO shuffles
    base = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
    )
    # two selects: the perturbation must see the ORIGINAL id (the md5 coin is
    # seeded by it), and Spark's lateral-column-alias resolution would bind
    # the lambda's id reference to a same-select `id + offset` alias
    dups = (
        emb.filter(F.col(id_col) % dup_every == 0)
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col),
                lambda x, i: x.cast("double") * (F.lit(1.0) + F.lit(amp) * _sign(i)),
            ).alias(vec_col),
        )
        .select((F.col(id_col) + id_offset).alias(id_col), F.col(vec_col))
    )
    return base.unionByName(dups)


def _hi_ex_sql(
    dup_every: int = HI_DUP_EVERY, id_offset: int = HI_ID_OFFSET, amp: float = HI_AMP
) -> str:
    """DuckDB CTEs regenerating :func:`hi_sim_corpus` in quantized space:
    same md5 coin, same double ops in the same order (x * factor, then
    * QUANT, then round) — identical BIGINTs by IEEE determinism."""
    return f"""
    ex0 AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
               CAST(unnest(range(len(embedding))) AS INT) AS i
        FROM embeddings
    ),
    ex AS (
        SELECT vec_id, CAST(round(v * {QUANT}) AS BIGINT) AS q, i FROM ex0
        UNION ALL
        SELECT vec_id + {id_offset},
               CAST(round((v * (1.0 + {amp!r} * (CASE WHEN substr(md5('hi' || CAST(vec_id AS VARCHAR) || 'i' || CAST(i AS VARCHAR)), 1, 1) < '8' THEN 1.0 ELSE -1.0 END))) * {QUANT}) AS BIGINT),
               i
        FROM ex0 WHERE vec_id % {dup_every} = 0
    ),
    norms AS (SELECT vec_id, sum(q * q) AS n2 FROM ex GROUP BY vec_id)
"""


def neardup_hi_oracle_sql(threshold: float = 0.9) -> str:
    """All-pairs ground truth over the derived hi-sim corpus (same quantized
    cosine): the production-regime twin of :func:`neardup_oracle_sql`. The
    LSH operator at threshold-adaptive (8 planes, 8 tables) must return
    EXACTLY this set — recall 1.0 at a setting where candidates are also
    pinned to < 5% of all pairs (volume assertion in tests)."""
    return f"""
    WITH {_hi_ex_sql()},
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.q * b.q) AS dot
        FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    sims AS (
        SELECT vec_a, vec_b,
               CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS sim
        FROM dots JOIN norms na ON na.vec_id = vec_a
                  JOIN norms nb ON nb.vec_id = vec_b
    )
    SELECT vec_a, vec_b, round(sim, 4) AS cosine
    FROM sims WHERE sim >= {threshold}
    """


# ------------------------------------------------------------- IVF-flat ANN


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: (centroids, assignment).

    Centroids are the ``n_cells`` corpus vectors with the smallest
    ``md5('ivf:' || id)`` — a deterministic, engine-reproducible seeding
    (k-means++-style refinement would be Lloyd iterations, each one
    broadcast-score + groupBy-mean pass; deliberately omitted so the cell
    assignment stays integer-exact and the DuckDB oracle stays EXACT rather
    than recall-bounded). Assignment: every vector joins its max-cosine
    centroid, ties to the smaller centroid id.

    Scale shape: the centroid table is O(n_cells) rows and BROADCAST; the
    scoring "cross join" is the legitimate IVF cost O(N x n_cells) with no
    shuffle of the corpus, and the argmax is a map-side-combined ``max_by``
    groupBy on the vector id (rows per key = n_cells, bounded).
    """
    cents = (
        emb.orderBy(F.md5(F.concat(F.lit("ivf:"), F.col(id_col).cast("string"))))
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cent_id"), quantized(vec_col).alias("_cq")
        )
        .withColumn("_cn2", _int_dot(F.col("_cq"), F.col("_cq")))
        # n_cells rows, but its lineage is a full-corpus ordered limit —
        # referenced by assignment AND query probing, so materialize once
        # (localCheckpoint: eager, context-cleaner-reclaimed). The CORPUS
        # scans (assign + verify) deliberately stay uncached: pinning 10^9
        # quantized vectors costs more than rescanning parquet.
        .localCheckpoint()
    )
    scored = (
        emb.select(F.col(id_col).alias("_vid"), quantized(vec_col).alias("_vq"))
        .withColumn("_vn2", _int_dot(F.col("_vq"), F.col("_vq")))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "_sim",
            _exact_cosine(
                _int_dot(F.col("_vq"), F.col("_cq")), F.col("_vn2"), F.col("_cn2")
            ),
        )
    )
    assign = scored.groupBy(F.col("_vid").alias(id_col)).agg(
        F.max_by("cent_id", F.struct(F.col("_sim"), -F.col("cent_id"))).alias("cell")
    )
    return cents, assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: score each query against the centroid
    table, probe its ``nprobe`` best cells, exact-cosine-rank only the
    vectors assigned to those cells.

    Scale shape: candidate generation is a hash equi-join on ``cell`` —
    the inverted-list probe — so per-query work is O(nprobe/n_cells) of the
    corpus, and the corpus can be PARTITIONED BY cell on disk so a probe
    prunes file listings, not just rows. Complements ann_lsh_topk (same
    verify; different, data-adaptive bucketing)."""
    cents, assign = ivf_assign(corpus, n_cells, id_col, vec_col)
    probes = (
        queries.select(F.col(id_col).alias("query_id"), quantized(vec_col).alias("_qq"))
        .withColumn("_qn2", _int_dot(F.col("_qq"), F.col("_qq")))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "_sim",
            _exact_cosine(
                _int_dot(F.col("_qq"), F.col("_cq")), F.col("_qn2"), F.col("_cn2")
            ),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_sim").desc(), F.col("cent_id").asc()
                )
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", F.col("cent_id").alias("cell"))
    )
    cand = (
        assign.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    qs = _quantized_side(queries, "query_id", id_col, vec_col)
    cs = _quantized_side(corpus, "neighbor_id", id_col, vec_col)
    sim = _exact_cosine(
        _int_dot(F.col("_q_query_id"), F.col("_q_neighbor_id")),
        F.col("_n2_query_id"),
        F.col("_n2_neighbor_id"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(F.broadcast(qs), "query_id")
        .join(cs, "neighbor_id")
        .withColumn("_sim", sim)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_sim"), round_to).alias("cosine"),
        )
    )


def ivf_oracle_sql(
    k: int = 3, n_cells: int = 8, nprobe: int = 3, query_max_id: int = 5
) -> str:
    """Exact DuckDB twin of :func:`ivf_topk`: same md5-seeded centroids, same
    integer cosine, same (sim DESC, id ASC) tie-breaks at every rank step."""
    return f"""
    WITH {_QUANT_EX},
    cents AS (
        SELECT vec_id AS cent_id FROM embeddings
        ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)) LIMIT {n_cells}
    ),
    cdots AS (
        SELECT v.vec_id, c.cent_id, sum(v.q * ce.q) AS dot
        FROM ex v JOIN cents c ON TRUE
                  JOIN ex ce ON ce.vec_id = c.cent_id AND ce.i = v.i
        GROUP BY v.vec_id, c.cent_id
    ),
    csims AS (
        SELECT d.vec_id, d.cent_id,
               CAST(d.dot AS DOUBLE) / sqrt(CAST(nv.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS sim
        FROM cdots d JOIN norms nv ON nv.vec_id = d.vec_id
                     JOIN norms nc ON nc.vec_id = d.cent_id
    ),
    assign AS (
        SELECT vec_id, cent_id AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY sim DESC, cent_id ASC) AS rn
            FROM csims) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cent_id AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY sim DESC, cent_id ASC) AS rn
            FROM csims WHERE vec_id < {query_max_id}) WHERE rn <= {nprobe}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    ),
    dots AS (
        SELECT cand.query_id, cand.neighbor_id, sum(a.q * b.q) AS dot
        FROM cand
        JOIN ex a ON a.vec_id = cand.query_id
        JOIN ex b ON b.vec_id = cand.neighbor_id AND b.i = a.i
        GROUP BY cand.query_id, cand.neighbor_id
    ),
    sims AS (
        SELECT query_id, neighbor_id,
               CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS sim
        FROM dots JOIN norms na ON na.vec_id = query_id
                  JOIN norms nb ON nb.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM sims)
    WHERE rn <= {k}
    """


def neardup_clusters_oracle_sql(threshold: float = 0.35) -> str:
    """Recursive-CTE oracle for embedding near-dup cluster resolution:
    all-pairs ground-truth edges (same integer cosine as neardup_oracle_sql),
    connected components via recursive reachability, keeper = min vec_id."""
    return f"""
    WITH RECURSIVE {_QUANT_EX},
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.q * b.q) AS dot
        FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    sims AS (
        SELECT vec_a, vec_b,
               CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS sim
        FROM dots JOIN norms na ON na.vec_id = vec_a
                  JOIN norms nb ON nb.vec_id = vec_b
    ),
    edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM sims WHERE sim >= {threshold}
        UNION ALL
        SELECT vec_b, vec_a FROM sims WHERE sim >= {threshold}
    ),
    reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
    ),
    lab AS (SELECT id, min(r) AS keeper FROM reach GROUP BY id)
    SELECT v.vec_id, coalesce(l.keeper, v.vec_id) AS keeper_vec_id
    FROM embeddings v LEFT JOIN lab l ON l.id = v.vec_id
    """
