"""Deduplication family over the ``documents`` table: exact, char-shingle
MinHash + LSH banding, n-gram Jaccard verification, and SimHash.

Everything is a composition of built-in DataFrame ops (explode / groupBy /
self-join) — JVM-side, codegen'd, shuffle-aware. Hash functions are chosen
for *cross-engine determinism* (md5 over utf-8 strings exists bit-identically
in Spark and DuckDB), so each step has an exact SQL oracle.

Scale shape (100 TB corpus):
- shingling explodes ~L rows per doc — a narrow map-side op, no shuffle;
- signatures are one groupBy(doc) — a single shuffle on doc_id;
- LSH banding self-joins on (band, band_hash) — the join key is the bucket,
  so only docs sharing a bucket meet; hot buckets (boilerplate pages) are the
  skew risk, handled by AQE skew-join + the candidate cap;
- Jaccard verification joins shingle sets ONLY for candidate pairs (semi-join
  pushdown), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINHASH_SEEDS = [f"s{i}" for i in range(8)]
# Default banding: 2 bands x 4 rows. P(candidate) = 1-(1-j^4)^2 — steep
# enough that a word-sampled synthetic corpus (inherently self-similar)
# doesn't flood the verifier with middling-jaccard candidate pairs.
DEFAULT_BANDS: tuple[tuple[int, ...], ...] = ((0, 1, 2, 3), (4, 5, 6, 7))
SHINGLE_K = 5
SIMHASH_BITS = 16


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one keeper (min id) per distinct text."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = SHINGLE_K) -> DataFrame:
    """Distinct char k-gram shingles per doc: (doc_id, shingle)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.expr(f"sequence(1, greatest(length({text_col}) - {k - 1}, 1))")
            ).alias("pos"),
            F.col(text_col),
        )
        .select(F.col(id_col), F.substring(F.col(text_col), F.col("pos"), k).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seeds: list[str] = MINHASH_SEEDS,
    k: int = SHINGLE_K,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per doc: for each seed, min(md5(seed || shingle)).
    One shuffle (groupBy doc). Pass a persisted ``shingles_df`` when the
    shingle set is shared with other stages (LSH verify) to avoid
    recomputing the explode+distinct pipeline."""
    sh = shingles_df if shingles_df is not None else shingles(docs, text_col, id_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(seed), F.col("shingle")))).alias(f"h{i}")
        for i, seed in enumerate(seeds)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_rows(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: tuple[tuple[int, ...], ...] = DEFAULT_BANDS,
) -> DataFrame:
    """LSH band rows (id, band, bucket) from a signature table — the shared
    unit of the batch self-join (:func:`lsh_candidate_pairs`) and the
    persisted incremental index (operators/incremental.py): both banding
    paths MUST hash identically or incremental probing would silently
    diverge from batch dedup."""
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(F.concat_ws("|", *[F.col(f"h{j}") for j in cols])).alias(
                            "bucket"
                        ),
                    )
                    for bi, cols in enumerate(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: tuple[tuple[int, ...], ...] = DEFAULT_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature (rows-per-band LSH) and self-join on the band
    bucket: docs agreeing on ANY full band become a candidate pair
    (doc_a < doc_b, distinct).

    HOT-BUCKET GUARD (``max_bucket``): real web corpora carry mega-clusters
    (boilerplate, templated pages) that collapse into one band bucket, and
    an uncapped self-join emits O(m^2) candidates for a bucket of m docs.
    With a cap set, buckets above it contribute only their EXEMPLAR (the
    minimum id) on the left join side, turning the bucket's output into a
    STAR of m-1 (exemplar, other) edges — linear in m. Recall contract: a
    bucket that hot is a near-identical cluster (every member agreed on a
    full MinHash band); pairwise enumeration inside it is sacrificed, but
    cluster CONNECTIVITY — what :func:`dedup_clusters` consumes — is
    preserved whenever the exemplar verifies against the members, so dedup
    still collapses the cluster. Under-cap buckets are exact and unchanged.
    Candidate volume on a planted mega-cluster is pinned in
    tests/test_hot_bucket.py. Default ``None`` keeps the exact semantics
    (the batch catalog query's DuckDB oracle enumerates all pairs)."""
    banded = band_rows(signatures, id_col, bands)
    left = banded
    if max_bucket:
        w = Window.partitionBy("band", "bucket")
        left = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(w))
            .withColumn("_bmin", F.min(id_col).over(w))
            .filter(
                (F.col("_bn") <= F.lit(int(max_bucket)))
                | (F.col(id_col) == F.col("_bmin"))
            )
            .drop("_bn", "_bmin")
        )
    a = left.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    threshold: float = 0.0,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs only: semi-join the shingle
    sets down to candidate docs, count the intersection per pair, and divide
    by |A| + |B| - |A∩B|. The pair set is small by construction (LSH
    pre-filter), so it is broadcast to both shingle-join sides."""
    sh = shingles_df if shingles_df is not None else shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    cand_docs = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select("doc_b"))
        .distinct()
    )
    # Broadcast hints go on the JOIN INPUTS directly: a hint placed before a
    # union/distinct is stripped during optimization ("join hint ... not part
    # of a join relation" warning) and the intended broadcast silently never
    # happens. Pinned in tests/test_plans.py.
    sh_c = sh.join(F.broadcast(cand_docs), id_col, "left_semi")
    inter = (
        F.broadcast(pairs).join(sh_c.alias("sa"), F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(
            sh_c.alias("sb"),
            (F.col("doc_b") == F.col(f"sb.{id_col}"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col(f"za.{id_col}"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col(f"zb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("za.sz") + F.col("zb.sz") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 30,
    stats: "dict | None" = None,
) -> DataFrame:
    """Near-dup CLUSTER RESOLUTION — the step that lets dedup actually drop
    rows: connected components over verified duplicate pairs, each doc mapped
    to its component's minimum id. Returns (doc_id, keeper_doc_id) for EVERY
    document (singletons keep themselves); rows with keeper != self are the
    drop set.

    Implementation: iterative min-label propagation with joins + aggregates
    only (no GraphX / no RDDs). Per round every node takes the min of its
    own label, its neighbors' labels, AND its label's label (POINTER
    DOUBLING — the label-of-label shortcut halves the remaining distance to
    the component minimum each round, so convergence is O(log diameter)
    rounds instead of O(diameter): a 64-hop chain resolves in <= 7 rounds,
    pinned in tests/test_operators.py). Each round is two joins + one
    groupBy on the EDGE/LABEL sets only (not the corpus), so at 100 TB the
    loop cost scales with the duplicate graph, not the table. The
    driver-side convergence check is one count per round (bounded, like the
    CDC gate stats). ``stats``, when given, records {"rounds": n}."""
    # localCheckpoint (eager) per round: iterative algorithms MUST truncate
    # lineage, or round k replays rounds 1..k-1 and the plan grows without
    # bound; checkpointed blocks are reclaimed by the context cleaner.
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        nbr = edges.join(
            labels.select(F.col("id").alias("dst"), F.col("label")), "dst"
        ).select(F.col("src").alias("id"), "label")
        # pointer doubling: every label is itself a node id in `labels`
        # (labels start as ids and only ever take mins of ids), so a
        # self-join fetches label(label(id)); chaining it once more gives
        # label^3(id). Two shortcut hops per round cut the remaining
        # distance to the component minimum ~4x per round — O(log diameter)
        # rounds total — at the cost of two extra label-set joins (the
        # label set is the dup-graph node set, not the corpus).
        lookup = labels.select(
            F.col("id").alias("_lid"), F.col("label").alias("_l2")
        )
        hop = (
            labels.alias("l1")
            .join(lookup, F.col("l1.label") == F.col("_lid"))
            .select(F.col("l1.id").alias("id"), F.col("_l2").alias("label"))
        )
        hop2 = (
            hop.alias("h")
            .join(lookup, F.col("h.label") == F.col("_lid"))
            .select(F.col("h.id").alias("id"), F.col("_l2").alias("label"))
        )
        new_labels = (
            labels.union(nbr).union(hop).union(hop2)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:  # pragma: no cover
        raise RuntimeError(f"dedup_clusters did not converge in {max_iters} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    return docs.select(id_col).join(
        labels.select(F.col("id").alias(id_col), F.col("label")),
        id_col,
        "left",
    ).select(
        id_col,
        F.coalesce(F.col("label"), F.col(id_col)).alias("keeper_doc_id"),
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash over whitespace tokens using md5 'hyperplanes': plane j votes
    +1 when md5('p{j}:' || token) starts below hex '8' (an unbiased coin),
    -1 otherwise; bit j is set when the vote sum is positive. Expressible in
    both engines with pure string ops — no bit twiddling needed."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    votes = [
        F.sum(
            F.when(
                F.substring(F.md5(F.concat(F.lit(f"p{j}:"), F.col("tok"))), 1, 1)
                < F.lit("8"),
                1,
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> str:
    """DuckDB twin of :func:`simhash` (kept adjacent for lockstep evolution)."""
    votes = ", ".join(
        f"SUM(CASE WHEN substr(md5('p{j}:' || tok), 1, 1) < '8' THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    terms = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
        WITH toks AS (
            SELECT {id_col}, unnest(string_split_regex(trim({text_col}), '\\s+')) AS tok
            FROM {table}
        ), agg AS (
            SELECT {id_col}, {votes} FROM toks GROUP BY {id_col}
        )
        SELECT {id_col}, CAST({terms} AS BIGINT) AS simhash FROM agg
    """
