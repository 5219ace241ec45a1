"""Hot-bucket guard: a web-scale mega-cluster (boilerplate / templated
pages) collapses into a single LSH band bucket, and uncapped candidate
generation is quadratic in the cluster size. These tests plant such a
cluster and pin that

- capped candidate volume is LINEAR (exemplar star), not quadratic;
- cluster RESOLUTION is unchanged — every member still collapses to the
  cluster minimum, because star edges preserve connectivity;
- the cap is a no-op on benign data (capped == uncapped below the cap);
- the incremental probe join inherits the same guard.

The planted cluster uses IDENTICAL texts/vectors: identical content is the
worst case (all bands agree -> one bucket of size m per band) and makes the
expected star volume exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from migration_pair_spark.operators import dedup as dd
from migration_pair_spark.operators import similarity as sim
from migration_pair_spark.operators.incremental import IncrementalDeduper

MEGA = 400  # cluster size: uncapped candidates = 79,800; capped = 399
CAP = 50
BOILER = "cookie consent banner terms of service all rights reserved contact"
UNIQUE = [
    "glacier core sampling in the northern fjords",
    "orbital debris tracking telescope array survey",
    "tidal observation records from remote stations",
    "mountain weather pattern analysis for autumn",
    "harbor dredging schedule and sediment volumes",
    "wildfire smoke dispersion model calibration",
    "aquifer recharge rates beneath the high plains",
    "migratory songbird banding station summaries",
]


def _mega_docs(spark, n_mega=MEGA, n_unique=8, start=0):
    rows = [(start + i, BOILER) for i in range(n_mega)]
    rows += [
        (start + n_mega + i, UNIQUE[i]) for i in range(n_unique)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capped_candidates_are_linear_and_resolve_identically(spark):
    docs = _mega_docs(spark)
    sig = dd.minhash_signatures(docs).localCheckpoint()

    capped = dd.lsh_candidate_pairs(sig, max_bucket=CAP).localCheckpoint()
    n_capped = capped.count()
    # star over the mega-cluster (m-1 edges) + at most a few unique-side
    # pairs; nowhere near the quadratic m(m-1)/2
    assert MEGA - 1 <= n_capped <= MEGA - 1 + 10
    assert n_capped < MEGA * (MEGA - 1) // 2 // 50

    # resolution contract: the star still collapses the whole cluster
    verified = dd.jaccard_verify(docs, capped)
    keepers = dd.dedup_clusters(
        docs, verified.filter(F.col("jaccard") >= 0.5)
    )
    k = {r["doc_id"]: r["keeper_doc_id"] for r in keepers.collect()}
    assert all(k[i] == 0 for i in range(MEGA))  # every member -> cluster min
    assert all(k[MEGA + i] == MEGA + i for i in range(8))  # uniques untouched


def test_cap_is_noop_on_benign_buckets(spark):
    """Below the cap, capped and uncapped candidate sets are identical —
    the guard costs nothing on data without mega-clusters."""
    docs = _mega_docs(spark, n_mega=5, n_unique=8)
    sig = dd.minhash_signatures(docs).localCheckpoint()
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dd.lsh_candidate_pairs(sig).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dd.lsh_candidate_pairs(sig, max_bucket=CAP).collect()
    }
    assert capped == uncapped


def test_incremental_probe_is_hot_bucket_capped(spark, tmp_path):
    """Ingest a mega-cluster, then a second batch of MORE members: the probe
    join must meet only the index-side exemplar per hot bucket (linear
    candidates), yet every new member is still rejected into the cluster."""
    d = IncrementalDeduper.create(
        spark,
        str(tmp_path / "hot"),
        threshold=0.5,
        max_bucket=CAP,
    )
    d.ingest(_mega_docs(spark), "base")

    more = spark.createDataFrame(
        [(1000 + i, BOILER) for i in range(100)], "doc_id long, text string"
    )
    res = d.ingest(more, "b1")
    # candidates vs the index: 100 new docs x 1 exemplar per band (not x 400
    # seen members); within-batch star adds 99. Everything verifies at 1.0.
    assert res["n_rejected"] == 100
    n_pairs = res["pairs"].count()
    assert n_pairs <= 100 * 2 + 100  # linear band: far below 100 x 400
    k = {r["doc_id"]: r["keeper_doc_id"] for r in res["keepers"].collect()}
    assert all(k[1000 + i] == 0 for i in range(100))


def test_srp_candidates_hot_bucket_capped(spark):
    """Embedding twin: a planted identical-vector cluster emits star
    candidates per SRP table under the cap, and the cap is a no-op for the
    distinct vectors."""
    import math

    dim = 16
    mega = [
        (i, [float(math.sin(j + 1)) for j in range(dim)]) for i in range(200)
    ]
    uniq = [
        (200 + i, [float((i + 1) * (j + 1) % 7 - 3) for j in range(dim)])
        for i in range(6)
    ]
    emb = spark.createDataFrame(
        mega + uniq, "vec_id long, embedding array<float>"
    )
    capped = sim.neardup_candidates_lsh(
        emb, n_planes=4, n_tables=4, dim=dim, max_bucket=CAP
    )
    n = capped.count()
    assert 199 <= n <= 199 + 40  # star + a few unique collisions
    assert n < 200 * 199 // 2 // 50
