"""SemDeDup (Abbas et al. 2023) — cluster-then-prune semantic dedup.

Pins:
1. the paper's keep-rule: within a cell, LOW-centroid-similarity items
   survive; their near-duplicates packed closer to the center are pruned;
2. the released implementation's upper-triangular semantics: a pruned
   item still shadows later items (NOT sequential greedy);
3. the id contract: every input id comes back exactly once, kept+pruned;
4. prune-set monotonicity in the threshold;
5. literal-projection and broadcast-argmax assignment paths agree.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops import similarity
from phphinder_spark.ops.dedup import semantic_dedup

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def embeddings(spark):
    if not os.path.exists(f"{SF_DIR}/embeddings.parquet"):
        pytest.skip("testdata not available")
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()

CENTS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]


def _arc(theta):
    # unit vectors on the (x, z) arc: cosine to centroid 0 == cos(theta),
    # cosine between two arc points == cos(|t1 - t2|)
    return [math.cos(theta), 0.0, math.sin(theta), 0.0]


@pytest.fixture()
def arc_emb(spark):
    rows = [
        (1, _arc(0.5)),   # farthest from c0 -> earliest in keep order
        (2, _arc(0.3)),   # cos to v1 = cos(0.2) ~ 0.980 -> pruned by v1
        (3, _arc(0.1)),   # cos to v1 = cos(0.4) ~ 0.921 < t, but cos to
                          # v2 = cos(0.2) >= t -> pruned by the PRUNED v2
        (4, [0.0, 1.0, 0.0, 0.0]),  # alone in cell 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_keep_rule_and_triu_shadowing(arc_emb):
    t = round(math.cos(0.25), 6)  # ~0.9689: catches 0.2-rad gaps only
    out = {r["vec_id"]: r for r in semantic_dedup(arc_emb, CENTS, t).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["kept"] and out[4]["kept"]
    # v2: duplicate of the farther-out v1 -> pruned (keep-low-cent-sim)
    assert not out[2]["kept"]
    # v3: only duplicate of the PRUNED v2 -> still pruned (triu shadowing;
    # sequential greedy would have kept it)
    assert not out[3]["kept"]
    assert out[1]["cid"] == out[2]["cid"] == out[3]["cid"] == 0
    assert out[4]["cid"] == 1
    # cent_sim is the round-6 cosine to the winning centroid
    assert out[1]["cent_sim"] == pytest.approx(math.cos(0.5), abs=1e-6)


def test_id_contract_and_threshold_monotonicity(spark, embeddings):
    emb = embeddings.withColumn("embedding", F.col("embedding").cast("array<double>"))
    cents = [
        (int(r["vec_id"]), list(r["cv"]))
        for r in emb.select(
            "vec_id", similarity._normalized("embedding").alias("cv")
        )
        .orderBy("vec_id")
        .limit(4)
        .collect()
    ]
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    pruned_by_t = {}
    for t in (0.3, 0.5, 0.9):
        out = semantic_dedup(emb, cents, threshold=t).collect()
        assert [r["vec_id"] for r in out] != []
        assert {r["vec_id"] for r in out} == ids and len(out) == len(ids)
        pruned_by_t[t] = {r["vec_id"] for r in out if not r["kept"]}
    # raising the threshold can only shrink the pruned set (keep order is
    # threshold-independent, so prune decisions nest)
    assert pruned_by_t[0.9] <= pruned_by_t[0.5] <= pruned_by_t[0.3]


def test_max_cell_subblocking_on_planted_giant_cell(spark):
    """A 10x-median giant cell must not be compared all-pairs under
    max_cell: identical duplicate groups are still pruned exactly (same
    verdicts as the exact path — duplicates share every SRP bucket), and
    the candidate-pair count inside the giant cell drops from |cell|^2/2
    to the SRP-bucketed total."""
    import random

    from phphinder_spark.ops.similarity import (
        rademacher_planes,
        srp_bucket_col,
    )

    rng = random.Random(7)
    dim = 16

    def _unit():
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # ONE centroid -> every vector lands in cell 0 by construction: a
    # guaranteed giant cell of 30 near-orthogonal random bases (pairwise
    # cosine ~N(0, 1/4), far below threshold), each duplicated 4x
    c0 = [1.0] + [0.0] * (dim - 1)
    rows = []
    vid = 0
    for _ in range(30):
        base = _unit()
        for _ in range(4):
            rows.append((vid, list(base)))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, c0)]

    exact = {r["vec_id"]: r["kept"]
             for r in semantic_dedup(emb, cents, 0.999).collect()}
    sub = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(emb, cents, 0.999, max_cell=20).collect()}
    # identical-vector groups collide in every SRP table -> same verdicts
    assert sub == exact
    # exactly one of each 4-dup group survives in the giant cell
    assert sum(1 for k in sub.values() if k) == 30

    # quadratic-domination check: bucketed candidate pairs << all-pairs
    planes = rademacher_planes(dim, 8, 6, 42)
    norm = similarity._normalized("embedding")
    buckets = emb.where(F.col("vec_id") < 120).select(
        "vec_id",
        F.posexplode(
            F.array(*[srp_bucket_col(norm, planes[t]) for t in range(6)])
        ).alias("tbl", "bkt"),
    )
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["tbl", "bkt"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    all_pairs = 120 * 119 // 2
    assert cand < all_pairs / 4


def test_max_cell_validation_and_noop_when_small(arc_emb):
    with pytest.raises(ValueError, match="max_cell"):
        semantic_dedup(arc_emb, CENTS, 0.95, max_cell=1)
    # every cell under budget: identical result to the exact default
    t = round(math.cos(0.25), 6)
    key = lambda rows: sorted(
        (r["vec_id"], r["cid"], r["cent_sim"], r["kept"]) for r in rows
    )
    assert key(semantic_dedup(arc_emb, CENTS, t, max_cell=50).collect()) == \
        key(semantic_dedup(arc_emb, CENTS, t).collect())


def test_assignment_paths_agree(arc_emb, monkeypatch):
    lit = semantic_dedup(arc_emb, CENTS, 0.95).collect()
    monkeypatch.setattr(similarity, "_IVF_LITERAL_MAX_CENTROIDS", 0)
    bc = semantic_dedup(arc_emb, CENTS, 0.95).collect()
    key = lambda rows: sorted(
        (r["vec_id"], r["cid"], r["cent_sim"], r["kept"]) for r in rows
    )
    assert key(lit) == key(bc)


# ------------------------- quality-aware cluster canonicalization


def test_cluster_representatives_keep_longest_and_ties(spark):
    from phphinder_spark.ops.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [
            (1, "short text"),
            (2, "a much longer text with many more words here"),
            (3, "three words long"),   # same len as 4 -> tie to lowest id
            (4, "also three words"),
            (5, "singleton doc"),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)], "doc_id long, cluster_id long"
    )
    out = {r["doc_id"]: r for r in cluster_representatives(docs, clusters).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert not out[1]["is_rep"] and out[2]["is_rep"]     # longest wins
    assert out[3]["is_rep"] and not out[4]["is_rep"]     # tie -> lowest id
    assert out[5]["is_rep"]                              # singleton survives
    assert out[2]["score"] == 9
    # exactly one representative per cluster
    reps = [r for r in out.values() if r["is_rep"]]
    assert sorted(r["cluster_id"] for r in reps) == [1, 3, 5]


def test_cluster_representatives_custom_score(spark):
    from phphinder_spark.ops.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [(1, "aaaa bbbb", 0.2), (2, "cc", 0.9)],
        "doc_id long, text string, quality double",
    )
    clusters = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    out = {
        r["doc_id"]: r["is_rep"]
        for r in cluster_representatives(
            docs, clusters, score=(F.col("quality") * 100)
        ).collect()
    }
    # by token count doc 1 would win; by the caller's quality column doc 2 does
    assert out == {1: False, 2: True}
