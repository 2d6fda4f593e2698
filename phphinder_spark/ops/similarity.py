"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness oracle. The
  query side is tiny and broadcast; the corpus side is scanned once, scored
  with JVM higher-order functions (zip_with/aggregate — no Python in the
  hot path), then per-query top-k via window rank (partitioned by query id,
  so the sort is per-group, never global).
- ``srp_lsh_topk``: sign-random-projection LSH bucketing — the scale path.
  Each vector lands in one bucket per table; queries probe their bucket(s)
  only, turning the N×Q score matrix into |bucket| × Q. Recall is asserted
  against brute force in tests.
- ``ivf_topk``: inverted-file (IVF) coarse quantizer — the other standard
  ANN scale path: assign every vector to its nearest centroid cell, probe
  only the query's ``n_probe`` nearest cells.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def _normalized(vec_col: str) -> F.Column:
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(vec_col, lambda x: x / F.greatest(norm, F.lit(1e-12)))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``emb`` rows per query row.

    Returns (query_id, vec_id, cosine, rank), rank 1..k, deterministic
    tie-break (cosine desc, vec_id asc). Self-matches are not excluded —
    callers filter if needed."""
    corpus = emb.select(F.col(id_col).alias("vec_id"), _normalized(vec_col).alias("cv"))
    qs = queries.select(
        F.col(query_id_col).alias("query_id"), _normalized(vec_col).alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = corpus.crossJoin(F.broadcast(qs)).withColumn("cosine", F.round(dot, 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def rademacher_planes(
    dim: int, n_bits: int, n_tables: int, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic ±1 (Rademacher) hyperplanes, [table][bit][dim].

    Rademacher projections are a standard SRP variant (same angular-LSH
    collision guarantee as gaussian planes, Achlioptas-style sparse/signed
    projections) with one decisive property here: every arithmetic step —
    sign-flip, left-to-right double summation, `> 0` — is exactly
    reproducible in ANSI SQL, so the LSH stage gets a value-level DuckDB
    oracle instead of a rows-only check."""
    rng = np.random.RandomState(seed)
    return [
        [rng.choice([-1.0, 1.0], size=dim).tolist() for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def srp_bucket_col(vec_col: str | Column, table_planes: list[list[float]]) -> Column:
    """Bucket id for one table as a pure JVM expression: bit b set iff
    fold(v[i] * s[b][i]) > 0 (left-to-right double sum — bit-identical to
    DuckDB's list_reduce over the same literals)."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(table_planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.lit([float(s) for s in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


# above this many centroids the literal-projection assignment (one
# F.lit per centroid component) produces Catalyst plans whose analysis/
# codegen cost grows with n_centroids x dim; the broadcast-join argmax
# keeps the plan O(1)-sized at sqrt(N)-scale centroid counts
_IVF_LITERAL_MAX_CENTROIDS = 128


def train_centroids(
    emb: DataFrame,
    n_centroids: int = 32,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means (Lloyd) coarse-quantizer training for
    ``ivf_topk(..., centroids=...)`` — the trained drop-in the IVF
    docstring promises. Init = the ``n_centroids`` lowest-id vectors
    (deterministic, same as untrained IVF); each iteration assigns every
    vector to its max-cosine centroid and re-centers each cell on the
    re-normalized mean. Empty cells keep their previous centroid.

    Scale per iteration: one broadcast-argmax assignment (map-only over
    the corpus — same shape as ivf_topk's fallback path) and one
    (cid, pos)-keyed aggregation whose map-side combine reduces the
    shuffle to k x dim partial sums. The returned k x dim table is
    driver-sized by construction.

    Note: cell means are floating-point sums whose order depends on the
    physical partitioning, so by default re-training on a differently-
    partitioned corpus may flip last-bit values (standard for
    distributed k-means). ``grid=N`` removes that: every centroid
    coordinate (init + each re-center) is rounded to the 1e-N grid —
    the PageRank/bigram-LM quantization trick — making the whole
    training run engine-replayable; the ``emb_kmeans`` driver row
    certifies a grid-9 run value-level against an unrolled-SQL
    oracle. (The older sampled-centroid IVF certification stands for
    grid=None.)"""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _normalized(vec_col).alias("cv")
    ).cache()
    init = (
        corpus.orderBy("vec_id")
        .limit(n_centroids)
        .select("cv")
        .collect()
    )
    def _q(v):
        return [round(x, grid) for x in v] if grid is not None else list(v)

    cents: list[tuple[int, list[float]]] = [
        (i, _q(r["cv"])) for i, r in enumerate(init)
    ]
    if not cents:
        corpus.unpersist()
        return []
    try:
        for _ in range(n_iter):
            # same semantics as the serving path (round-6 csim, ties to
            # lowest cid) — _assign_cells picks the literal map-only
            # projection for <= 128 centroids, so a training iteration
            # costs no corpus shuffle beyond the (cid, pos) re-center
            assign = _assign_cells(corpus, cents).select("cid", "cv")
            sums = (
                assign.select("cid", F.posexplode("cv").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.sum("x").alias("s"))
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "s"))),
                        lambda st: st.s,
                    ).alias("vec")
                )
                .collect()
            )
            new = {}
            for r in sums:
                v = list(r["vec"])
                n = math.sqrt(sum(x * x for x in v)) or 1.0
                new[int(r["cid"])] = _q(x / n for x in v)
            cents = [(cid, new.get(cid, v)) for cid, v in cents]
    finally:
        # an exception mid-iteration (collect/createDataFrame failure) must
        # not leak the cached normalized corpus (round-5 advice)
        corpus.unpersist()
    return cents


def _assign_cells(
    corpus: DataFrame, cent_pairs: list[tuple[int, list[float]]]
) -> DataFrame:
    """Max-cosine centroid cell per (already-normalized) corpus vector:
    (vec_id, cv, cid, cent_sim). Shared by ``ivf_topk`` and
    ``assign_centroids`` / SemDeDup.

    Two physical forms with identical output: up to
    ``_IVF_LITERAL_MAX_CENTROIDS`` the centroids are embedded as literal
    expressions in a pure map-side projection (zero corpus shuffle);
    above that assignment falls back to a broadcast crossJoin + per-vec
    struct-max aggregation (one uniform vec_id shuffle, plan size O(1)
    in centroid count). Ties break to the LOWEST cid via max-by
    (csim, -cid) — the ordering the SQL oracles replay by row_number."""
    cent_rows = [{"cid": c, "centv": v} for c, v in cent_pairs]
    if len(cent_rows) <= _IVF_LITERAL_MAX_CENTROIDS:
        def _cdot(centv: list[float]) -> Column:
            return F.aggregate(
                F.zip_with(
                    "cv",
                    F.lit([float(x) for x in centv]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        best = F.array_max(
            F.array(
                *[
                    F.struct(
                        F.round(_cdot(list(r["centv"])), 6).alias("csim"),
                        F.lit(-int(r["cid"])).cast("long").alias("ncid"),
                    )
                    for r in cent_rows
                ]
            )
        )
        return (
            corpus.withColumn("best", best)
            .select(
                "vec_id",
                "cv",
                (-F.col("best.ncid")).alias("cid"),
                F.col("best.csim").alias("cent_sim"),
            )
        )
    cents = corpus.sparkSession.createDataFrame(
        cent_pairs, "cid long, centv array<double>"
    )
    # cv is constant per vec_id group so first() carries it through
    # without a re-join
    adot = F.aggregate(
        F.zip_with("cv", "centv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(adot, 6))
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("csim").alias("csim"),
                    (-F.col("cid")).cast("long").alias("ncid"),
                )
            ).alias("best"),
            F.first("cv").alias("cv"),
        )
        .select(
            "vec_id",
            "cv",
            (-F.col("best.ncid")).alias("cid"),
            F.col("best.csim").alias("cent_sim"),
        )
    )


def assign_centroids(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (max round-6 cosine, ties to lowest cid) cell
    assignment over an embedding column: returns
    (vec_id, cv, cid, cent_sim) with ``cv`` the L2-normalized vector.
    The coarse-quantization step shared by IVF serving and SemDeDup;
    see ``_assign_cells`` for the two physical forms."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _normalized(vec_col).alias("cv")
    )
    return _assign_cells(corpus, [(int(c), list(v)) for c, v in centroids])


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: nearest-centroid cells only.

    By default centroids are the ``n_centroids`` lowest-id vectors —
    deterministic sampled-vector centroids (the standard k-means++-free
    initialization, no Lloyd iterations), chosen so the WHOLE structure
    replays exactly in ANSI SQL for the value-level DuckDB oracle. Pass
    ``centroids`` (e.g. from ``train_centroids`` — spherical-k-means
    Lloyd) to use a trained coarse quantizer instead; everything
    downstream (assignment, probing, scoring) is identical. The centroid
    "training" step collects the tiny (n_centroids x dim) table to the
    driver — the standard IVF coarse-quantizer shape — and every corpus
    vector is assigned to its max-cosine centroid by a PURE PROJECTION
    (``array_max`` over per-centroid (csim, -cid) structs built from
    centroid literals): truly map-side, zero shuffle on the corpus (a
    previous revision ranked a row_number window partitioned by vec_id,
    which re-shuffled the whole corpus). A query probes its ``n_probe``
    nearest cells and brute-forces only those.

    Scale: the candidate join shuffles on cid (n_centroids uniform-ish
    cells; at 100 TB pick n_centroids ~ sqrt(N) and the probed fraction
    is n_probe/n_centroids of the corpus). Returns (query_id, vec_id,
    cosine, rank) like ``cosine_topk``.

    Assignment has two physical forms with identical output: up to
    ``_IVF_LITERAL_MAX_CENTROIDS`` the centroids are embedded as literal
    expressions in a pure map-side projection (zero corpus shuffle);
    above that — the sqrt(N) counts of a big corpus, where
    n_centroids x dim literals would blow up the Catalyst plan/codegen —
    assignment falls back to a broadcast crossJoin + per-vec max
    aggregation (one uniform vec_id shuffle, plan size O(1) in
    n_centroids)."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _normalized(vec_col).alias("cv")
    )
    if centroids is not None:
        cent_pairs = [(int(c), list(v)) for c, v in centroids]
    else:
        cent_pairs = [
            (int(r["vec_id"]), list(r["cv"]))
            for r in corpus.orderBy("vec_id").limit(n_centroids).collect()
        ]
    if not cent_pairs:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
    cents = emb.sparkSession.createDataFrame(
        cent_pairs, "cid long, centv array<double>"
    )
    assign = _assign_cells(corpus, cent_pairs).select("vec_id", "cv", "cid")
    qs = queries.select(
        F.col(query_id_col).alias("query_id"), _normalized(vec_col).alias("qv")
    )
    qdot = F.aggregate(
        F.zip_with("qv", "centv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("cid")
    )
    probes = (
        qs.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(qdot, 6))
        .withColumn("prnk", F.row_number().over(w_probe))
        .where(F.col("prnk") <= n_probe)
        .select("query_id", "cid")
    )
    cands = assign.join(F.broadcast(probes), "cid").select(
        "query_id", "vec_id", "cv"
    )
    dot = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = cands.join(F.broadcast(qs), "query_id").withColumn(
        "cosine", F.round(dot, 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def srp_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's SRP bucket
    in at least one of ``n_tables`` independent hash tables (standard
    multi-table OR-amplification — recall rises with tables, cost stays
    |bucket|-bounded).

    The per-table bucket join replaces the cross join — at scale each
    shuffle keys on (table, bucket), 2^n_bits uniform buckets."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = rademacher_planes(dim, n_bits, n_tables, seed)
    bucket_arr = lambda col: F.posexplode(  # noqa: E731
        F.array(*[srp_bucket_col(col, planes[t]) for t in range(n_tables)])
    )
    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        _normalized(vec_col).alias("cv"),
        bucket_arr(vec_col).alias("tbl", "bkt"),
    )
    qs = queries.select(
        F.col(query_id_col).alias("query_id"),
        _normalized(vec_col).alias("qv"),
        bucket_arr(vec_col).alias("tbl", "bkt"),
    )
    cands = (
        corpus.join(F.broadcast(qs.select("query_id", "tbl", "bkt")), ["tbl", "bkt"])
        .select("query_id", "vec_id", "cv")
        .distinct()
    )
    dot = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = cands.join(
        F.broadcast(qs.select("query_id", "qv").distinct()), "query_id"
    ).withColumn("cosine", F.round(dot, 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
