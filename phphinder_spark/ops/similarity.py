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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


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


def srp_bucket_udf(dim: int, n_bits: int = 12, seed: int = 42):
    """Sign-random-projection bucket id (deterministic seeded planes)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_bits, dim)).astype("float64")

    @F.pandas_udf("long")
    def bucket(s: pd.Series) -> pd.Series:
        def b(vec):
            v = np.asarray(vec, dtype="float64")
            bits = (planes @ v) > 0
            out = 0
            for i, bit in enumerate(bits):
                if bit:
                    out |= 1 << i
            return out

        return s.map(b)

    return bucket


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
    buckets = [srp_bucket_udf(dim, n_bits, seed + 101 * t) for t in range(n_tables)]
    bucket_arr = lambda col: F.posexplode(  # noqa: E731
        F.array(*[b(F.col(col)) for b in buckets])
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
