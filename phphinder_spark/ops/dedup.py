"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (the whole point of these designs):
- exact: hash-groupBy — one shuffle on a 256-bit digest, no skew (content
  hashes are uniform).
- Jaccard/cosine pairs: never a full cross join — candidates are generated
  inside blocking buckets (LSH bands, simhash chunks, or a caller-supplied
  blocking column), so the quadratic blow-up is bounded per bucket.
- MinHash/LSH: shingle -> 64 permutations -> band buckets -> self-join per
  band -> exact-Jaccard verify. The band self-join shuffles on (band,
  bucket) — uniform by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_TOKEN_SPLIT = r"\W+"


def _tokens(col: str) -> F.Column:
    return F.filter(F.split(F.lower(F.col(col)), _TOKEN_SPLIT), lambda x: x != "")


def exact_duplicates(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, keep_id, is_dup): groups rows by sha2(content); the lowest
    id in each group is the keeper. One hash-partitioned shuffle."""
    h = F.sha2(F.col(col), 256)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("keep_id", F.min(id_col).over(Window.partitionBy("h")))
        .withColumn("is_dup", F.col(id_col) != F.col("keep_id"))
        .select(id_col, "keep_id", "is_dup")
    )


def jaccard_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard >= threshold pairs (a_id < b_id).

    Default blocking is a *lossless* geometric size band: J(a,b) >= t
    implies |b|/|a| <= 1/t, i.e. |ln|a| - ln|b|| <= ln(1/t), so with
    g = floor(ln(size)/ln(1/t)) any qualifying pair satisfies
    |g_a - g_b| <= 1. Side A emits its own band; side B emits g±2 (the
    extra ±1 is a float-rounding safety margin) — every true pair meets in
    at least one band, so the result equals the unblocked brute force
    (the DuckDB oracle IS the unblocked brute force at small sf).

    Scale note: the band join bounds duplication at a constant 5x, but a
    corpus where most docs share a size band still goes quadratic within
    the band — at 100 TB route candidates through ``minhash_lsh_pairs``
    and exact-verify (same output contract), or pass a semantic
    ``block_col`` (cluster/shard id)."""
    toks = F.array_distinct(_tokens(col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    union = F.size(F.array_union("a_toks", "b_toks"))
    if block_col is not None:
        base = base.withColumn("blk", df[block_col])
        a = base.select(F.col("id").alias("a_id"), F.col("toks").alias("a_toks"), "blk")
        b = base.select(F.col("id").alias("b_id"), F.col("toks").alias("b_toks"), "blk")
        cand = a.join(b, "blk")
    elif threshold >= 1.0:
        # J = 1 forces equal sizes: band on the exact distinct-token count
        base = base.withColumn("blk", F.size("toks"))
        a = base.select(F.col("id").alias("a_id"), F.col("toks").alias("a_toks"), "blk")
        b = base.select(F.col("id").alias("b_id"), F.col("toks").alias("b_toks"), "blk")
        cand = a.join(b, "blk")
    else:
        log_ratio = float(-__import__("math").log(threshold))
        g = F.floor(F.log(F.greatest(F.size("toks"), F.lit(1)).cast("double")) / F.lit(log_ratio))
        a = base.select(
            F.col("id").alias("a_id"), F.col("toks").alias("a_toks"), g.alias("blk")
        )
        b = base.select(
            F.col("id").alias("b_id"),
            F.col("toks").alias("b_toks"),
            F.explode(F.array(*[g + F.lit(d) for d in (-2, -1, 0, 1, 2)])).alias("blk"),
        )
        cand = a.join(b, "blk")
    return (
        cand.where(F.col("a_id") < F.col("b_id"))
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
        .distinct()
    )


def _minhash_udf(num_perm: int, shingle_k: int, seed: int):
    """Vectorized MinHash signatures: k-word shingles -> crc32 -> affine
    permutations over a Mersenne prime."""
    rng = np.random.RandomState(seed)
    prime = (1 << 61) - 1
    a = rng.randint(1, prime, size=num_perm, dtype=np.int64)
    b = rng.randint(0, prime, size=num_perm, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sig_udf(s: pd.Series) -> pd.Series:
        import re
        import zlib

        def signature(text):
            if text is None:
                return [0] * num_perm
            toks = [t for t in re.split(r"\W+", text.lower()) if t]
            if len(toks) < shingle_k:
                shingles = [" ".join(toks)] if toks else [""]
            else:
                shingles = [
                    " ".join(toks[i : i + shingle_k])
                    for i in range(len(toks) - shingle_k + 1)
                ]
            hv = np.array(
                [zlib.crc32(sh.encode()) for sh in set(shingles)], dtype=np.int64
            )
            # (a*x + b) mod p, min over shingles, per permutation
            mins = ((hv[None, :] * a[:, None] + b[:, None]) % prime).min(axis=1)
            return [int(x) for x in mins]

        return s.map(signature)

    return sig_udf


def minhash_signatures(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    udf = _minhash_udf(num_perm, shingle_k, seed)
    return df.select(F.col(id_col).alias("id"), udf(F.col(col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs from LSH banding, verified with exact token-shingle
    Jaccard estimate (signature agreement rate) >= threshold."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, col, id_col, num_perm, shingle_k, seed).cache()
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band))
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("id").alias("a_id"), "band", "bucket")
    b = banded.select(F.col("id").alias("b_id"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("a_id"), F.col("sig").alias("a_sig"))
    sb = sigs.select(F.col("id").alias("b_id"), F.col("sig").alias("b_sig"))
    agree = F.size(
        F.filter(F.zip_with("a_sig", "b_sig", lambda x, y: x == y), lambda v: v)
    )
    return (
        cands.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("est_jaccard", F.round(agree / F.lit(float(num_perm)), 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("a_id", "b_id", "est_jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """64-bit SimHash near-dup pairs with hamming <= max_hamming.

    Candidates via the pigeonhole trick: split the 64-bit hash into
    (max_hamming+1) chunks — any pair within the radius shares at least one
    exact chunk, so the self-join runs per (chunk_idx, chunk_value) bucket.
    Verify with bit_count(xor)."""
    n_chunks = max_hamming + 1

    @F.pandas_udf("long")
    def simhash_udf(s: pd.Series) -> pd.Series:
        import re
        import zlib

        def sh(text):
            if text is None:
                return 0
            acc = np.zeros(64, dtype=np.int64)
            for tok in re.split(r"\W+", (text or "").lower()):
                if not tok:
                    continue
                h = np.uint64(
                    (zlib.crc32(tok.encode()) << 32) | zlib.crc32(tok[::-1].encode())
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            v = 0
            for i in range(64):
                if acc[i] > 0:
                    v |= 1 << i
            return v - (1 << 64) if v >= 1 << 63 else v

        return s.map(sh)

    hashed = df.select(F.col(id_col).alias("id"), simhash_udf(F.col(col)).alias("sh")).cache()
    chunk_bits = 64 // n_chunks
    chunks = hashed.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), i * chunk_bits).bitwiseAND(
                        F.lit((1 << chunk_bits) - 1)
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("ci", "cv"),
    )
    a = chunks.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"), "ci", "cv")
    b = chunks.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"), "ci", "cv")
    return (
        a.join(b, ["ci", "cv"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Cosine >= threshold near-dup pairs, blocked by ``block_col`` (e.g. a
    cluster/label id) to bound the pair space."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x / norm).alias("v"),
        (F.col(block_col) if block_col else F.lit(0)).alias("blk"),
    )
    a = base.select(F.col("id").alias("a_id"), F.col("v").alias("a_v"), "blk")
    b = base.select(F.col("id").alias("b_id"), F.col("v").alias("b_v"), "blk")
    dot = F.aggregate(F.zip_with("a_v", "b_v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, "blk")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", F.round(dot, 6))
        .where(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )
