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

import math
import time as _time

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
    shingle_k: int | None = None,
) -> DataFrame:
    """EXACT set-Jaccard >= threshold pairs (a_id < b_id) over the
    distinct token set — or, with ``shingle_k``, over the distinct
    k-word shingle (n-gram) set, the order-sensitive variant that
    near-dup pipelines usually want (two docs with the same vocabulary
    in different order stop matching).

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
    toks = (
        shingles_col(col, shingle_k)
        if shingle_k is not None
        else F.array_distinct(_tokens(col))
    )
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
        log_ratio = float(-math.log(threshold))
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


def minhash_coeffs(num_perm: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation coefficients over the Mersenne
    prime 2^31-1 — shared by the Spark plan AND the generated DuckDB
    oracle SQL, so signatures are value-identical across engines."""
    from phphinder_spark.functions.hashing import MERSENNE31

    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=num_perm).tolist()
    b = rng.randint(0, MERSENNE31, size=num_perm).tolist()
    return list(zip(a, b))


def shingles_col(col: str, k: int) -> F.Column:
    """Distinct k-word shingles of the lowercased \\W+ tokens. Fewer than
    k tokens -> one shingle of all tokens (empty text -> [""]). Mirrors
    DuckDB: list_distinct(list_transform(range(1, greatest(len(t)-k+1,1)+1),
    i -> array_to_string(list_slice(t, i, i+k-1), ' ')))."""
    toks = _tokens(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def minhash_signatures(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sh, sig): shingle set + MinHash signature via an
    Arrow-batched pandas UDF (the input_hint path). Values are
    bit-identical to DuckDB: token hash = little-endian(last 8 md5
    bytes) % (2^31-1), affine permutations over the Mersenne prime.

    A previous revision computed this as pure Column expressions;
    Spark's higher-order functions are interpreted (not codegen'd), and
    num_perm x n_shingles element-wise lambdas ran ~5x slower than the
    numpy matrix below — the oracle values are unchanged either way."""
    import hashlib
    import re

    from phphinder_spark.functions.hashing import MERSENNE31

    coeffs = minhash_coeffs(num_perm, seed)
    a = np.array([c[0] for c in coeffs], dtype=np.int64)
    b = np.array([c[1] for c in coeffs], dtype=np.int64)

    # asNondeterministic: extracting both struct fields (s.sh, s.sig)
    # lets CollapseProject inline the UDF expression twice — TWO
    # ArrowEvalPython nodes, every signature computed twice (verified in
    # the physical plan; optimization guide §4.4). The marker pins one
    # evaluation; outputs are pure functions of the text either way.
    @F.pandas_udf("struct<sh: array<string>, sig: array<long>>")
    def _sig_udf_det(s: pd.Series) -> pd.DataFrame:
        split = re.compile(r"\W+").split

        def one(text):
            toks = [t for t in split((text or "").lower()) if t]
            if len(toks) < shingle_k:
                sh = [" ".join(toks)]
            else:
                seen = set()
                sh = []
                for i in range(len(toks) - shingle_k + 1):
                    g = " ".join(toks[i : i + shingle_k])
                    if g not in seen:
                        seen.add(g)
                        sh.append(g)
            hv = np.array(
                [
                    int.from_bytes(hashlib.md5(g.encode()).digest()[8:], "little")
                    % MERSENNE31
                    for g in sh
                ],
                dtype=np.int64,
            )
            mins = ((a[:, None] * hv[None, :] + b[:, None]) % MERSENNE31).min(axis=1)
            return {"sh": sh, "sig": [int(x) for x in mins]}

        return pd.DataFrame([one(t) for t in s])

    sig_udf = _sig_udf_det.asNondeterministic()

    from phphinder_spark.functions.parallel import ensure_min_partitions

    # widen single-split inputs so the signature UDF runs on every core,
    # and project to the two needed columns BEFORE the opaque UDF so the
    # scan prunes (guide §2.5 / §4.1); no-op on multi-split corpora
    base = ensure_min_partitions(df.select(F.col(id_col).alias("id"), F.col(col)))
    return base.select("id", sig_udf(F.col(col)).alias("s")).select(
        "id", F.col("s.sh").alias("sh"), F.col("s.sig").alias("sig")
    )


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
    """LSH-banded candidate pairs verified with EXACT shingle-set Jaccard
    >= threshold. Semantics = "near-dup pairs whose signatures collide in
    >= 1 of `bands` bands, exact-verified" — the banding is part of the
    operator contract (recall curve set by bands/num_perm), and the DuckDB
    oracle replays the identical signatures/bands, so value-level checks
    certify the whole pipeline. The band self-join shuffles on (band, key):
    uniform by construction; the quadratic blow-up is bounded per bucket."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, col, id_col, num_perm, shingle_k, seed).cache()
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", i * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    a = banded.select(F.col("id").alias("a_id"), "band", "key")
    b = banded.select(F.col("id").alias("b_id"), "band", "key")
    cands = (
        a.join(b, ["band", "key"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"))
    sb = sigs.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    return (
        cands.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def dedup_against(
    df: DataFrame,
    reference: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    ref_id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """CROSS-corpus dedup — the incremental-crawl hygiene pass: flag
    every NEW doc (``df``) that duplicates some doc of an EXISTING
    ``reference`` corpus (the current training set), so fresh data can
    be admitted without re-deduplicating the whole archive.

    A doc is flagged when its text hashes equal to a reference doc's
    (``is_exact_dup``) or when an LSH-banded candidate verifies at exact
    shingle-Jaccard >= ``threshold`` (same signatures/banding contract
    as :func:`minhash_lsh_pairs`, same recall curve). Returns ONE row
    per ``df`` doc: (doc_id, is_exact_dup, best_ref_id, best_jaccard,
    is_dup) — ``best_ref_id`` is the highest-Jaccard reference match
    (ties to the lowest reference id); docs with no near match carry
    the sentinels ``best_ref_id = -1`` / ``best_jaccard = 0.0`` rather
    than NULLs (a nullable int column canonicalizes to float64 through
    Arrow/pandas, which breaks cross-engine value comparison).

    Scale: both sides compute signatures map-side; the band join runs
    NEW x REFERENCE only (never within either corpus — a fresh crawl
    against a 100-TB archive compares |new| x collision rate, not
    archive²); the exact leg joins on sha256 of the text (uniform key);
    the best-match rollup is a doc-keyed combining max. Reference
    signatures are a pure function of (text, seed), so a real pipeline
    persists them once and reuses them per increment — pass the same
    seed and the banding replays."""
    ref_ids = reference.select(F.col(ref_id_col).alias("rid"), F.col(col))
    exact = (
        df.select(F.col(id_col).alias("id"), F.sha2(F.col(col), 256).alias("h"))
        .join(
            ref_ids.select(F.sha2(F.col(col), 256).alias("h")).distinct(),
            "h",
        )
        .select("id")
        .distinct()
        .withColumn("is_exact_dup", F.lit(True))
    )
    rows_per_band = num_perm // bands

    def _banded(sigs: DataFrame, out_id: str) -> DataFrame:
        return sigs.select(
            F.col("id").alias(out_id),
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", i * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("band", "key"),
        )

    # lazy localCheckpoint, NOT .cache(): the signature frames are
    # consumed by multiple legs of THIS plan, but an unpersisted cache
    # would pin both corpora's signatures in executor storage for the
    # application lifetime (ingest_increment calls this once per crawl
    # increment); checkpoint blocks are released by the context cleaner
    # once the returned plan is garbage-collected.
    # Fault-tolerance caveat (same as graph.pagerank's checkpoints):
    # localCheckpoint truncates lineage, so losing an executor that
    # holds checkpoint blocks (or releasing it under dynamic
    # allocation) fails the job instead of recomputing — on clusters
    # where that risk matters, re-run the increment (signatures are a
    # pure function of (text, seed)) or persist signatures to storage
    # first, which is what a real incremental pipeline does anyway
    new_sigs = minhash_signatures(
        df, col, id_col, num_perm, shingle_k, seed
    ).localCheckpoint(eager=False)
    ref_sigs = minhash_signatures(
        reference, col, ref_id_col, num_perm, shingle_k, seed
    ).localCheckpoint(eager=False)
    cands = (
        _banded(new_sigs, "a_id")
        .join(_banded(ref_sigs, "b_id"), ["band", "key"])
        .select("a_id", "b_id")
        .distinct()
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    near = (
        cands.join(
            new_sigs.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh")),
            "a_id",
        )
        .join(
            ref_sigs.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh")),
            "b_id",
        )
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .where(F.col("jaccard") >= threshold)
        .groupBy(F.col("a_id").alias("id"))
        .agg(F.max(F.struct(F.col("jaccard"), (-F.col("b_id")).alias("nb"))).alias("w"))
        .select(
            "id",
            (-F.col("w.nb")).alias("best_ref_id"),
            F.col("w.jaccard").alias("best_jaccard"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(exact.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .join(near.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("is_exact_dup", F.lit(False)).alias("is_exact_dup"),
            F.coalesce("best_ref_id", F.lit(-1).cast("long")).alias(
                "best_ref_id"
            ),
            F.coalesce("best_jaccard", F.lit(0.0)).alias("best_jaccard"),
            (
                F.coalesce("is_exact_dup", F.lit(False))
                | F.col("best_jaccard").isNotNull()
            ).alias("is_dup"),
        )
    )


def simhash_chunk_widths(max_hamming: int, n_chunks: int | None = None) -> list[int]:
    """Bit widths of the pigeonhole chunks (default max_hamming + 2 for
    the two-chunk scheme), distributing 64 bits as evenly as possible
    (wider chunks first). Shared with the generated DuckDB oracle so both
    engines bucket identically."""
    n_chunks = n_chunks or (max_hamming + 2)
    return [
        64 // n_chunks + (1 if i < 64 % n_chunks else 0) for i in range(n_chunks)
    ]


# scheme='auto' crossover: below this many docs the single-chunk keying's
# smaller bucket space cannot go quadratic (N/512 docs per bucket is tiny)
# and the two-chunk scheme's C(h+2,2)-row explode is pure overhead
# (measured: 1.9 s -> 2.9 s at sf0.1's 5k docs)
_SIMHASH_PAIRS_MIN_DOCS = 200_000


def simhash_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
    scheme: str = "auto",
    n_docs: int | None = None,
) -> DataFrame:
    """64-bit SimHash near-dup pairs with hamming <= max_hamming.

    The per-token 64-bit hash is md5_number_lower (DuckDB-identical, see
    functions/hashing.py). The ±1 bit accumulation runs in an Arrow-batched
    numpy pandas UDF (the input_hint path) producing the identical
    md5_number_lower-derived values DuckDB computes, so the whole pipeline
    carries a value-level SQL oracle. (A previous pure-Column revision used
    interpreted higher-order functions — 64 array lambdas per token — and
    ran ~16x slower; Spark HOFs are not codegen'd.)

    Candidates via the two-chunk pigeonhole: split the 64 fingerprint bits
    into (max_hamming + 2) chunks and key the self-join on every PAIR of
    chunks — C(n_chunks, 2) combo tables. A pair within the radius differs
    in at most max_hamming chunks, leaving >= 2 chunks intact, so it
    collides in >= 1 combo bucket (lossless). Verify with bit_count(xor)
    on the packed 64-bit value.

    Scale (``scheme``): the ``'single'``-chunk keying has only
    2^(64/(h+1)) buckets per chunk index — 512 at max_hamming=6, so at
    10^9+ docs every bucket holds ~N/512 docs and the self-join goes
    quadratic. ``'pairs'`` keys on every chunk PAIR, squaring the bucket
    space (65,536 per combo at max_hamming=6) for a constant-factor row
    blow-up: C(h+2,2) exploded rows per doc instead of h+1 (28 vs 7 at
    h=6). ``'auto'`` (default) picks 'pairs' above 200k docs — below that
    the explode overhead outweighs buckets that can't go quadratic anyway.
    Pass ``n_docs`` (an already-known corpus count) to make that decision
    free; without the hint the count runs on the CACHED fingerprint frame
    (one pass that also materializes the cache the self-join reads next —
    never an extra scan of the upstream plan), keying single chunks of the
    h+2 layout when small (a pair within the radius leaves >= 2 of the
    h+2 chunks intact, so single-chunk collision still catches it). All
    keyings are lossless, so the OUTPUT (and the DuckDB oracle) is
    identical whichever path auto takes."""
    import hashlib
    import re

    if scheme not in ("auto", "single", "pairs"):
        raise ValueError(f"scheme must be 'auto', 'single' or 'pairs', got {scheme!r}")
    keying = scheme
    if scheme == "auto" and n_docs is not None:
        keying = "pairs" if n_docs >= _SIMHASH_PAIRS_MIN_DOCS else "single"
    # chunk layout: explicit/hinted 'single' gets h+1 chunks; 'pairs' AND a
    # deferred auto (which must hash before it can count) get h+2 — both
    # layouts are lossless for every keying below
    n_chunks = max_hamming + (1 if keying == "single" else 2)
    widths = simhash_chunk_widths(max_hamming, n_chunks)
    offsets = [sum(widths[:i]) for i in range(n_chunks)]

    # asNondeterministic — same single-evaluation pin as sig_udf (the
    # (s.sh, s.chunks) extraction otherwise duplicates the UDF)
    @F.pandas_udf("struct<sh: long, chunks: array<long>>")
    def _sim_udf_det(s: pd.Series) -> pd.DataFrame:
        split = re.compile(r"\W+").split

        def one(text):
            toks = [t for t in split((text or "").lower()) if t]
            if toks:
                # (n_tokens x 64) bit matrix, LSB-first — one unpackbits
                hv = np.frombuffer(
                    b"".join(hashlib.md5(t.encode()).digest()[8:] for t in toks),
                    dtype=np.uint8,
                ).reshape(len(toks), 8)
                bits = np.unpackbits(hv, axis=1, bitorder="little").astype(np.int64)
                acc = (2 * bits - 1).sum(axis=0)
            else:
                acc = np.full(64, -1, dtype=np.int64)
            pos = acc > 0
            sh = int(pos[:63] @ (1 << np.arange(63, dtype=np.int64)))
            if pos[63]:
                sh -= 1 << 63
            cvs = [
                int(
                    pos[offsets[i] : offsets[i] + widths[i]]
                    @ (1 << np.arange(widths[i], dtype=np.int64))
                )
                for i in range(n_chunks)
            ]
            return {"sh": sh, "chunks": cvs}

        return pd.DataFrame([one(t) for t in s])

    sim_udf = _sim_udf_det.asNondeterministic()

    from phphinder_spark.functions.parallel import ensure_min_partitions

    # same input-parallelism guard as minhash_signatures (guide §2.5)
    base = ensure_min_partitions(df.select(F.col(id_col).alias("id"), F.col(col)))
    hashed = base.select(
        "id", sim_udf(F.col(col)).alias("s")
    ).select("id", F.col("s.sh").alias("sh"), F.col("s.chunks").alias("chunks")).cache()
    if keying == "auto":
        # count the cached fingerprints, not the upstream plan: this job
        # materializes the very cache the candidate self-join reads next
        keying = "pairs" if hashed.count() >= _SIMHASH_PAIRS_MIN_DOCS else "single"
    if keying == "pairs":
        # combo key: chunk i's value shifted past chunk j's width — a
        # single long, uniform across 2^(w_i + w_j) values
        combos = [
            F.col("chunks")[i] * F.lit(1 << widths[j]) + F.col("chunks")[j]
            for i in range(n_chunks)
            for j in range(i + 1, n_chunks)
        ]
    else:
        combos = [F.col("chunks")[i] for i in range(n_chunks)]
    keyed = hashed.select("id", "sh", F.posexplode(F.array(*combos)).alias("ck", "cv"))
    a = keyed.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"), "ck", "cv")
    b = keyed.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"), "ck", "cv")
    return (
        a.join(b, ["ck", "cv"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 50,
    algorithm: str = "auto",
    switch_after: int = 5,
    metrics: dict | None = None,
) -> DataFrame:
    """(id, cluster_id) for every id appearing in ``pairs``, where
    cluster_id is the MINIMUM id reachable through the undirected pair
    graph — the canonical representative a dedup pipeline keeps.

    Three physical strategies, identical output (equivalence-tested
    against a driver union-find in tests/test_ops.py):

    - ``'label'`` — iterative min-label propagation. Each round joins the
      current labels across the edge list and takes the per-node min;
      ``localCheckpoint`` cuts the lineage every round so iteration K
      plans against a flat scan, not K stacked joins. Rounds needed =
      component DIAMETER: ideal for the shallow star-shaped clusters
      banded LSH emits (1-3 rounds), pathological for chain-shaped
      components (a diameter-D chain needs D rounds).
    - ``'star'`` — alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond", SoCC'14): each
      round rewires every node toward the minimum of its neighborhood,
      halving component height, so rounds grow with log(diameter), not
      diameter (measured: diameter-4096 chains converge in 9 star rounds
      vs 4096 label rounds — scripts/cc_scale.py, BENCH.md §CC).
    - ``'auto'`` (default) — runs label propagation for ``switch_after``
      rounds (the LSH-shallow fast path, no per-round star edge rewrite),
      then falls back to star alternation seeded with the propagated
      labels if a fixpoint wasn't reached. Worst case pays
      ``switch_after`` cheap extra rounds; deep components get the
      logarithmic algorithm.

    Every round shuffles on uniform node ids. Raises after ``max_iter``
    rounds without a fixpoint (never returns a half-converged labeling
    silently). ``metrics`` (optional dict) receives ``label_rounds`` /
    ``star_rounds`` / per-round wall times for scale diagnostics
    (scripts/cc_scale.py)."""
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(
            f"algorithm must be 'auto', 'label' or 'star', got {algorithm!r}"
        )
    # self-loops (a, a) carry no connectivity: strip them before either
    # algorithm (large-star would silently drop a node whose ONLY pairs
    # are self-pairs). Every id with >= 1 non-self pair is guaranteed in
    # both algorithms' outputs (label-prop seeds from groupBy(u) over the
    # symmetrized edges; the star steps preserve the node set of every
    # >= 2-node component), so only self-loop-ONLY ids can be missing —
    # re-attach exactly those at the end. The upstream pairs DAG (the
    # expensive LSH/banding leg) is evaluated exactly ONCE: the
    # symmetrize+distinct checkpoint below keeps self-loops, and both the
    # self-id probe and the edge set read the materialized blocks
    # (round-7 fix — the previous separate pairs.where(a==b).isEmpty()
    # probe re-evaluated the whole pairs plan before the checkpoint did;
    # symmetrization is a single-scan explode, not a union of two
    # selects, which would scan the pairs DAG twice).
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("u"), F.col(b_col).alias("v")),
                    F.struct(F.col(b_col).alias("u"), F.col(a_col).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    self_ids = sym.where(F.col("u") == F.col("v")).select(F.col("u").alias("id"))
    ids = self_ids if not self_ids.isEmpty() else None
    edges = sym.where(F.col("u") != F.col("v"))
    if metrics is None:
        metrics = {}
    metrics.setdefault("label_rounds", 0)
    metrics.setdefault("star_rounds", 0)
    metrics.setdefault("round_secs", [])
    if algorithm == "star":
        return _attach_singletons(ids, _cc_star(edges, max_iter, metrics))
    label_rounds = max_iter if algorithm == "label" else min(switch_after, max_iter)
    labels = edges.groupBy("u").agg(F.min("v").alias("l")).select(
        "u", F.least("u", "l").alias("l")
    ).localCheckpoint(eager=False)
    for _ in range(label_rounds):
        _t0 = _time.time()
        # neighbor labels: for each edge (u, v), v's current label
        nbr = (
            edges.join(labels.select(F.col("u").alias("v"), F.col("l").alias("nl")), "v")
            .groupBy("u")
            .agg(F.min("nl").alias("nl"))
        )
        # carry the changed flag through the checkpoint; the checkpoint is
        # LAZY and the convergence probe is a single-row max aggregate, so
        # materialization and probe share ONE job per round (the eager
        # checkpoint + limit-probe pair cost two, and a limit probe scans
        # converged rounds in incremental waves)
        new_labels = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least("l", F.coalesce("nl", "l")).alias("nl2"),
                (F.least("l", F.coalesce("nl", "l")) != F.col("l")).alias("chg"),
            )
            .withColumnRenamed("nl2", "l")
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.max("chg").alias("any")).collect()[0]["any"]
        labels = new_labels.select("u", "l")
        metrics["label_rounds"] += 1
        metrics["round_secs"].append(round(_time.time() - _t0, 3))
        if not changed:  # None (empty frame) or all-false flags
            return _attach_singletons(
                ids,
                labels.select(F.col("u").alias("id"), F.col("l").alias("cluster_id")),
            )
    if algorithm == "label":
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # auto fallback: components deeper than switch_after rounds — seed the
    # logarithmic star alternation with the already-propagated labels
    # ((u, l) edges connect nodes inside their own component, so the
    # component structure is preserved and star starts from flattened trees)
    seeded = (
        edges.unionByName(labels.where(F.col("u") != F.col("l")).select("u", F.col("l").alias("v")))
        .unionByName(labels.where(F.col("u") != F.col("l")).select(F.col("l").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _attach_singletons(ids, _cc_star(seeded, max_iter - label_rounds, metrics))


def _attach_singletons(self_ids: DataFrame | None, labels: DataFrame) -> DataFrame:
    """Union ids whose ONLY pairs were self-loops (stripped before the
    algorithms run) back in as their own cluster — the documented 'every
    id appearing in pairs' contract, algorithm-independent. ``self_ids``
    is None when the input had no self-pairs (the common case): the
    labels pass through untouched, zero extra work. Otherwise the
    anti-join keys the (tiny, map-side-filtered) self-pair set against
    the labels to drop ids that also had a real edge."""
    if self_ids is None:
        return labels
    singles = (
        self_ids.distinct()
        .join(labels, "id", "left_anti")
        .select("id", F.col("id").alias("cluster_id"))
    )
    return labels.unionByName(singles)


def _symmetrize_flag(directed: DataFrame) -> DataFrame:
    """Symmetric distinct edge set carrying a per-edge ``chg`` flag (did
    this round's rewiring step produce the edge by CHANGING something?).
    The distinct is a groupBy/max — physically the same single shuffle as
    ``.distinct()``, so the flag is free; the fixpoint probe then scans
    the checkpointed result for a flag instead of paying a count +
    exceptAll shuffle pair per round (round-5 'What's wrong' #1)."""
    return (
        directed.select(F.col("x").alias("u"), F.col("y").alias("v"), "chg")
        .unionByName(
            directed.select(F.col("y").alias("u"), F.col("x").alias("v"), "chg")
        )
        .groupBy("u", "v")
        .agg(F.max("chg").alias("chg"))
    )


def _cc_star(
    edges: DataFrame, max_iter: int, metrics: dict | None = None
) -> DataFrame:
    """Faithful Kiveris et al. alternation over a SYMMETRIC distinct edge
    list. Each round REPLACES the edge set twice:

    - large-star(u): for every neighbor v > u emit (v, m) where
      m = min(N(u) ∪ {u}) — tall trees flatten toward small ids;
    - small-star(u) over the directed v < u view: with m = min(N<(u)),
      every member of N<(u) ∪ {u} except m re-attaches to m.

    Both operations preserve connectivity and never attach a node to a
    larger id, and their alternation reaches the fixpoint — a forest of
    stars rooted at each component's minimum — in O(log^2 n) rounds
    (practically ~log(diameter); measured in scripts/cc_scale.py).

    Skew-safe by construction: no step materializes a node's neighbor
    LIST (a collect_set row for a 10M-member component's hub would be an
    executor OOM at 100 TB). Per-node state is only min(neighbor) — a
    map-side-combining aggregate that cannot skew — and the re-attach is
    an edges⋈mins equi-join on u whose hot keys AQE can split (the mins
    side is 1 row/key).

    Fixpoint detection comes from the rewiring steps THEMSELVES: each
    emitted edge carries a ``chg`` flag (large-star: the minimum it
    re-attached to differs from the node the neighbor was attached to;
    small-star: any first-branch re-attach row), folded through the
    distinct by a same-shuffle groupBy/max. Flags all false ⟺ both steps
    reproduced their input ⟺ the edge set is a star forest (each step
    strictly decreases the Kiveris potential whenever it changes the
    graph, so a changed graph can never round-trip back to itself). The
    probe is ONE single-row max aggregate over both already-checkpointed
    frames per round — replacing the previous two count jobs per round
    plus an exceptAll double-shuffle at every counts-equal round."""
    if metrics is None:
        metrics = {"star_rounds": 0, "round_secs": []}
    metrics.setdefault("star_rounds", 0)
    metrics.setdefault("round_secs", [])
    for _ in range(max_iter):
        _t0 = _time.time()
        # large-star: m(u) = min(N(u) ∪ {u}); every v > u re-attaches to m
        # (a no-op — chg false — exactly when m == u, i.e. the edge (u, v)
        # maps to itself)
        mins = edges.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("u", "mn").alias("m")
        )
        big = (
            edges.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("x"),
                F.col("m").alias("y"),
                (F.col("m") != F.col("u")).alias("chg"),
            )
            .where(F.col("x") != F.col("y"))
        )
        mid = _symmetrize_flag(big).localCheckpoint(eager=True)
        # small-star over the directed v < u view: m = min(N<(u)) (< u by
        # construction); members N<(u) ∪ {u} except m re-attach to m. The
        # first branch rewires (chg true); the second re-emits the
        # existing (u, m) edge (chg false)
        din = mid.where(F.col("v") < F.col("u"))
        mins2 = din.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            din.join(mins2, "u")
            .where(F.col("v") != F.col("m"))
            .select(
                F.col("v").alias("x"), F.col("m").alias("y"), F.lit(True).alias("chg")
            )
            .unionByName(
                mins2.select(
                    F.col("u").alias("x"),
                    F.col("m").alias("y"),
                    F.lit(False).alias("chg"),
                )
            )
        )
        # LAZY: the flag probe below materializes new_edges in the same
        # job (mid stays eager — it feeds two small-star subtrees whose
        # concurrent stages could otherwise compute it twice)
        new_edges = _symmetrize_flag(small).localCheckpoint(eager=False)
        # ONE single-row aggregate job over both checkpointed frames (a
        # limit-1 probe would scan rare-flag rounds in incremental waves)
        flagged = (
            mid.select("chg")
            .unionByName(new_edges.select("chg"))
            .agg(F.max("chg").alias("any"))
            .collect()[0]["any"]
        )
        edges = new_edges.select("u", "v")
        metrics["star_rounds"] += 1
        metrics["round_secs"].append(round(_time.time() - _t0, 3))
        if not flagged:
            return edges.groupBy("u").agg(F.min("v").alias("l")).select(
                F.col("u").alias("id"),
                F.least("u", "l").alias("cluster_id"),
            )
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    algorithm: str = "auto",
) -> DataFrame:
    """Full-corpus cluster assignment from a near-dup pair list:
    (doc_id, cluster_id, is_dup) for EVERY row of ``df`` — docs in no pair
    form singleton clusters; ``is_dup`` marks everything but the minimum
    id of each cluster (the keeper). This is the operator a training-data
    pipeline actually runs after minhash/simhash pair generation: keep
    `where ~is_dup`, and the corpus is deduplicated transitively."""
    comp = connected_components(pairs, a_col, b_col, algorithm=algorithm)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_dup", F.col("doc_id") != F.col("cluster_id"))
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


def embedding_dup_pairs_srp(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs WITHOUT a caller-supplied blocking column:
    candidates share a Rademacher-SRP bucket in >= 1 of ``n_tables``
    tables, then exact cosine >= threshold verifies. The banding is part
    of the contract (recall = 1-(1-(1-θ/π)^n_bits)^n_tables; ~0.97 at
    cosine 0.95 with the defaults) and is exactly replayable in SQL, so
    the operator carries a value-level DuckDB oracle.

    Scale: per-(table, bucket) self-join — 2^n_bits uniform buckets per
    table, never an all-pairs or label-dependent join."""
    from phphinder_spark.ops.similarity import rademacher_planes, srp_bucket_col

    first = emb.select(vec_col).first()
    if first is None or first[0] is None:
        # empty corpus (or null first vector): no pairs, like the other
        # dedup operators — don't crash pipelines over empty partitions
        return emb.sparkSession.createDataFrame(
            [], "a_id long, b_id long, cosine double"
        )
    dim = len(first[0])
    planes = rademacher_planes(dim, n_bits, n_tables, seed)
    buckets = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.array(*[srp_bucket_col(vec_col, planes[t]) for t in range(n_tables)])
        ).alias("tbl", "bkt"),
    )
    a = buckets.select(F.col("id").alias("a_id"), "tbl", "bkt")
    b = buckets.select(F.col("id").alias("b_id"), "tbl", "bkt")
    # dedupe candidate id pairs BEFORE touching vectors: the multi-table
    # union shuffles only (id, tbl, bkt) triples
    cands = (
        a.join(b, ["tbl", "bkt"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x / F.greatest(norm, F.lit(1e-12))).alias("v"),
    )
    dot = F.aggregate(
        F.zip_with("a_v", "b_v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        cands.join(vecs.select(F.col("id").alias("a_id"), F.col("v").alias("a_v")), "a_id")
        .join(vecs.select(F.col("id").alias("b_id"), F.col("v").alias("b_v")), "b_id")
        .withColumn("cosine", F.round(dot, 6))
        .where(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = None,
    srp_bits: int = 8,
    srp_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-then-prune
    semantic deduplication — the embedding-space analogue of the text
    near-dup passes, and the shape real training pipelines use to shrink
    web-scale corpora 2-4x with minimal quality loss.

    1. Assign every vector to its nearest centroid cell
       (``similarity.assign_centroids`` — broadcast/literal coarse
       quantizer, the same step IVF serving uses).
    2. Within each cell, order items by (cent_sim asc, id asc) — the
       paper KEEPS the examples with LOW cosine similarity to their
       centroid (they carry the cluster's diversity) and prunes the ones
       packed near the center.
    3. An item is pruned iff some EARLIER item in that order has cosine
       >= ``threshold`` with it. This is the released implementation's
       upper-triangular-matrix semantics (a pruned item still shadows
       later items), not sequential greedy — deliberately, because it is
       order-deterministic and exactly replayable in ANSI SQL for the
       value-level oracle.

    Returns (vec_id, cid, cent_sim, kept): every input id exactly once,
    ``kept`` false for pruned near-duplicates.

    Scale: the quantizer leg is map-only (centroid literals / broadcast
    argmax — zero corpus shuffle up to 128 centroids, one uniform
    vec_id shuffle above); the pair leg self-joins per cell, so cost is
    sum(|cell|^2) — pick n_centroids ~ N / desired_cell_size exactly as
    the paper does (they use k=50k on LAION). ``max_cell`` bounds the
    pathological-giant-cell failure mode (the embedding analogue of a
    hot LSH bucket): cells whose population exceeds it are SUB-BLOCKED
    with Rademacher SRP — their pair join runs per (cell, table,
    bucket) instead of per cell, so a cell of size M costs
    ~tables x M²/2^bits, not M². Inside an oversized cell the prune
    becomes approximate with the standard SRP recall
    (1-(1-(1-θ/π)^bits)^tables, ~0.97 at cosine 0.95 with the
    defaults); cells within budget keep the exact paper semantics, so
    ``max_cell=None`` (default, the oracle-certified path) is exact
    everywhere. The assignment is lazily localCheckpoint-ed so the pair
    leg and the output leg read ONE evaluation; the cell-size probe is
    a centroid-cardinality aggregate, never corpus-scale.
    """
    from phphinder_spark.ops.similarity import (
        assign_centroids,
        rademacher_planes,
        srp_bucket_col,
    )

    assign = assign_centroids(emb, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )

    def _pruned_ids(part: DataFrame, keys: list[str]) -> DataFrame:
        a = part.select(
            F.col("vec_id").alias("a_id"),
            F.col("cv").alias("a_v"),
            *keys,
            F.col("cent_sim").alias("a_sim"),
        )
        b = part.select(
            F.col("vec_id").alias("b_id"),
            F.col("cv").alias("b_v"),
            *keys,
            F.col("cent_sim").alias("b_sim"),
        )
        earlier = (F.col("a_sim") < F.col("b_sim")) | (
            (F.col("a_sim") == F.col("b_sim")) & (F.col("a_id") < F.col("b_id"))
        )
        dot = F.aggregate(
            F.zip_with("a_v", "b_v", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            a.join(b, keys)
            .where(earlier)
            .withColumn("cosine", F.round(dot, 6))
            .where(F.col("cosine") >= threshold)
            .select(F.col("b_id").alias("vec_id"))
        )

    big_cids: list[int] = []
    if max_cell is not None:
        if max_cell < 2:
            raise ValueError(f"max_cell must be >= 2, got {max_cell}")
        sizes = assign.groupBy("cid").agg(F.count("*").alias("n")).collect()
        big_cids = sorted(int(r["cid"]) for r in sizes if r["n"] > max_cell)
    if not big_cids:
        pruned = _pruned_ids(assign, ["cid"]).distinct()
    else:
        planes = rademacher_planes(
            len(centroids[0][1]), srp_bits, srp_tables, seed
        )
        big = assign.where(F.col("cid").isin(big_cids)).select(
            "vec_id",
            "cv",
            "cid",
            "cent_sim",
            F.posexplode(
                F.array(
                    *[
                        srp_bucket_col(F.col("cv"), planes[t])
                        for t in range(srp_tables)
                    ]
                )
            ).alias("tbl", "bkt"),
        )
        pruned = (
            _pruned_ids(assign.where(~F.col("cid").isin(big_cids)), ["cid"])
            .unionByName(_pruned_ids(big, ["cid", "tbl", "bkt"]))
            .distinct()
        )
    return (
        assign.join(
            pruned.withColumn("pruned", F.lit(True)), "vec_id", "left"
        )
        .select(
            "vec_id",
            "cid",
            "cent_sim",
            F.col("pruned").isNull().alias("kept"),
        )
    )


def cluster_representatives(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score: F.Column | None = None,
) -> DataFrame:
    """Quality-aware canonicalization: pick WHICH document survives each
    dedup cluster. ``dedup_clusters`` answers "who is a duplicate of
    whom"; real pipelines then keep the BEST member, not the lowest id —
    by default the longest document (token count, the usual keep-longest
    rule), deterministic ties to the lowest id. Pass ``score`` (any
    Column over ``docs``, e.g. a gopher quality term) to canonicalize by
    a different criterion.

    ``clusters`` is (id_col, cluster_id) as produced by
    ``dedup_clusters`` (every doc present, singletons included).
    Returns one row per doc: (id_col, cluster_id, score, is_rep) —
    filter ``is_rep`` for the surviving corpus, ``~is_rep`` for the
    drop list.

    Scale: one id-keyed join (both sides uniform on the id), one
    cluster_id-keyed struct-max aggregation (map-side combine reduces
    each cluster to ONE candidate per partition before the shuffle, so
    a 10M-member cluster contributes #partitions rows, not 10M), and
    one cluster_id-keyed join of the tiny winner table back. No windows
    over the corpus."""
    score_col = score if score is not None else F.size(_tokens(text_col))
    scored = (
        clusters.select(F.col(id_col).alias("id"), "cluster_id")
        .join(
            docs.select(
                F.col(id_col).alias("id"),
                score_col.cast("long").alias("score"),
            ),
            "id",
        )
    )
    best = (
        scored.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("score"),
                    (-F.col("id")).cast("long").alias("nid"),
                )
            ).alias("b")
        )
        .select("cluster_id", (-F.col("b.nid")).alias("rep_id"))
    )
    return (
        scored.join(best, "cluster_id")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            "score",
            (F.col("id") == F.col("rep_id")).alias("is_rep"),
        )
    )


def dedup_paragraphs(
    docs: DataFrame,
    split_regex: str = r"\n+",
    id_col: str = "doc_id",
    text_col: str = "text",
    joiner: str = "\n",
    hash_key: bool = False,
) -> DataFrame:
    """CCNet-style paragraph-level deduplication (Wenzek et al. 2020 §3:
    web corpora are deduplicated per PARAGRAPH, not per document — the
    boilerplate that survives doc-level dedup is repeated paragraphs).

    Splits each doc on ``split_regex``, trims the pieces, drops empty
    ones, keeps exactly the FIRST corpus-wide occurrence of each
    distinct paragraph (first = lowest (doc_id, position) — a
    deterministic total order, so results are partitioning-invariant),
    and rebuilds every doc from its surviving paragraphs.

    Returns (id_col, text, n_paragraphs, n_kept): ``text`` is the
    rebuilt doc (empty string when every paragraph was dropped or the
    doc had none), ``n_paragraphs`` the pre-dedup count.

    Scale: one paragraph-keyed groupBy (min over struct(id, pos) —
    map-side combining, so a boilerplate paragraph repeated 100M times
    partial-aggregates to one row per input partition) and one
    paragraph-keyed join back (co-partitioned with the groupBy; a hot
    paragraph is a skewed join key — AQE skew-join splits it, and the
    winner side carries one row per distinct paragraph). The rebuild is
    a doc-keyed collect_list bounded by paragraphs-per-doc. The winner
    is a lexicographic min over struct(id, pos) — no composite integer
    key, so 64-bit hash doc ids cannot overflow it.

    ``hash_key=True`` is the 100-TB form: paragraph STRINGS leave every
    exchange entirely — the winner groupBy and flag join shuffle
    ``xxhash64(para)`` longs with only (id, pos) alongside, the doc
    rollup shuffles winning POSITIONS, and the doc is rebuilt MAP-SIDE
    from its original text (re-split + position filter), so shuffle
    bytes are O(paragraph instances × 20B) instead of carrying every
    paragraph body twice. A 64-bit collision can merge two distinct
    paragraphs (~instances²/2^65 — negligible at real scales); the
    default string key stays collision-free and is the oracle-certified
    path (both forms are equivalence-tested in tests/test_ops.py).
    """
    paras = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), split_regex)).alias(
                "pos", "para"
            ),
        )
        .withColumn("para", F.trim("para"))
        .where(F.col("para") != "")
    )
    if hash_key:
        paras = paras.select("id", "pos", F.xxhash64("para").alias("para"))
    first = paras.groupBy("para").agg(
        F.min(F.struct("id", "pos")).alias("w")
    )
    # carry a keep flag instead of filtering, so ONE doc-keyed aggregate
    # yields both counts and the rebuild (collect_list drops the NULLs
    # the when() leaves on losers) — no second corpus-scale explode for
    # the per-doc paragraph count
    flagged = paras.join(first, "para").withColumn(
        "is_win",
        (F.col("id") == F.col("w.id")) & (F.col("pos") == F.col("w.pos")),
    )
    if hash_key:
        # strings never shuffled: roll up winning POSITIONS per doc, then
        # rebuild map-side from the original text (re-split + trim +
        # position filter replays the same pieces the explode saw)
        stats = flagged.groupBy("id").agg(
            F.count("*").alias("n_paragraphs"),
            F.sum(F.when(F.col("is_win"), 1).otherwise(0)).alias("n_kept"),
            F.sort_array(
                F.collect_list(F.when(F.col("is_win"), F.col("pos")))
            ).alias("win_pos"),
        )
        pieces = F.split(F.col(text_col), split_regex)
        return (
            docs.select(F.col(id_col).alias("id"), F.col(text_col))
            .join(stats, "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.array_join(
                    F.transform(
                        F.coalesce("win_pos", F.array().cast("array<int>")),
                        lambda p: F.trim(F.element_at(pieces, p + 1)),
                    ),
                    joiner,
                ).alias("text"),
                F.coalesce("n_paragraphs", F.lit(0))
                .cast("long")
                .alias("n_paragraphs"),
                F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            )
        )
    rebuilt = flagged.groupBy("id").agg(
        F.count("*").alias("n_paragraphs"),
        F.sum(F.when(F.col("is_win"), 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_win"), F.struct("pos", "para"))
                    )
                ),
                lambda x: x["para"],
            ),
            joiner,
        ).alias("new_text"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("new_text", F.lit("")).alias("text"),
            F.coalesce("n_paragraphs", F.lit(0))
            .cast("long")
            .alias("n_paragraphs"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    split_regex: str = r"\n+",
    id_col: str = "doc_id",
    text_col: str = "text",
    joiner: str = "\n",
    hash_key: bool = False,
) -> DataFrame:
    """Cross-document boilerplate removal: any line appearing in at
    least ``min_docs`` DISTINCT documents is cut from EVERY document —
    the nav-menu / cookie-banner / footer scrub of web-corpus pipelines
    (RefinedWeb-style line-wise correction). Complements
    :func:`dedup_paragraphs`, which keeps the FIRST occurrence; true
    boilerplate should keep none.

    Splits on ``split_regex``, trims, ignores empty pieces, and
    rebuilds each doc from the surviving lines in original order.
    Returns (id_col, text, n_lines, n_kept); docs whose every line was
    boilerplate (or that had none) come back as ``""``.

    Scale: the hot set is a line-keyed count of distinct doc ids —
    two map-side-combining exchanges ((line, id) dedup then line
    count), with the hot side then joined back line-keyed
    (co-partitioned with the count; AQE splits the skewed hot lines).
    The rebuild is a doc-keyed collect_list bounded by lines-per-doc.
    ``hash_key=True`` is the 100-TB form: every exchange carries
    ``xxhash64(line)`` longs instead of line bodies, and docs are
    rebuilt MAP-SIDE from their original text (re-split + position
    filter), exactly like :func:`dedup_paragraphs`'s hash form."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    lines = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), split_regex)).alias(
                "pos", "line"
            ),
        )
        .withColumn("line", F.trim("line"))
        .where(F.col("line") != "")
    )
    if hash_key:
        lines = lines.select("id", "pos", F.xxhash64("line").alias("line"))
    hot = (
        lines.select("line", "id")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("d"))
        .where(F.col("d") >= int(min_docs))
        .select("line", F.lit(True).alias("is_hot"))
    )
    flagged = lines.join(hot, "line", "left").withColumn(
        "is_keep", F.col("is_hot").isNull()
    )
    if hash_key:
        # line bodies never shuffled: roll up KEPT positions per doc,
        # rebuild map-side from the original text
        stats = flagged.groupBy("id").agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("is_keep"), 1).otherwise(0)).alias("n_kept"),
            F.sort_array(
                F.collect_list(F.when(F.col("is_keep"), F.col("pos")))
            ).alias("keep_pos"),
        )
        pieces = F.split(F.col(text_col), split_regex)
        return (
            docs.select(F.col(id_col).alias("id"), F.col(text_col))
            .join(stats, "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.array_join(
                    F.transform(
                        F.coalesce("keep_pos", F.array().cast("array<int>")),
                        lambda p: F.trim(F.element_at(pieces, p + 1)),
                    ),
                    joiner,
                ).alias("text"),
                F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
                F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            )
        )
    rebuilt = flagged.groupBy("id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("is_keep"), 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_keep"), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
            joiner,
        ).alias("new_text"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("new_text", F.lit("")).alias("text"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def split_leakage(
    df: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    col: str = "text",
    train_split: str = "train",
) -> DataFrame:
    """Train/eval contamination audit: flag every NON-train row whose
    text is byte-identical to some TRAIN row's text. Run it after
    split assignment (``ops.sampling.assign_splits``) — splits are
    assigned per doc_id, so a corpus whose DEDUP missed an exact pair
    can land the two copies on opposite sides of the train/test wall,
    which silently inflates eval scores (the canonical "test-set
    leakage" failure of LLM data pipelines; near-dup leakage composes
    the same shape with :func:`dedup_against` instead of the sha join).

    Returns one row per leaked eval doc: ``(id_col, split_col,
    n_train_copies)`` — how many train rows share its exact text.

    NULL contract: rows with NULL text are never flagged and never
    match anything (``sha2(NULL)`` is NULL and NULL join keys don't
    match — two undefined texts are not "identical"), on either side.

    Scale: both sides reduce to ``sha2(text)`` 32-byte keys map-side;
    the train side pre-aggregates to (hash, count) — a combining
    groupBy, so the join's build side is |distinct train texts|, never
    |train rows| — and the join key is a uniform crypto hash (no skew
    by construction). Nothing ever shuffles document text."""
    h = F.sha2(F.col(col), 256).alias("h")
    train_counts = (
        df.where(F.col(split_col) == train_split)
        .select(h)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_train_copies"))
    )
    evals = df.where(F.col(split_col) != train_split).select(
        F.col(id_col), F.col(split_col), h
    )
    return evals.join(train_counts, "h").select(
        id_col, split_col, "n_train_copies"
    )
