"""Compressed posting-list segments: sorted, delta-gap + varint encoded,
chunked, with per-row skip statistics (min/max doc_id) — the Spark
replacement for the reference's sorted fixed-width JSON files with binary
search (reference: src/Index/JsonStorage.php:209-301; SURVEY.md §4 item 1).

Layout: one segment row per (field, term, chunk) where
``chunk = doc_id // chunk_span`` bounds group size for hot terms (a
10^12-doc posting list for "function" becomes many bounded chunks instead
of one giant group — no single-task skew in encode, decode, or merge).
Segment rows are written as Parquet sorted by (field, term, chunk) so
row-group min/max statistics give O(log n)-style data skipping on term
lookups — the distributed analogue of the reference's in-file binary
search.

Payload format (little-endian varints):
    doc block: first_doc_id, then gaps (delta >= 1)
    tf block:  tf per doc
    pos block: per doc: n_positions, then position deltas
Encode/decode run inside applyInPandas/mapInPandas (Arrow batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

SEGMENT_SCHEMA = (
    "field string, term string, chunk long, df long, cf long, "
    "min_doc long, max_doc long, max_tf long, n_bytes long, payload binary"
)

POSTING_SCHEMA = (
    "field string, term string, doc_id long, tf long, positions array<int>"
)

DEFAULT_CHUNK_SPAN = 1 << 20  # 1M doc ids per chunk


def _write_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def encode_posting_group(doc_ids, tfs, positions_list) -> bytes:
    """Encode one (field, term, chunk) group; inputs sorted by doc_id."""
    out = bytearray()
    prev = None
    for d in doc_ids:
        _write_varint(out, d if prev is None else d - prev)
        prev = d
    for t in tfs:
        _write_varint(out, t)
    for pos in positions_list:
        _write_varint(out, len(pos))
        pprev = 0
        for p in pos:
            _write_varint(out, p - pprev)
            pprev = p
    return bytes(out)


def _parse_varints_np(payload: bytes):
    """All varint values of a payload, vectorized: terminator bytes have
    the high bit clear; each value is the 0x7f-masked bytes of its run,
    little-endian base-128. The per-BYTE python loop is the decode
    hot-spot; this replaces it with numpy segment reductions."""
    import numpy as np

    b = np.frombuffer(payload, dtype=np.uint8)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # byte index within its value = position - start of its run
    idx = np.arange(len(b), dtype=np.int64)
    run_id = np.searchsorted(ends, idx)
    shifts = (idx - starts[run_id]) * 7
    contrib = (b & 0x7F).astype(np.int64) << shifts
    return np.add.reduceat(contrib, starts)


def decode_posting_group_np(payload: bytes, df: int, with_positions: bool = True):
    """Vectorized inverse of ``encode_posting_group`` (same output as
    ``decode_posting_group``, asserted in tests). Per-byte parsing and
    the per-doc position cumsums are all segmented numpy ops; python
    touches only one O(df) header walk and list slicing.

    ``with_positions=False`` skips that O(df) python walk entirely and
    returns empty position lists — the scoring paths (BM25) only need
    (doc_id, tf), and positions usually dominate the payload."""
    import numpy as np

    vals = _parse_varints_np(payload)
    doc_ids = np.cumsum(vals[:df]).tolist()
    tfs = vals[df : 2 * df].tolist()
    if not with_positions:
        return doc_ids, tfs, [[] for _ in range(df)]
    tail_np = vals[2 * df :]
    tail = tail_np.tolist()
    # header walk: counts + header byte positions (O(df), no slicing)
    counts = []
    headers = []
    p = 0
    for _ in range(df):
        n = tail[p]
        counts.append(n)
        headers.append(p)
        p += 1 + n
    if p == df:  # all position lists empty
        return doc_ids, tfs, [[] for _ in range(df)]
    mask = np.ones(len(tail), dtype=bool)
    mask[headers] = False
    deltas = tail_np[mask]
    csum = np.cumsum(deltas)
    # segmented cumsum: subtract the running total at each doc's start
    starts = np.cumsum([0] + counts[:-1])
    bases = np.where(starts > 0, csum[starts - 1], 0)
    abs_pos = (csum - np.repeat(bases, counts)).tolist()
    positions = []
    s = 0
    for n in counts:
        positions.append(abs_pos[s : s + n])
        s += n
    return doc_ids, tfs, positions


def decode_posting_group(payload: bytes, df: int):
    doc_ids = []
    pos = 0
    acc = 0
    for i in range(df):
        v, pos = _read_varint(payload, pos)
        acc = v if i == 0 else acc + v
        doc_ids.append(acc)
    tfs = []
    for _ in range(df):
        v, pos = _read_varint(payload, pos)
        tfs.append(v)
    positions = []
    for _ in range(df):
        n, pos = _read_varint(payload, pos)
        cur = []
        acc_p = 0
        for _ in range(n):
            v, pos = _read_varint(payload, pos)
            acc_p += v
            cur.append(acc_p)
        positions.append(cur)
    return doc_ids, tfs, positions


def encode_segments(
    postings: DataFrame, chunk_span: int = DEFAULT_CHUNK_SPAN
) -> DataFrame:
    """postings -> segment rows. Shuffles once on (field, term, chunk);
    group size is bounded by chunk_span regardless of term hotness.

    Implementation note: groupBy().applyInPandas would materialize one
    pandas DataFrame PER GROUP — with a large vocabulary most groups are
    a handful of rows and per-group pandas overhead dominates (measured
    >10x slower at 30k-term vocabularies). Instead: hash-repartition by
    the full group key (a group never splits across partitions), sort
    within partitions, and encode with mapInPandas — one pandas frame
    per Arrow batch, carrying the possibly-incomplete trailing group
    over to the next batch of the same partition."""
    with_chunk = postings.withColumn(
        "chunk", F.floor(F.col("doc_id") / F.lit(chunk_span)).cast("long")
    )
    parts = with_chunk.sparkSession.conf.get("spark.sql.shuffle.partitions")
    arranged = with_chunk.repartition(
        int(parts), "field", "term", "chunk"
    ).sortWithinPartitions("field", "term", "chunk", "doc_id")

    def encode_rows(field, term, chunk, sub: pd.DataFrame) -> dict:
        payload = encode_posting_group(
            sub["doc_id"].tolist(),
            sub["tf"].tolist(),
            [list(p) for p in sub["positions"]],
        )
        return {
            "field": field,
            "term": term,
            "chunk": chunk,
            "df": len(sub),
            "cf": int(sub["tf"].sum()),
            "min_doc": int(sub["doc_id"].min()),
            "max_doc": int(sub["doc_id"].max()),
            # block-max skip statistic: the chunk's tf ceiling bounds
            # any member doc's BM25 contribution
            "max_tf": int(sub["tf"].max()),
            "n_bytes": len(payload),
            "payload": payload,
        }

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            # hold back the trailing group — it may continue in the next
            # batch of this partition
            last = pdf.iloc[-1]
            tail_mask = (
                (pdf["field"] == last["field"])
                & (pdf["term"] == last["term"])
                & (pdf["chunk"] == last["chunk"])
            )
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if head.empty:
                continue
            out = [
                encode_rows(f, t, c, sub)
                for (f, t, c), sub in head.groupby(
                    ["field", "term", "chunk"], sort=False
                )
            ]
            yield pd.DataFrame(out)
        if carry is not None and not carry.empty:
            out = [
                encode_rows(f, t, c, sub)
                for (f, t, c), sub in carry.groupby(
                    ["field", "term", "chunk"], sort=False
                )
            ]
            yield pd.DataFrame(out)

    return arranged.mapInPandas(encode, SEGMENT_SCHEMA)


def decode_segments(segments: DataFrame, with_positions: bool = True) -> DataFrame:
    """segment rows -> postings (inverse of encode_segments).

    ``with_positions=False`` emits empty position arrays (schema-stable)
    and skips the per-doc position parse — use for scoring-only reads."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                doc_ids, tfs, positions = decode_posting_group_np(
                    bytes(row.payload), int(row.df), with_positions
                )
                for d, t, p in zip(doc_ids, tfs, positions):
                    out.append((row.field, row.term, d, t, p))
            yield pd.DataFrame(
                out, columns=["field", "term", "doc_id", "tf", "positions"]
            )

    return segments.mapInPandas(decode, POSTING_SCHEMA)


def write_segments(segments: DataFrame, path: str, n_files: int | None = None) -> None:
    """Persist sorted by (field, term, chunk): Parquet row-group min/max on
    ``term`` gives data skipping for point lookups."""
    out = segments.repartitionByRange(
        *( [n_files] if n_files else [] ), "field", "term"
    ).sortWithinPartitions("field", "term", "chunk")
    out.write.mode("overwrite").parquet(path)


def read_term_postings(spark, path: str, field: str, term: str) -> DataFrame:
    """Point lookup from the segment store: the (field, term) predicate is
    pushed into the Parquet scan (row-group skipping via sorted layout)."""
    seg = spark.read.parquet(path).where(
        (F.col("field") == field) & (F.col("term") == term)
    )
    return decode_segments(seg)


def segment_bm25_topk(
    spark,
    index_dir: str,
    terms: list[str],
    field: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k served straight from the compressed segment store.

    Reads only the matching terms' segment rows (predicate pushdown on the
    sorted store), decodes those payloads, joins the persisted doclens and
    the dictionary's global df — the cold-serving path where the
    uncompressed postings table is not resident."""
    import json
    import os

    from phphinder_spark.scoring import bm25_score_components

    with open(os.path.join(index_dir, "stats.json")) as fh:
        stats = json.load(fh)
    seg = spark.read.parquet(os.path.join(index_dir, "segments")).where(
        (F.col("field") == field) & F.col("term").isin([str(t) for t in terms])
    )
    # scoring needs only (doc_id, tf): skip the per-doc position parse
    postings = decode_segments(seg, with_positions=False)
    dictionary = spark.read.parquet(os.path.join(index_dir, "dictionary")).where(
        (F.col("field") == field) & F.col("term").isin([str(t) for t in terms])
    )
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens")).where(
        F.col("field") == field
    )
    scored = (
        postings.join(F.broadcast(dictionary.select("term", "df")), "term")
        .join(doclens.select("doc_id", "dl"), "doc_id")
        .withColumn(
            "contrib",
            bm25_score_components(
                F.col("tf").cast("double"),
                F.col("df").cast("double"),
                F.col("dl").cast("double"),
                stats["n_docs"],
                stats["avgdl"][field],
                k1,
                b,
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def merge_segment_dictionaries(segments: DataFrame) -> DataFrame:
    """Global dictionary from chunked segments: hierarchical merge is a
    partial-agg sum over chunk stats (never touches payloads)."""
    return segments.groupBy("field", "term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.min("min_doc").alias("min_doc"),
        F.max("max_doc").alias("max_doc"),
        F.sum("n_bytes").alias("n_bytes"),
    )


def merge_segment_stores(
    spark,
    paths: list[str],
    out_path: str,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    n_files: int | None = None,
) -> None:
    """Hierarchical merge of K segment stores into one compacted store
    (north_star: per-partition segments "hierarchically merged into a
    global dictionary").

    Scale design: a (field, term, chunk) group that exists in only ONE
    input store passes through byte-identical — no decode. Only colliding
    groups (same term chunk written by several incremental builds) are
    decoded, concatenated doc-id-sorted, and re-encoded. For typical
    incremental ingestion (new builds cover new doc-id ranges -> new
    chunks) the merge is almost pure file re-layout; the expensive path is
    proportional to actual overlap, not store size."""
    from functools import reduce

    segs = reduce(
        lambda a, b: a.unionByName(b),
        [spark.read.parquet(p) for p in paths],
    )
    w = Window.partitionBy("field", "term", "chunk")
    tagged = segs.withColumn("_n", F.count("*").over(w))
    passthrough = tagged.where(F.col("_n") == 1).drop("_n")
    colliding = tagged.where(F.col("_n") > 1).drop("_n")
    reencoded = encode_segments(decode_segments(colliding), chunk_span)
    write_segments(passthrough.unionByName(reencoded), out_path, n_files)


def segment_bm25_topk_blockmax(
    spark,
    index_dir: str,
    terms: list[str],
    field: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    collect_metrics: bool = False,
) -> "tuple[DataFrame, dict]":
    """WAND-style block-max BM25 served straight from the segment store —
    the true skip-pointer path (north_star: "skip-pointered posting
    lists"): whole chunks whose summed upper bound can't reach the top-k
    threshold are never decoded and — thanks to Parquet column pruning on
    the metadata-only scan — their payload bytes are never even read.

    Exactness: chunk = doc_id // span is TERM-INDEPENDENT, so a doc's
    postings for every query term live in the same chunk id; a doc's
    score is bounded by sum_t ub(t, chunk) and any doc with final score
    >= θ therefore lies in a chunk with bound >= θ. θ is seeded with the
    exact scores of the rarest terms' docs (cheapest payloads). Asserted
    equal to ``segment_bm25_topk`` in tests."""
    import json as _json
    import os

    from phphinder_spark.scoring import bm25_idf

    with open(os.path.join(index_dir, "stats.json")) as fh:
        stats = _json.load(fh)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"][field]
    terms = [str(t) for t in terms]
    seg = spark.read.parquet(os.path.join(index_dir, "segments")).where(
        (F.col("field") == field) & F.col("term").isin(terms)
    )
    # global df per query term (tiny)
    dict_rows = (
        spark.read.parquet(os.path.join(index_dir, "dictionary"))
        .where((F.col("field") == field) & F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    )
    if not dict_rows:
        return (
            spark.createDataFrame([], "doc_id long, score double"),
            {
                "theta": float("-inf"),
                "chunks_total": 0,
                "chunks_decoded": 0,
                "chunk_skip_fraction": 0.0,
            },
        )
    dfreq = {r["term"]: r["df"] for r in dict_rows}
    idf = {t: bm25_idf(n_docs, dfreq[t]) for t in dfreq}
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens")).where(
        F.col("field") == field
    )

    def exact_scores(seg_rows: DataFrame) -> DataFrame:
        idf_col = F.create_map(
            *[x for t, v in idf.items() for x in (F.lit(t), F.lit(v))]
        )
        return (
            decode_segments(seg_rows, with_positions=False)
            .join(doclens.select("doc_id", "dl"), "doc_id")
            .withColumn(
                "contrib",
                idf_col[F.col("term")]
                * F.col("tf").cast("double")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
                ),
            )
            .groupBy("doc_id")
            .agg(F.round(F.sum("contrib"), 6).alias("score"))
        )

    # chunk bounds from METADATA ONLY — payload column never scanned here
    meta = seg.select("term", "chunk", "max_tf").collect()
    chunk_bound: dict[int, float] = {}
    terms_per_chunk: dict[int, set] = {}
    for r in meta:
        ub = (
            idf[r["term"]]
            * r["max_tf"]
            * (k1 + 1.0)
            / (r["max_tf"] + k1 * (1.0 - b))
        )
        chunk_bound[r["chunk"]] = chunk_bound.get(r["chunk"], 0.0) + ub
        terms_per_chunk.setdefault(r["chunk"], set()).add(r["term"])

    # quick reject (all-hot queries): when EVERY chunk holds EVERY query
    # term, bound-based skipping can at best shave tf variance while the
    # θ-seeding pass decodes its seed chunks twice — measured 2x slower
    # than exhaustive at 1.5M docs (BENCH.md crossover, 'function return
    # class'). Score everything in one pass instead; identical top-k.
    if len(terms_per_chunk) > 0 and all(
        len(s) == len(dfreq) for s in terms_per_chunk.values()
    ):
        topk = (
            exact_scores(seg)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        metrics = {
            "theta": float("-inf"),
            "chunks_total": len(chunk_bound),
            "chunks_decoded": len(chunk_bound),
            "chunk_skip_fraction": 0.0,
            "quick_reject": True,
        }
        return topk, metrics

    # θ seed: rarest terms (ascending global df) until the seed can fill k
    seed_terms: list[str] = []
    cum = 0
    for t in sorted(dfreq, key=lambda t: (dfreq[t], t)):
        seed_terms.append(t)
        cum += dfreq[t]
        if cum >= k:
            break
    seed_chunks = sorted(
        {r["chunk"] for r in meta if r["term"] in set(seed_terms)}
    )
    seed_scores = exact_scores(
        seg.where(F.col("chunk").isin(seed_chunks))
    )
    if len(seed_chunks) == len(chunk_bound):
        # the θ-seed already touches every chunk (typical for a needle
        # term paired with spread terms on an unclustered layout): its
        # exact scores ARE the exhaustive result — skip the bound and
        # survivor passes outright
        topk = seed_scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        metrics = {
            "theta": float("-inf"),
            "chunks_total": len(chunk_bound),
            "chunks_decoded": len(chunk_bound),
            "chunk_skip_fraction": 0.0,
            "seed_covered_all": True,
        }
        return topk, metrics
    kth = seed_scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    theta = kth[-1]["score"] if len(kth) >= k else float("-inf")

    survivors = sorted(
        c for c, bound in chunk_bound.items() if bound >= theta - 1e-6
    )
    topk = (
        exact_scores(seg.where(F.col("chunk").isin(survivors)))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    metrics = {
        "theta": theta,
        "chunks_total": len(chunk_bound),
        "chunks_decoded": len(survivors),
        "chunk_skip_fraction": round(
            1.0 - len(survivors) / max(len(chunk_bound), 1), 4
        ),
    }
    if collect_metrics:
        metrics["seed_chunks"] = len(seed_chunks)
    return topk, metrics
