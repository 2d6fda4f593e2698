"""Sequence packing for LLM pre-training batch preparation.

``pack_sequences`` implements the concat-and-chunk batching used by
GPT-style pre-training pipelines: documents are laid end-to-end in a
deterministic global order and cut into fixed token-budget sequences;
each document learns which training sequence its first token lands in
and at what offset. (The reference engine has no training-data surface —
this op belongs to the LLM-pipeline extension layer, alongside
ops/dedup.py and ops/textstats.py.)

Scale design — a distributed prefix scan with exactly ONE corpus-scale
shuffle:

- ``repartitionByRange`` + ``sortWithinPartitions`` on the id gives a
  total order across partitions (partition 0 holds the smallest ids);
  the result is lazily ``localCheckpoint``-ed so the shuffle+sort+
  tokenize evaluates once even though two plan branches read it;
- the running sum WITHIN each partition is an Arrow-vectorized
  ``mapInPandas`` pass (numpy cumsum per batch + a scalar carry across
  batches) — NARROW, no exchange. A ``Window.partitionBy(_pid)`` would
  compute the same thing but forces a second corpus-scale hash exchange,
  because Catalyst cannot see that range partitions already cluster
  ``_pid``;
- the offset OF each partition is the exclusive prefix sum of the
  per-partition totals — a map-side-combining groupBy (one row per
  partition reaches the shuffle) then a global-window scan over that
  tiny frame (thousands of rows at 100 TB, never corpus-scale),
  broadcast back onto the scan output.

The naive formulation — ``sum().over(Window.orderBy(id))`` on the corpus
itself — funnels 100 TB through ONE task (Spark's unpartitioned window).
The output depends only on the global id order, never on partition
boundaries, so the range sampler's choice of split points cannot change
results.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from phphinder_spark.ops.textstats import tokens_col

_SCAN_SCHEMA = "doc_id long, n_tokens long, _pid int, _lex long"


def _partition_cumsum(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    # one call per (range-sorted) partition; `carry` threads the running
    # total across Arrow batches
    carry = 0
    for pdf in batches:
        n = pdf["n_tokens"].to_numpy("int64")
        cum = n.cumsum()
        pdf["_lex"] = cum - n + carry
        carry += int(cum[-1]) if len(n) else 0
        yield pdf


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col_name: str | None = None,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, seq_offset) — concat-and-chunk packing.

    Documents ordered by ``id_col`` (must be unique — the order defines
    the packing) are concatenated into an infinite token stream and cut
    every ``max_tokens`` tokens; ``seq_id`` is the chunk containing the
    document's FIRST token and ``seq_offset`` its position inside that
    chunk. Long documents simply span several chunks (chunking tolerates
    mid-document cuts, exactly like pre-training data loaders); empty
    documents attach to the chunk at the current stream position.

    Token counts come from ``tokens_col_name`` if given (a precomputed
    count column, e.g. from :func:`token_counts`), else from the shared
    ``\\W+`` tokenizer over ``text_col``.

    NULL contract: a NULL text (or NULL precomputed count) contributes
    **0 tokens** — the doc attaches to the stream position like an empty
    doc. Without the guard, legacy ``F.size(NULL)`` returns ``-1``, which
    would silently shift the global prefix sum (negative ``seq_offset``
    for every later doc), and a NULL count would crash the Arrow cumsum.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if tokens_col_name is not None:
        n_tok = F.coalesce(F.col(tokens_col_name).cast("long"), F.lit(0))
    else:
        # guard BOTH legs: legacy size(NULL) = -1, ANSI size(NULL) = NULL
        n_tok = F.when(
            F.col(text_col).isNotNull(), F.size(tokens_col(text_col))
        ).otherwise(F.lit(0)).cast("long")
        n_tok = F.coalesce(n_tok, F.lit(0))
    base = df.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tokens"))

    n_parts = num_partitions or int(
        base.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranged = (
        base.repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    # exclusive running sum inside each range partition: narrow,
    # Arrow-vectorized, zero exchanges
    lex = ranged.withColumn("_lex", F.lit(0).cast("long")).mapInPandas(
        _partition_cumsum, _SCAN_SCHEMA
    )

    # exclusive prefix of per-partition totals: map-side combine leaves
    # one row per partition, so the unpartitioned window below scans a
    # tiny aggregate, never the corpus
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )

    start = F.col("_off") + F.col("_lex")
    return lex.join(F.broadcast(offsets), "_pid").select(
        "doc_id",
        "n_tokens",
        F.floor(start / max_tokens).cast("long").alias("seq_id"),
        (start % max_tokens).cast("long").alias("seq_offset"),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token-window chunking — the splitting step of
    long-context training prep and embedding indexing (cut each doc into
    windows of at most ``max_tokens`` tokens; ``stride < max_tokens``
    gives overlapping sliding windows, the usual retrieval-index shape).
    Unlike :func:`pack_sequences` (which concatenates ACROSS documents),
    chunks never cross document boundaries.

    Window ``i`` covers tokens ``[i*stride, i*stride + max_tokens)``;
    starts run over ``0, stride, 2*stride, ...`` while ``start <
    n_tokens``, so the final window may be short. Returns (doc_id,
    chunk_id, chunk_text, n_tokens) with ``chunk_text`` the
    space-joined tokens (token-normalized, like the other rebuild ops).
    Empty and NULL documents emit zero chunks.

    Scale: entirely map-side — tokenize, ``sequence`` of starts,
    ``transform``+``slice``, one ``posexplode``. Zero shuffles, zero
    joins; output row count is sum(ceil(n_doc / stride)), each task
    chunks only its own documents."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    stride = max_tokens if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).where(F.size("toks") > 0)
    chunks = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride)),
        lambda s: F.slice("toks", s + 1, max_tokens),
    )
    return base.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "ck")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join("ck", " ").alias("chunk_text"),
        F.size("ck").cast("long").alias("n_tokens"),
    )
