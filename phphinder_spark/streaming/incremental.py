"""Incremental indexing via Structured Streaming.

The reference is batch-only (explicit flush commits,
src/SearchEngine.php:53-63; SURVEY.md §2.10), so this is the optional
forward path (§7.5): new corpus files land in a directory, a file-source
stream picks them up, and ``foreachBatch`` appends a postings partition
per micro-batch — the streaming analogue of the manifest's chunked build.
Postings written per batch are immutable appends (batch_id column), so
the serving dictionary is the same hierarchical merge used by segments;
checkpointing makes the stream exactly-once per input file.

Doc ids must stay deterministic under replays, so the streaming path
derives them from row content alone: xxhash64(repo, path, commit) — a
sparse 64-bit id rather than the batch path's dense rank (dense ranking
needs global state; a content hash is the streaming-safe equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from phphinder_spark.index.builder import build_postings
from phphinder_spark.schema import SearchSchema


def _with_hash_doc_ids(df: DataFrame, key_cols: list[str]) -> DataFrame:
    return df.withColumn(
        "doc_id", F.xxhash64(*key_cols).bitwiseAND(F.lit((1 << 62) - 1))
    )


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    schema: SearchSchema,
    corpus_ddl: str = (
        "repo string, path string, commit string, lang string, content string"
    ),
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    trigger_once: bool = True,
):
    """Start (and by default run-once) the incremental indexing stream.

    Returns the StreamingQuery. Output layout matches the batch builder:
    ``out_dir/docs`` and ``out_dir/postings`` parquet appends, partitioned
    by micro-batch id for lineage."""

    stream = (
        spark.readStream.schema(corpus_ddl)
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = _with_hash_doc_ids(batch_df, list(key_cols))
        audit = next((f for f in schema.fulltext_fields if f in docs.columns), None)
        if audit:
            docs = docs.withColumn("content_sha256", F.sha2(F.col(audit), 256))
        docs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{out_dir}/docs"
        )
        postings = build_postings(docs, schema)
        postings.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{out_dir}/postings"
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    stream: DataFrame,
    content_col: str = "content",
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming EXACT dedup over a content column with bounded state:
    sha2(content) keys ``dropDuplicatesWithinWatermark`` — duplicates
    arriving within the watermark horizon are dropped; the content-hash
    state is evicted once the watermark passes, so state size tracks the
    event-time window, never the full history. (For unbounded-history
    dedup, run the batch ``ops.dedup.exact_duplicates`` over the sink —
    streaming-global state at 100 TB is the wrong tool.)"""
    return (
        stream.withColumn("_h", F.sha2(F.col(content_col), 256))
        .withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def running_term_df_stream(
    stream: DataFrame,
    col: str = "content",
    token_split: str = r"\W+",
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): a RUNNING
    per-term document frequency over a document stream — the streamed
    analogue of the batch dictionary, maintained incrementally instead of
    rescanning the corpus per refresh.

    Per micro-batch each doc contributes its DISTINCT lowercase tokens;
    the per-term state is one long (docs seen so far), updated and
    re-emitted only for terms present in the batch (update semantics).
    State size is O(|vocabulary|) — the same artifact the batch
    dictionary materializes — and survives restarts via the checkpoint
    (asserted in tests). Upstream must deliver each doc exactly once
    (the file source + checkpoint does); re-delivered docs would double
    count, the standard caveat of streamed df maintenance."""
    import pandas as pd

    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(col)), token_split), lambda x: x != "")
    )
    exploded = stream.select(F.explode(toks).alias("term"))

    def update(key, pdfs, state) -> "object":
        add = 0
        for pdf in pdfs:
            add += len(pdf)
        total = (state.get[0] if state.exists else 0) + add
        state.update((total,))
        yield pd.DataFrame({"term": [key[0]], "df": [total]})

    return exploded.groupBy("term").applyInPandasWithState(
        update,
        outputStructType="term string, df long",
        stateStructType="df long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def windowed_ingest_stats(
    stream: DataFrame,
    event_time_col: str = "event_time",
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "5 minutes",
    group_col: str | None = "lang",
) -> DataFrame:
    """Watermarked sliding-window ingestion metrics (docs, bytes) — the
    late-data-correct way to produce the north_star's build metrics
    (docs/sec) from a stream: events later than ``watermark`` are
    dropped deterministically, windows finalize exactly once."""
    win = F.window(F.col(event_time_col), window, slide or window)
    keys = [win] + ([F.col(group_col)] if group_col else [])
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("content")).alias("n_bytes"),
        )
    )


def session_stats_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    event_time_col: str = "event_time",
    gap: str = "30 minutes",
    value_col: str = "value",
    watermark: str = "30 days",
) -> DataFrame:
    """Streaming gap-based sessionization via Spark's NATIVE
    ``session_window`` state operator: per (user, session) event count +
    summed value, sessions closing when the watermark passes their end.
    This is the live-telemetry form of ``ops.events.session_stats`` —
    unbounded logs, bounded state (open sessions only; closed sessions
    are evicted once the watermark passes their end + gap).

    Boundary semantics match the batch op exactly — empirically pinned
    (tests/test_events_codequality.py): ``session_window`` merges the
    next event while it starts AT OR BEFORE current end (= last event +
    gap), so a gap exactly equal to the threshold stays in the session,
    identical to batch ``sessionize``'s ``delta > gap`` new-session
    rule. (The Spark doc's "within the gap" is ambiguous on this edge;
    the test keeps us honest if the engine ever changes it.)

    Output: ``(session_window struct, user_col, n_events, total_value)``
    — callers project ``session_window.start`` as the session id."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(
            F.session_window(F.col(event_time_col), gap), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
    )


def perplexity_stream(
    stream: DataFrame,
    lm: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming perplexity scoring against a STATIC ``train_bigram_lm``
    artifact (the serving shape of CCNet filtering: the LM is trained
    offline, the corpus arrives as a stream).

    Per-doc scores are micro-batch-local — a doc is atomic within its
    arriving file, so ``foreachBatch`` + the batch ``score_perplexity``
    is exact and STATE-FREE (no streaming aggregation state, no
    watermark): the stream side explodes to bigrams and joins the static
    pre-aggregated LM per batch (stream-static equi-join shape), and
    results append to ``out_dir`` partitioned by micro-batch for
    lineage. Returns the writer; the caller sets checkpoint/trigger and
    starts it."""
    from phphinder_spark.ops.lm import score_perplexity

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        score_perplexity(
            batch_df, lm, id_col=id_col, text_col=text_col
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return stream.writeStream.foreachBatch(process_batch)
