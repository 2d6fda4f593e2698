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
