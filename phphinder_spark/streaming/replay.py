"""Batch-replay certification for the streaming operators.

The streaming layer (streaming/incremental.py) was pytest-covered only;
these runners execute the REAL streaming operators — file source, micro-
batches, watermarks, state store — over a committed set of batch files
and surface the final result as a plain DataFrame, in a form whose value
is independent of micro-batch arrival order:

- ``replay_running_term_df``: the per-term running document frequency is
  monotone non-decreasing, so the final state is the max over all
  update-mode emissions — order-free, and equal to the batch dictionary
  (``SELECT term, count(distinct doc) ...``).
- ``replay_dedup_shas``: ``dedup_stream`` emits exactly one row per
  distinct content within the watermark horizon; projecting emissions to
  the content hash makes the output the distinct-sha set regardless of
  which physical row won inside a micro-batch. Row COUNT equality with
  the batch distinct is the dedup guarantee itself.
- ``replay_ingest_windows``: complete-mode windowed aggregation — final
  windows equal the batch group-by on the same event times.

This gives the streaming family the same value-level DuckDB-oracle
certification as the batch operators (stream result ≡ batch SQL over the
same rows). Event times are derived deterministically from doc ids
(``_EPOCH + doc_id`` seconds) so the oracle can reconstruct the windows.
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from phphinder_spark.streaming.incremental import (
    dedup_stream,
    running_term_df_stream,
    windowed_ingest_stats,
)

# 2026-01-01 00:00:00 UTC; minute-aligned so Spark's epoch-aligned
# window(ts, '1 minute') boundaries replay as (epoch+doc_id)//60*60 in SQL
_EPOCH = 1_767_225_600

_SEQ = itertools.count()


def stage_batches(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_batches: int = 4,
    id_col: str = "doc_id",
) -> StructType:
    """Split ``docs`` into ``n_batches`` parquet waves (by id modulus —
    deterministic membership) with a synthetic ``event_time`` column of
    ``_EPOCH + doc_id`` seconds. Returns the staged schema for
    ``readStream.schema(...)``."""
    staged = docs.withColumn(
        "event_time",
        F.timestamp_seconds(F.lit(_EPOCH) + F.col(id_col)),
    )
    for i in range(n_batches):
        staged.where(F.col(id_col) % n_batches == i).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/wave{i}.parquet")
    return staged.schema


def _file_stream(spark: SparkSession, batches_dir: str, schema: StructType) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(batches_dir)
    )


def _run(writer, name: str, timeout: int = 600) -> None:
    q = writer.trigger(availableNow=True).start()
    if not q.awaitTermination(timeout):
        q.stop()
        raise RuntimeError(f"streaming replay {name!r} did not finish in {timeout}s")


def _materialize(spark: SparkSession, name: str, result: DataFrame, ckpt: str) -> DataFrame:
    """Pin the memory-sink result into session blocks (lineage cut), then
    drop the sink's temp view and the stream's checkpoint dir — repeated
    replays in a long-lived session must not accumulate catalog entries or
    on-disk checkpoint directories (round-5 advice). Callers invoke this
    AFTER awaitTermination, when neither artifact is needed again."""
    try:
        out = result.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def replay_running_term_df(
    spark: SparkSession,
    batches_dir: str,
    schema: StructType,
    col: str = "text",
) -> DataFrame:
    """Final running-term-df state after replaying all batches through the
    applyInPandasWithState operator. Update-mode emissions are monotone
    per term, so max(df) per term IS the final state."""
    name = f"replay_term_df_{next(_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix="phph_replay_tdf_")
    try:
        _run(
            running_term_df_stream(_file_stream(spark, batches_dir, schema), col=col)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt),
            name,
        )
    except BaseException:
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
        raise
    return _materialize(
        spark, name, spark.table(name).groupBy("term").agg(F.max("df").alias("df")), ckpt
    )


def replay_dedup_shas(
    spark: SparkSession,
    batches_dir: str,
    schema: StructType,
    content_col: str = "text",
    watermark: str = "30 days",
) -> DataFrame:
    """All emissions of the streaming exact dedup, projected to the
    content sha. No distinct() on purpose: if the operator over-emitted,
    the row count would exceed the batch distinct and fail the oracle."""
    name = f"replay_dedup_{next(_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix="phph_replay_dedup_")
    deduped = dedup_stream(
        _file_stream(spark, batches_dir, schema),
        content_col=content_col,
        event_time_col="event_time",
        watermark=watermark,
    )
    try:
        _run(
            deduped.select(F.sha2(F.col(content_col), 256).alias("sha"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt),
            name,
        )
    except BaseException:
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
        raise
    return _materialize(spark, name, spark.table(name).select("sha"), ckpt)


def replay_ingest_windows(
    spark: SparkSession,
    batches_dir: str,
    schema: StructType,
    content_col: str = "text",
    group_col: str = "lang",
    window: str = "1 minute",
) -> DataFrame:
    """Final complete-mode windowed ingest stats (docs + bytes per
    1-minute event-time window per group)."""
    name = f"replay_windows_{next(_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix="phph_replay_win_")
    stream = _file_stream(spark, batches_dir, schema).withColumnRenamed(
        content_col, "content"
    )
    try:
        _run(
            windowed_ingest_stats(
                stream, window=window, watermark="30 days", group_col=group_col
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt),
            name,
        )
    except BaseException:
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
        raise
    return _materialize(
        spark,
        name,
        spark.table(name).select(
            F.col("window.start").cast("long").alias("win_start"),
            F.col(group_col),
            F.col("n_docs"),
            F.col("n_bytes"),
        ),
        ckpt,
    )


def stage_event_batches(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    n_batches: int = 4,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> StructType:
    """Split an event log into parquet waves by id modulus, converting
    its timestamp to an ``event_time`` INSTANT via the NTZ-as-UTC rule
    (ops/events._micros) so watermarks and session windows behave the
    same in every session timezone. Unlike :func:`stage_batches` the
    event time is the log's REAL timestamp, not a synthetic one."""
    from phphinder_spark.ops.events import _micros

    staged = events.withColumn(
        "event_time", F.timestamp_micros(_micros(events, ts_col))
    ).drop(ts_col)
    for i in range(n_batches):
        staged.where(F.col(id_col) % n_batches == i).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/wave{i}.parquet")
    return staged.schema


def replay_session_stats(
    spark: SparkSession,
    batches_dir: str,
    schema: StructType,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Final session set after replaying the staged waves through the
    native session_window operator (complete mode: the state store
    merges partial sessions across micro-batches — an event wave can
    split one logical session across arrivals, and the final emission
    must still be ONE merged row). Output keys sessions by their start
    in epoch micros, so the batch oracle can reconstruct them with the
    same lag/running-sum form batch sessionize uses (boundary rule
    ``delta > gap`` — engine-verified identical to batch)."""
    from phphinder_spark.streaming.incremental import session_stats_stream

    name = f"replay_sessions_{next(_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix="phph_replay_sess_")
    try:
        _run(
            session_stats_stream(
                _file_stream(spark, batches_dir, schema),
                user_col=user_col,
                gap=gap,
                value_col=value_col,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt),
            name,
        )
    except BaseException:
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
        raise
    return _materialize(
        spark,
        name,
        spark.table(name).select(
            F.col(user_col),
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            F.col("n_events"),
            F.col("total_value"),
        ),
        ckpt,
    )


def replay_perplexity(
    spark: SparkSession,
    batches_dir: str,
    schema: StructType,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All per-doc scores after replaying the staged waves through the
    state-free ``perplexity_stream`` (foreachBatch + static LM).  Each
    doc lives in exactly one wave and the LM is static, so the emitted
    (doc_id, n_bigrams, nll_total) set is independent of micro-batch
    arrival order — no projection/aggregation needed for order freedom.
    The parquet sink and checkpoint dirs are removed after
    materialization (long-lived sessions must not accumulate them)."""
    from phphinder_spark.streaming.incremental import perplexity_stream

    ckpt = tempfile.mkdtemp(prefix="phph_replay_ppl_ckpt_")
    sink = tempfile.mkdtemp(prefix="phph_replay_ppl_sink_")
    try:
        _run(
            perplexity_stream(
                _file_stream(spark, batches_dir, schema),
                lm,
                sink,
                id_col=id_col,
                text_col=text_col,
            ).option("checkpointLocation", ckpt),
            "replay_perplexity",
        )
        return (
            spark.read.parquet(sink)
            .select(id_col, "n_bigrams", "nll_total")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
