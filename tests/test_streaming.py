"""Incremental streaming index: postings from streamed micro-batches must
equal a bulk build over the same rows (modulo the streaming hash doc_id),
and restarts must not duplicate work (exactly-once per input file)."""

import pytest
from pyspark.sql import functions as F

from phphinder_spark.corpus import generate_code_corpus
from phphinder_spark.index.builder import build_postings
from phphinder_spark.schema import code_schema
from phphinder_spark.streaming.incremental import (
    _with_hash_doc_ids,
    incremental_index_stream,
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inp = str(root / "incoming")
    corpus = generate_code_corpus(spark, 200, seed=3, partitions=2)
    corpus.where(F.col("path").contains("file_1")).write.parquet(
        f"{inp}/wave1.parquet"
    )
    corpus.where(~F.col("path").contains("file_1")).write.parquet(
        f"{inp}/wave2.parquet"
    )
    return str(root), inp, corpus


def test_streaming_matches_bulk(spark, staged):
    root, inp, corpus = staged
    out = f"{root}/index"
    q = incremental_index_stream(spark, inp, out, code_schema())
    q.awaitTermination(180)

    streamed = spark.read.parquet(f"{out}/postings")
    bulk = build_postings(
        _with_hash_doc_ids(corpus, ["repo", "path", "commit"]), code_schema()
    )
    a = sorted(
        (r["field"], r["term"], r["doc_id"], r["tf"], tuple(r["positions"]))
        for r in streamed.collect()
    )
    b = sorted(
        (r["field"], r["term"], r["doc_id"], r["tf"], tuple(r["positions"]))
        for r in bulk.collect()
    )
    assert a == b

    # restart with no new files: checkpoint prevents reprocessing
    q2 = incremental_index_stream(spark, inp, out, code_schema())
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/postings").count() == len(a)

    # audit column present on streamed docs
    docs = spark.read.parquet(f"{out}/docs")
    assert "content_sha256" in docs.columns
    assert docs.count() == corpus.count()


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Duplicate content arriving within the watermark is dropped; state
    is keyed on the content hash (exactly-once per distinct content)."""
    from datetime import datetime

    from phphinder_spark.streaming.incremental import dedup_stream

    inp = str(tmp_path / "in")
    rows = [
        (datetime(2026, 1, 1, 0, 0, 0), "r1", "alpha beta"),
        (datetime(2026, 1, 1, 0, 0, 10), "r2", "alpha beta"),  # dup
        (datetime(2026, 1, 1, 0, 0, 20), "r3", "gamma delta"),
        (datetime(2026, 1, 1, 0, 0, 30), "r4", "alpha beta"),  # dup
    ]
    spark.createDataFrame(
        rows, "event_time timestamp, repo string, content string"
    ).write.parquet(inp)
    stream = spark.readStream.schema(
        "event_time timestamp, repo string, content string"
    ).parquet(inp)
    out = str(tmp_path / "out")
    q = (
        dedup_stream(stream, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["content"] for r in spark.read.parquet(out).collect())
    assert got == ["alpha beta", "gamma delta"]


def test_running_term_df_state_accumulates_and_survives_restart(spark, tmp_path):
    """applyInPandasWithState custom operator: per-term running document
    frequency accumulates across micro-batches and restores from the
    checkpoint on restart."""
    from phphinder_spark.streaming.incremental import running_term_df_stream

    inp = str(tmp_path / "in")
    ddl = "repo string, content string"
    spark.createDataFrame(
        [("r1", "alpha beta alpha"), ("r2", "alpha gamma")], ddl
    ).write.parquet(f"{inp}/w0.parquet")
    spark.createDataFrame([("r3", "beta beta delta")], ddl).write.parquet(
        f"{inp}/w1.parquet"
    )

    upd = str(tmp_path / "updates")

    def run():
        stream = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(inp)
        )

        # foreachBatch sink: supports update-mode output AND checkpoint
        # recovery (the memory sink does not recover)
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(upd)

        q = (
            running_term_df_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["term"]: r["df"]
            for r in spark.read.parquet(upd)
            .groupBy("term")
            .agg(F.max("df").alias("df"))
            .collect()
        }

    got = run()
    # per-doc DISTINCT tokens: alpha in 2 docs, beta in 2, gamma/delta in 1
    assert got == {"alpha": 2, "beta": 2, "gamma": 1, "delta": 1}

    # restart with a new wave: state restores from the checkpoint and
    # keeps counting (not reset to the new wave's counts)
    spark.createDataFrame([("r4", "alpha delta")], ddl).write.parquet(
        f"{inp}/w2.parquet"
    )
    got2 = run()
    assert got2 == {"alpha": 3, "beta": 2, "gamma": 1, "delta": 2}


def test_windowed_ingest_stats(spark, tmp_path):
    from datetime import datetime

    from phphinder_spark.streaming.incremental import windowed_ingest_stats

    inp = str(tmp_path / "in")
    ddl = "event_time timestamp, lang string, content string"
    # one file per micro-batch: the watermark advances BETWEEN batches,
    # so the minute-0 window finalizes when the far-future wave arrives
    waves = [
        [(datetime(2026, 1, 1, 0, 0, 5), "py", "aaaa"),
         (datetime(2026, 1, 1, 0, 0, 50), "py", "bb")],
        [(datetime(2026, 1, 1, 0, 1, 10), "go", "cccccc")],
        [(datetime(2026, 1, 1, 1, 0, 0), "md", "x")],
    ]
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, ddl).write.parquet(f"{inp}/w{i}.parquet")
    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    out = str(tmp_path / "out")
    q = (
        windowed_ingest_stats(stream, window="1 minute")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["lang"], r["window"]["start"].minute): (r["n_docs"], r["n_bytes"])
        for r in spark.read.parquet(out).collect()
    }
    # append mode emits only watermark-finalized windows: minute 0 closes
    # once the minute-1 event advances the watermark past it
    assert got[("py", 0)] == (2, 6)


def test_quality_and_pii_ops_run_on_streams(spark, tmp_path):
    """gopher_quality and pii_scrub are stateless projections, so they
    must compose with Structured Streaming unchanged — the shape a
    100-TB ingest pipeline actually runs them in (filter/scrub on the
    way in, before any batch dedup pass)."""
    from phphinder_spark.ops.textstats import gopher_quality, pii_scrub

    inp = str(tmp_path / "qin")
    good = "the quick brown fox jumps over lazy dogs and cats with style "
    spark.createDataFrame(
        [(1, good * 4 + " ping admin@corp.io"), (2, "too short")],
        "doc_id long, text string",
    ).write.parquet(inp)
    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)

    scrubbed = pii_scrub(stream)
    gated = gopher_quality(stream, min_words=20).where("gopher_pass")
    out1, out2 = str(tmp_path / "qs"), str(tmp_path / "qg")
    for df, out, ck in ((scrubbed, out1, "c1"), (gated, out2, "c2")):
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    s = {r["doc_id"]: r for r in spark.read.parquet(out1).collect()}
    assert s[1]["n_email"] == 1 and "<EMAIL>" in s[1]["scrubbed"]
    kept = [r["doc_id"] for r in spark.read.parquet(out2).collect()]
    assert kept == [1]


def test_batch_replay_harness_matches_batch_semantics(spark, tmp_path):
    """The round-5 replay harness (the driver-oracle streaming rows):
    running term-df final state == batch distinct-doc counts; dedup
    emissions == one row per distinct content; windowed stats == batch
    group-by on the synthetic event times."""
    from phphinder_spark.streaming.replay import (
        _EPOCH,
        replay_dedup_shas,
        replay_ingest_windows,
        replay_running_term_df,
        stage_batches,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "py"),
            (1, "alpha gamma", "py"),
            (2, "alpha beta", "go"),   # exact dup of doc 0
            (61, "beta delta", "go"),  # lands in the next 1-minute window
        ],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "waves")
    schema = stage_batches(spark, docs, out, n_batches=2)

    tdf = {
        r["term"]: r["df"]
        for r in replay_running_term_df(spark, out, schema).collect()
    }
    assert tdf == {"alpha": 3, "beta": 3, "gamma": 1, "delta": 1}

    shas = [r["sha"] for r in replay_dedup_shas(spark, out, schema).collect()]
    assert len(shas) == 3 and len(set(shas)) == 3  # one per distinct text

    wins = {
        (r["win_start"], r["lang"]): (r["n_docs"], r["n_bytes"])
        for r in replay_ingest_windows(spark, out, schema).collect()
    }
    assert wins[(_EPOCH, "py")] == (2, 21)
    assert wins[(_EPOCH, "go")] == (1, 10)
    assert wins[(_EPOCH + 60, "go")] == (1, 10)


def test_perplexity_stream_matches_batch(spark, tmp_path):
    """State-free streaming scoring against a static LM: replaying the
    staged waves must reproduce the batch score_perplexity rows
    exactly (doc atomicity per wave + static artifact => order-free)."""
    from phphinder_spark.ops.lm import score_perplexity, train_bigram_lm
    from phphinder_spark.streaming.replay import (
        replay_perplexity,
        stage_batches,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_bigram_lm(
        docs.where(F.col("doc_id") % 2 == 0)
    ).localCheckpoint()
    d = str(tmp_path / "waves")
    sch = stage_batches(spark, docs, d, n_batches=3)
    got = sorted(
        map(tuple, replay_perplexity(spark, d, sch, model).collect())
    )
    want = sorted(
        map(
            tuple,
            score_perplexity(docs, model)
            .select("doc_id", "n_bigrams", "nll_total")
            .collect(),
        )
    )
    assert got == want
