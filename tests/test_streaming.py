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
