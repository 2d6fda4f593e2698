"""Regression tests for the round-1 verdict/advice findings:

1. flush(): same unique key twice in one batch while the key already
   exists in the index -> last write wins, no duplicate doc_id rows.
2. bm25_topk_batch: repeated query terms must contribute once (set
   semantics, same as the single-query path).
3. phrase_candidates: phrases with repeated tokens must align every
   (term, offset) slot ("red fish red" must not accept "red fish blue").
4. jaccard_pairs: default blocking is lossless — equals the unblocked
   brute force, including pairs that straddle the old size/10 band edges.
"""

import math

import pytest
from pyspark.sql import functions as F

from phphinder_spark.engine import SparkSearchEngine
from phphinder_spark.schema import test_schema as make_test_schema


def test_flush_duplicate_unique_key_in_batch_last_wins(spark):
    eng = SparkSearchEngine(spark, make_test_schema())
    eng.add_document({"_id": 1, "title": "one", "text": "original cat"})
    eng.flush()
    # batch contains key 1 twice; key 1 already exists in the index
    eng.add_document({"_id": 1, "title": "one", "text": "first rewrite dog"})
    eng.add_document({"_id": 1, "title": "one", "text": "second rewrite bird"})
    eng.flush()
    docs = eng.index.docs.where(F.col("_id") == "1").collect()
    assert len(docs) == 1
    assert docs[0]["text"] == "second rewrite bird"
    assert [r.doc_id for r in eng.search("bird")] == [docs[0]["doc_id"]]
    assert eng.search("dog") == []
    assert eng.search("cat") == []


def test_flush_string_typed_unique_key_coerces(spark):
    """Found by end-to-end drive: with a string-typed unique field and an
    int key value, the upsert probe compared int vs coerced-string and
    silently kept the old doc."""
    from phphinder_spark.analysis import Analyzer
    from phphinder_spark.schema import (
        IS_FULLTEXT,
        IS_INDEXED,
        IS_STORED,
        IS_UNIQUE,
        SearchSchema,
    )

    schema = SearchSchema(
        {
            "_id": IS_UNIQUE | IS_STORED | IS_INDEXED,
            "text": IS_INDEXED | IS_STORED | IS_FULLTEXT,
        },
        analyzer=Analyzer.lowercase_only(),
    )  # _id defaults to string type; keys below are ints
    eng = SparkSearchEngine(spark, schema)
    eng.add_document({"_id": 1, "text": "original cat"})
    eng.flush()
    eng.add_document({"_id": 1, "text": "rewrite bird"})
    eng.flush()
    docs = eng.index.docs.collect()
    assert len(docs) == 1
    assert docs[0]["text"] == "rewrite bird"


def test_bm25_batch_repeated_query_term_matches_single(spark):
    eng = SparkSearchEngine(spark, make_test_schema())
    eng.add_documents(
        [
            {"_id": 1, "title": "a", "text": "cat dog cat mouse"},
            {"_id": 2, "title": "b", "text": "cat fish"},
            {"_id": 3, "title": "c", "text": "dog dog house"},
        ]
    )
    eng.flush()
    single = {
        (r["doc_id"], r["score"])
        for r in eng.search_topk_bm25("cat dog", k=10, field="text").collect()
    }
    batched = {
        (r["doc_id"], r["score"])
        for r in eng.search_topk_bm25_many(["cat dog cat"], k=10, field="text")
        .collect()
    }
    assert batched == single


def test_phrase_candidates_repeated_tokens_slot_aligned(spark):
    from phphinder_spark.index.builder import build_index
    from phphinder_spark.index.phrase import phrase_match
    from phphinder_spark.analysis import Analyzer
    from phphinder_spark.schema import IS_INDEXED, IS_STORED, IS_FULLTEXT, SearchSchema

    schema = SearchSchema(
        {"text": IS_INDEXED | IS_STORED | IS_FULLTEXT},
        analyzer=Analyzer.lowercase_only(),
    )
    df = spark.createDataFrame(
        [
            (1, "red fish blue"),
            (2, "red fish red"),
            (3, "the red fish red swam"),
            (4, "red blue fish red"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(df, schema)
    got = {
        r["doc_id"]
        for r in phrase_match(
            idx.postings, idx.docs, schema.analyzer, "red fish red", "text",
            verify_substring=False,
        ).collect()
    }
    assert got == {2, 3}


def _brute_jaccard(rows, threshold):
    import re

    toks = {
        i: frozenset(t for t in re.split(r"\W+", s.lower()) if t)
        for i, s in rows
    }
    out = set()
    ids = sorted(toks)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = toks[ids[i]], toks[ids[j]]
            jac = round(len(a & b) / max(len(a | b), 1), 6)
            if jac >= threshold:
                out.add((ids[i], ids[j]))
    return out


def test_jaccard_pairs_blocking_is_lossless(spark):
    from phphinder_spark.ops.dedup import jaccard_pairs

    # 19 vs 21 distinct tokens straddling the old size/10 band edge with
    # high overlap — the r01 blocking dropped exactly this shape
    base = [f"w{i}" for i in range(19)]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base + ["x1", "x2"])),          # 19 vs 21, J = 19/21 ≈ 0.904
        (3, " ".join(base[:10] + ["y%d" % i for i in range(10)])),
        (4, "totally different words here entirely"),
        (5, " ".join(base + ["x1"])),                # 19 vs 20, J = 0.95
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.7, 0.9):
        got = {
            (r["a_id"], r["b_id"])
            for r in jaccard_pairs(df, "text", threshold=t).collect()
        }
        assert got == _brute_jaccard(rows, t), f"threshold {t}"
