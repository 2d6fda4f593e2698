"""Distributed text-corpus loader (S7) vs the sequential reference loader.

The reference loads Alice line-by-line on one machine
(tests/Performance/AliceSearchEngineTest.php:139-175); ``load_text_corpus``
must produce the identical (doc_id, chapter, text, line) rows from
``spark.read.text`` — including when the file is split across many input
partitions (the split-carry chapter/line logic under test).
"""

import os

import pytest

from phphinder_spark.corpus import load_text_corpus

PG11 = "/root/reference/tests/Performance/pg11.txt"


def _sequential_rows():
    import re

    rows = []
    chapter = "unknown"
    # utf-8-sig: Spark's text source strips the BOM; match that here (the
    # BOM is tokenization-invisible either way — \W+ drops it)
    with open(PG11, encoding="utf-8-sig") as fh:
        for line_no, raw in enumerate(fh, start=1):
            text = raw.strip()
            if text == "":
                continue
            m = re.match(r"^CHAPTER ([MDCLXVI]+)\.$", text)
            if m:
                chapter = m.group(1)
                continue
            rows.append((chapter, text, line_no))
    return [(i + 1, c, t, l) for i, (c, t, l) in enumerate(rows)]


@pytest.mark.skipif(not os.path.exists(PG11), reason="pg11.txt not available")
@pytest.mark.parametrize("max_split_bytes", ["128m", "16k"])
def test_load_text_corpus_matches_sequential(spark, max_split_bytes):
    expected = _sequential_rows()
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", max_split_bytes)
    try:
        got = [
            (r["doc_id"], r["chapter"], r["text"], r["line"])
            for r in load_text_corpus(spark, PG11).orderBy("doc_id").collect()
        ]
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(got) == len(expected)
    assert got == expected
