"""Alice-corpus goldens (reference: tests/Performance/AliceSearchEngineTest.php
:65-102 — exact match counts per query). The corpus is Project Gutenberg #11
(public domain), shipped with the reference at tests/Performance/pg11.txt; we
load it read-only with the reference's loader rules (:136-177): 1-based line
counter, trim, skip blanks, ``CHAPTER ([MDCLXVI]+).`` sets the chapter and is
not indexed.
"""

import os
import re

import pytest

from phphinder_spark.engine import SparkSearchEngine
from phphinder_spark.schema import line_schema

PG11 = "/root/reference/tests/Performance/pg11.txt"

GOLDENS = [
    ("Ali*", 403),
    ("Mabel", 4),
    ("Alice", 400),
    ("said poor Alice", 1),
    ("Alice NOT(wonderland)", 395),
    ("Hatter", 57),
    ("gryphon", 55),
    ("griphon", 55),  # typo d=1
    ("winder", 35),  # typo: winter, wander, wider, wonder
    ('"“I advise you to leave off this minute!”"', 1),  # phrase
]


def load_alice_rows():
    rows = []
    chapter = "unknown"
    with open(PG11, encoding="utf-8") as fh:
        for line_no, raw in enumerate(fh, start=1):
            text = raw.strip()
            if text == "":
                continue
            m = re.match(r"^CHAPTER ([MDCLXVI]+)\.$", text)
            if m:
                chapter = m.group(1)
                continue
            rows.append((chapter, text, line_no))
    return rows


@pytest.fixture(scope="module")
def alice_engine(spark):
    if not os.path.exists(PG11):
        pytest.skip("reference pg11.txt not available")
    rows = load_alice_rows()
    df = spark.createDataFrame(
        [(i + 1, c, t, l) for i, (c, t, l) in enumerate(rows)],
        "doc_id long, chapter string, text string, line long",
    )
    eng = SparkSearchEngine(spark, line_schema())
    eng.index_dataframe(df)
    return eng


@pytest.mark.parametrize("query,expected", GOLDENS, ids=[q for q, _ in GOLDENS])
def test_alice_match_counts(alice_engine, query, expected):
    results = alice_engine.search_df(query).count()
    assert results == expected
