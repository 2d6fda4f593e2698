"""Measure the phrase-path crossover: contains scan vs positional-index
prefilter, memory-served engine, by corpus size — validates the
residence-keyed ``phrase_strategy='auto'`` rule documented in engine.py
(cached in-memory corpus -> contains scan; segment/parquet serving ->
positional/shadow prefilter), showing the scan wins at EVERY size that
fits in memory rather than at a doc-count threshold.

Usage: python scripts/phrase_crossover.py [sizes...]
Writes one JSON line per size to stdout.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from phphinder_spark.corpus import generate_code_corpus
from phphinder_spark.engine import SparkSearchEngine
from phphinder_spark.index.builder import assign_doc_ids
from phphinder_spark.schema import code_schema


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [20_000, 50_000, 100_000, 200_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("phrase-crossover")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    phrases = ['"function return"', '"varint delta"', '"needle_100"']
    for n in sizes:
        corpus = assign_doc_ids(
            generate_code_corpus(spark, n, seed=7), ["repo", "path"]
        )
        times = {}
        for strat in ("scan", "index"):
            eng = SparkSearchEngine(spark, code_schema(), phrase_strategy=strat)
            eng.index_dataframe(corpus)
            eng.index.postings.cache().count()
            eng.index.stats()  # pre-pay the memoized stats count both sides
            # warm one query to exclude first-job setup, then time the set
            eng.search_df(phrases[0]).count()
            t0 = time.time()
            rows = [eng.search_df(p).count() for p in phrases]
            times[strat] = round(time.time() - t0, 3)
            times[f"{strat}_rows"] = rows
            eng.truncate()
        print(json.dumps({"n_docs": n, **times}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
