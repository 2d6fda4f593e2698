"""Quickstart: everything a PHPhinder user does, Spark-first.

Run: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from phphinder_spark.engine import SparkSearchEngine
from phphinder_spark.schema import test_schema


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("phphinder-spark-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the reference README flow: add documents, flush, search
    engine = SparkSearchEngine(spark, test_schema())
    engine.add_document(
        {"_id": 1, "title": "Cat animal", "text": "Meow world! This is a PHP search engine."}
    ).add_document(
        {"_id": 2, "title": "Dog", "text": "Bark! PHPhinder makes search development fun."}
    )
    engine.flush()

    for phrase in ["search engine", "search OR engine", "world NOT(engine)",
                   '"search engine"', "develep"]:
        results = engine.search(phrase)
        print(f"{phrase!r}: {[(r.doc_id, r.terms, round(r.weight, 1)) for r in results]}")

    # BM25 top-k (the north-star scorer) + batched queries
    print("bm25:", engine.search_topk_bm25("search engine", k=5, field="text").collect())
    print(
        "batched:",
        engine.search_topk_bm25_many(["search", "bark"], k=3, field="text").collect(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
