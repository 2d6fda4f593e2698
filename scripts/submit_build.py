"""spark-submit entry point for the index build (north_rule: "runs via
spark-submit --py-files on multi-executor clusters").

Example (cluster):
    zip -r phphinder_spark.zip phphinder_spark
    spark-submit --py-files phphinder_spark.zip scripts/submit_build.py \
        --source /data/code_corpus --out /data/index --chunks 64

Example (sandbox, synthetic corpus):
    python scripts/submit_build.py --n-docs 50000 --out /tmp/idx --chunks 8

The job is resumable: re-submitting with the same --out continues from the
manifest checkpoint (see phphinder_spark/index/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:  # on a cluster the package arrives via --py-files phphinder_spark.zip
    import phphinder_spark  # noqa: F401
except ImportError:  # running from the repo checkout without packaging
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", help="parquet dir with (repo,path,commit,lang,content)")
    ap.add_argument("--n-docs", type=int, default=0, help="synthesize N docs instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None, help="override master (local runs)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("phphinder-index-build")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from phphinder_spark.corpus import generate_code_corpus
    from phphinder_spark.index.manifest import build_resumable_index
    from phphinder_spark.schema import code_schema

    if args.source:
        corpus = spark.read.parquet(args.source)
    elif args.n_docs:
        corpus = generate_code_corpus(spark, args.n_docs, seed=args.seed)
    else:
        ap.error("one of --source / --n-docs is required")

    manifest = build_resumable_index(
        spark, corpus, code_schema(), args.out, n_chunks=args.chunks
    )
    print(json.dumps({
        "completed": manifest["completed"],
        "n_docs": manifest["lineage"]["n_docs"],
        "docs_per_sec": manifest.get("total_docs_per_sec"),
        "stats": manifest.get("stats"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
