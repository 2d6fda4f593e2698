"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster in this sandbox, so per BASELINE.md the same job runs on
the same input at local[8] (N) and local[32] (4N) on this 32-core box:
build the inverted index over a deterministic synthetic code corpus
(input_hint shape) and run a fixed BM25 query set. Each configuration runs
in its own subprocess (fresh JVM) for isolation.

Usage: python scripts/scaling.py [n_docs]   # default 100_000
Writes scaling results JSON to stdout and appends a row to BENCH.md.
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"scaling-{cpus}")
    .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from phphinder_spark.corpus import generate_code_corpus
from phphinder_spark.engine import SparkSearchEngine
from phphinder_spark.index.builder import assign_doc_ids
from phphinder_spark.schema import code_schema

corpus = generate_code_corpus(spark, n_docs, seed=42, partitions=4 * cpus)
t0 = time.time()
docs = assign_doc_ids(corpus, ["repo", "path", "commit"])
eng = SparkSearchEngine(spark, code_schema())
eng.index_dataframe(docs)
n_post = eng.index.postings.count()
build_sec = time.time() - t0

queries = ["varint delta merge", "function return class", "needle_100",
           "broadcast shuffle partition", "encode decode segment"]
t1 = time.time()
tops = []
for q in queries:
    tops.append([(r["doc_id"], r["score"]) for r in
                 eng.search_topk_bm25(q, k=10, field="content").collect()])
query_sec = time.time() - t1
print(json.dumps({
    "cpus": cpus, "n_docs": n_docs, "n_postings": n_post,
    "build_sec": round(build_sec, 2),
    "docs_per_sec": round(n_docs / build_sec, 1),
    "postings_per_sec": round(n_post / build_sec, 1),
    "query_sec": round(query_sec, 2),
    "query_avg_sec": round(query_sec / len(queries), 3),
    "topk": tops,
}))
spark.stop()
"""


def run(cpus: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_docs)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    r8 = run(8, n_docs)
    r32 = run(32, n_docs)
    eff_build = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])
    rank_identical = r8["topk"] == r32["topk"]
    summary = {
        "n_docs": n_docs,
        "N": {k: r8[k] for k in ("cpus", "build_sec", "docs_per_sec", "postings_per_sec", "query_avg_sec")},
        "4N": {k: r32[k] for k in ("cpus", "build_sec", "docs_per_sec", "postings_per_sec", "query_avg_sec")},
        "scaling_efficiency_build": round(eff_build, 3),
        "rank_identical_topk_across_parallelism": rank_identical,
    }
    print(json.dumps(summary, indent=2))
    with open("/root/repo/BENCH.md", "a") as fh:
        fh.write(
            f"\n| {n_docs} | {r8['build_sec']} | {r8['docs_per_sec']} | "
            f"{r32['build_sec']} | {r32['docs_per_sec']} | "
            f"{round(eff_build, 3)} | {rank_identical} |\n"
        )


if __name__ == "__main__":
    main()
