"""Stage-isolated scaling diagnosis for the 8 -> 32 core efficiency gap
(VERDICT r01 #9): which stage of the index build stops scaling?

Measures, in a fresh JVM per (cpus, stage):
  jvm_hash    — pure JVM expression scan (sha2 over content): Spark/JVM
                task-parallelism ceiling, no Python.
  py_passthru — pandas-UDF token count: Arrow + Python-worker ceiling,
                no shuffle.
  postings    — the real analyze -> explode -> groupBy(tf, positions)
                pipeline (shuffle included).
  assign_ids  — deterministic doc_id assignment (bucket windows).

Usage: python scripts/scaling_diag.py [n_docs] [repeats]
Prints one JSON line per (cpus, stage, repeat) then a summary table.
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus, n_docs, stage = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"scalediag-{cpus}-{stage}")
    .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from phphinder_spark.corpus import generate_code_corpus

corpus = generate_code_corpus(spark, n_docs, seed=42, partitions=2 * cpus).cache()
corpus.count()

t0 = time.time()
if stage == "jvm_hash":
    corpus.select(F.sha2("content", 256).alias("h")).agg(
        F.count(F.when(F.col("h").startswith("00"), 1))).collect()
elif stage == "py_passthru":
    import pandas as pd
    @F.pandas_udf("int")
    def ntok(s: pd.Series) -> pd.Series:
        import re
        return s.map(lambda v: len(re.split(r"\W+", v or "")))
    corpus.select(ntok("content").alias("n")).agg(F.sum("n")).collect()
elif stage == "postings":
    from phphinder_spark.index.builder import build_postings, assign_doc_ids
    from phphinder_spark.schema import code_schema
    docs = assign_doc_ids(corpus, ["repo", "path", "commit"])
    build_postings(docs, code_schema()).count()
elif stage == "assign_ids":
    from phphinder_spark.index.builder import assign_doc_ids
    assign_doc_ids(corpus, ["repo", "path", "commit"]).count()
sec = time.time() - t0
print(json.dumps({"cpus": cpus, "stage": stage, "sec": round(sec, 2),
                  "docs_per_sec": round(n_docs / sec, 1)}))
spark.stop()
"""


def run(cpus: int, n_docs: int, stage: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_docs), stage],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    stages = ["jvm_hash", "py_passthru", "assign_ids", "postings"]
    best: dict[tuple, float] = {}
    for _ in range(repeats):
        for stage in stages:
            for cpus in (8, 32):
                r = run(cpus, n_docs, stage)
                print(json.dumps(r), flush=True)
                key = (stage, cpus)
                best[key] = max(best.get(key, 0.0), r["docs_per_sec"])
    summary = {
        stage: {
            "docs_per_sec_8": best[(stage, 8)],
            "docs_per_sec_32": best[(stage, 32)],
            "eff_8_to_32": round(best[(stage, 32)] / (4 * best[(stage, 8)]), 3),
        }
        for stage in stages
    }
    print(json.dumps({"n_docs": n_docs, "summary": summary}, indent=2))


if __name__ == "__main__":
    main()
