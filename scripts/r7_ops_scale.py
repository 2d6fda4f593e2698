"""Scale evidence for the round-7 expansion ops.

Synthesizes the same deterministic multi-paragraph corpus shape as
lm_scale.py (no external data): doc i = N_PARAS paragraphs drawn by
hash from a POOL of distinct paragraphs, so cross-doc line repetition
is real and controllable — the boilerplate scrub has genuine hot keys.

Measures at local[CPUS] (docs/s = n_docs / wall):
  A. remove_boilerplate_lines (string key) — count + kept-line sanity
  B. remove_boilerplate_lines(hash_key=True) — equivalence of the
     aggregate, throughput of the 100-TB form
  C. chunk_documents (64-token windows, stride 48) — chunk count
  D. c4_quality_filter (relaxed punct) — keep count
  E. assign_splits — split histogram (proportions sanity)

Usage: python scripts/r7_ops_scale.py [n_docs] [cpus]
Writes BENCH_r7_ops.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

VOCAB = 10_000
POOL = 50_000  # smaller pool than lm_scale -> hotter boilerplate lines
N_PARAS = 6
PARA_WORDS = 8


def build_spark(cpus):
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r7-ops-scale")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def synth_docs(spark, n_docs):
    pid = lambda p: F.pmod(F.xxhash64(F.col("id") * 31 + F.lit(p)), F.lit(POOL))
    para = lambda p: F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(pid(p) * 17 + F.lit(j)), F.lit(VOCAB)),
            )
            for j in range(PARA_WORDS)
        ],
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", *[para(p) for p in range(N_PARAS)]).alias("text"),
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n_docs)
    docs = docs.localCheckpoint()  # pay synthesis once, measure the ops
    out = {"n_docs": n_docs, "cpus": cpus, "cells": {}}

    from phphinder_spark.ops.dedup import remove_boilerplate_lines
    from phphinder_spark.ops.packing import chunk_documents
    from phphinder_spark.ops.sampling import assign_splits
    from phphinder_spark.ops.textstats import c4_quality_filter

    def cell(name, fn, agg):
        t = time.time()
        res = agg(fn())
        sec = round(time.time() - t, 2)
        out["cells"][name] = {
            "sec": sec,
            "docs_per_sec": round(n_docs / sec),
            "agg": res,
        }
        print(name, out["cells"][name], flush=True)

    # with POOL=50k and ~n_docs*N_PARAS instances, essentially every
    # paragraph appears in >=2 docs at >=1M docs: near-total scrub —
    # the worst case for the rebuild path
    cell(
        "boilerplate_string",
        lambda: remove_boilerplate_lines(docs, 2),
        lambda df: df.agg(
            F.count("*").alias("n"),
            F.sum("n_kept").alias("kept"),
            F.sum("n_lines").alias("lines"),
        ).collect()[0].asDict(),
    )
    cell(
        "boilerplate_hash",
        lambda: remove_boilerplate_lines(docs, 2, hash_key=True),
        lambda df: df.agg(
            F.count("*").alias("n"),
            F.sum("n_kept").alias("kept"),
            F.sum("n_lines").alias("lines"),
        ).collect()[0].asDict(),
    )
    # second interleaved pass: the first string cell also paid codegen
    # warmup; pass 2 is the honest steady-state A/B
    cell(
        "boilerplate_string_p2",
        lambda: remove_boilerplate_lines(docs, 2),
        lambda df: df.agg(
            F.count("*").alias("n"),
            F.sum("n_kept").alias("kept"),
            F.sum("n_lines").alias("lines"),
        ).collect()[0].asDict(),
    )
    cell(
        "boilerplate_hash_p2",
        lambda: remove_boilerplate_lines(docs, 2, hash_key=True),
        lambda df: df.agg(
            F.count("*").alias("n"),
            F.sum("n_kept").alias("kept"),
            F.sum("n_lines").alias("lines"),
        ).collect()[0].asDict(),
    )
    assert (
        out["cells"]["boilerplate_string"]["agg"]
        == out["cells"]["boilerplate_hash"]["agg"]
        == out["cells"]["boilerplate_string_p2"]["agg"]
    ), "hash form diverged from string form"
    cell(
        "chunk_documents_64_48",
        lambda: chunk_documents(docs, 64, stride=48),
        lambda df: {"chunks": df.count()},
    )
    cell(
        "c4_filter",
        lambda: c4_quality_filter(
            docs, min_words_per_line=5, min_lines=2,
            require_terminal_punct=False,
        ),
        lambda df: {"kept": df.where("keep").count()},
    )
    cell(
        "assign_splits",
        lambda: assign_splits(docs, {"train": 0.98, "val": 0.01, "test": 0.01}),
        lambda df: {
            r["split"]: r["count"]
            for r in df.groupBy("split").count().collect()
        },
    )
    # BPE training: the corpus leg is one combining shuffle into the
    # word-frequency table; every round after that is vocabulary-sized
    # (POOL*8 words -> ~VOCAB distinct), so wall should be dominated by
    # the first pass + n_merges small rounds
    from phphinder_spark.ops.textstats import train_bpe

    cell(
        "train_bpe_10_merges",
        lambda: train_bpe(docs, 10),
        lambda df: {"merges": df.count()},
    )

    with open("/root/repo/BENCH_r7_ops.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
