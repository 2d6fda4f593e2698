"""A/B the pack_sequences distributed prefix scan against the naive
unpartitioned-window cumsum at multi-million-row scale.

The naive formulation (``sum().over(Window.orderBy(id))``) is the shape
most SQL users would write first; Spark executes it by moving EVERY row
into one task. This script measures both on the same synthetic
(doc_id, n_tokens) frame — doc counts where the single-task sort still
*completes* locally, so the gap is measurable rather than an OOM story —
and checks the outputs are identical.

Usage: python scripts/pack_scale.py [n_docs ...]   (default 10M 50M)
Writes one JSON line per n_docs; aggregate goes to BENCH_pack.json via
the caller (see BENCH.md round-6 section).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window, functions as F

from phphinder_spark.ops.packing import pack_sequences

MAX_TOKENS = 2048


def synth(spark, n_docs):
    # deterministic synthetic doc-length table: lengths 16..1039, varied
    # by a hash so ranges aren't degenerate
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1024)) + 16).alias("n_tokens"),
    )


def naive_pack(df, max_tokens):
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return df.select(
        "doc_id",
        "n_tokens",
        F.floor(start / max_tokens).cast("long").alias("seq_id"),
        (start % max_tokens).cast("long").alias("seq_offset"),
    )


def checksum(df):
    # order-insensitive value fingerprint + row count in one pass
    row = df.agg(
        F.count("*").alias("n"),
        F.expr(
            "bit_xor(xxhash64(doc_id, n_tokens, seq_id, seq_offset))"
        ).alias("h"),
    ).collect()[0]
    return row.n, row.h


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [10_000_000, 50_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        base = synth(spark, n).localCheckpoint(eager=True)  # exclude gen cost
        t0 = time.time()
        n_dist, h_dist = checksum(pack_sequences(base, MAX_TOKENS, tokens_col_name="n_tokens"))
        t_dist = time.time() - t0
        t0 = time.time()
        n_naive, h_naive = checksum(naive_pack(base, MAX_TOKENS))
        t_naive = time.time() - t0
        base.unpersist()
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "scan_sec": round(t_dist, 2),
                    "naive_window_sec": round(t_naive, 2),
                    "speedup": round(t_naive / t_dist, 2),
                    "identical": (n_dist, h_dist) == (n_naive, h_naive),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
