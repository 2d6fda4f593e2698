"""Scale evidence for the round-6 LM family + paragraph dedup.

Synthesizes a deterministic >=1M-doc corpus (no external data): each doc
is `n_paras` paragraphs of `para_words` words; paragraphs are drawn by
hash from a pool of `pool` distinct paragraph ids whose text derives
from the id, so paragraph-level duplication is real and controllable
(~n_docs*n_paras instances over `pool` distinct paragraphs). Words come
from a `vocab`-sized hash vocabulary, so the bigram LM sees a realistic
Zipf-less but wide key space.

Measures, at local[CPUS]:
  A. train_bigram_lm over the 1M corpus (force via count of the LM)
  B. score_perplexity of the full corpus against that LM (count)
  C. dedup_paragraphs over the same corpus (count + aggregate sanity)
  D. the A+B composite at a second parallelism level (local[8] by
     default) for a scaling-efficiency line on the new ops — same
     input, same code, throughput ratio.

Usage: python scripts/lm_scale.py [n_docs] [--quick]
Writes BENCH_lm.json at the repo root.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

VOCAB = 10_000
POOL = 200_000
N_PARAS = 5
PARA_WORDS = 8


def build_spark(cpus):
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lm-scale")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def synth_docs(spark, n_docs):
    """Deterministic corpus: doc i = N_PARAS paragraphs; paragraph p of
    doc i is pool-id pmod(xxhash64(i*31+p), POOL); paragraph text = 8
    words w<pmod(xxhash64(pid*17+j), VOCAB)>."""
    pid = lambda p: F.pmod(
        F.xxhash64(F.col("id") * 31 + F.lit(p)), F.lit(POOL)
    )
    para = lambda p: F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(pid(p) * 17 + F.lit(j)), F.lit(VOCAB)
                ).cast("string"),
            )
            for j in range(PARA_WORDS)
        ],
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", *[para(p) for p in range(N_PARAS)]).alias("text"),
    )


def run_lm(spark, n_docs):
    from phphinder_spark.ops import lm

    # warmup: compile the train/score plan shapes on a 1k slice so the
    # timed passes measure the operators, not codegen
    w = synth_docs(spark, 1000)
    wm = lm.train_bigram_lm(w).localCheckpoint()
    lm.score_perplexity(w, wm).agg(F.sum("nll_total")).collect()

    docs = synth_docs(spark, n_docs)
    t = time.time()
    model = lm.train_bigram_lm(docs.where(F.col("doc_id") % 2 == 0))
    model = model.localCheckpoint()  # materialize the artifact once
    train_sec = time.time() - t

    def timed_score(broadcast_lm):
        t = time.time()
        # aggregate over nll_total forces the full score computation (a
        # bare count() lets Catalyst eliminate the unique-keyed left join)
        row = (
            lm.score_perplexity(docs, model, broadcast_lm=broadcast_lm)
            .agg(
                F.count("*").alias("n"),
                F.sum("nll_total").alias("s"),
            )
            .collect()[0]
        )
        assert row.s is not None
        return time.time() - t, row.n, float(row.s)

    # interleaved passes (shuffle, broadcast, shuffle, broadcast) so a
    # host-load drift hits both strategies equally; report medians
    shuf, bc = [], []
    for _ in range(2):
        s_sec, n, s_shuffle = timed_score(False)
        b_sec, _, s_bc = timed_score(True)
        shuf.append(s_sec)
        bc.append(b_sec)
        # same pre-rounded terms either way; association order may differ
        assert abs(s_shuffle - s_bc) < 1e-3 * max(abs(s_shuffle), 1.0)
    score_sec = sorted(shuf)[len(shuf) // 2]
    score_bc_sec = sorted(bc)[len(bc) // 2]
    return train_sec, score_sec, score_bc_sec, n


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    n_docs = int(float(args[0])) if args else (100_000 if quick else 1_000_000)
    out = {"n_docs": n_docs, "vocab": VOCAB, "pool": POOL}

    spark = build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    train32, score32, score_bc32, n_scored = run_lm(spark, n_docs)
    out["train_sec_c32"] = round(train32, 2)
    out["score_sec_c32"] = round(score32, 2)
    out["score_broadcast_sec_c32"] = round(score_bc32, 2)
    assert n_scored == n_docs

    from phphinder_spark.ops.dedup import dedup_paragraphs

    docs = synth_docs(spark, n_docs)
    t = time.time()
    agg = dedup_paragraphs(docs).agg(
        F.sum("n_paragraphs").alias("np"), F.sum("n_kept").alias("nk")
    ).collect()[0]
    out["dedup_paragraphs_sec_c32"] = round(time.time() - t, 2)
    out["paragraph_instances"] = int(agg.np)
    out["paragraphs_kept"] = int(agg.nk)

    # hash_key=True — the 100-TB form (xxhash64 longs in the shuffles,
    # map-side rebuild); aggregate must agree with the string form
    t = time.time()
    agg_h = dedup_paragraphs(docs, hash_key=True).agg(
        F.sum("n_paragraphs").alias("np"), F.sum("n_kept").alias("nk")
    ).collect()[0]
    out["dedup_paragraphs_hash_sec_c32"] = round(time.time() - t, 2)
    assert (int(agg_h.np), int(agg_h.nk)) == (int(agg.np), int(agg.nk))
    spark.stop()

    # second parallelism level for the scaling line
    spark = build_spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    train8, score8, score_bc8, _ = run_lm(spark, n_docs)
    out["train_sec_c8"] = round(train8, 2)
    out["score_sec_c8"] = round(score8, 2)
    out["score_broadcast_sec_c8"] = round(score_bc8, 2)
    spark.stop()

    # efficiency of the train+score composite going 8 -> 32 cores, on
    # the DEFAULT (shuffle) scoring path; the broadcast cells are
    # reported alongside — on one shared-memory box the 32-thread
    # hash-probe is bandwidth-bound, so its 8->32 line under-reports
    # what separate executors would do
    t8, t32 = train8 + score8, train32 + score32
    out["lm_scaling_efficiency_8to32"] = round((t8 / t32) / 4.0, 3)

    with open("/root/repo/BENCH_lm.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
