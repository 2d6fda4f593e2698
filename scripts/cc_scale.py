"""Connected-components depth + scale evidence (round-5 verdict #2).

Two measurements, written to BENCH_cc.json (+ a BENCH.md section):

A. Operator-level adversarial depth: chain graphs (the worst case for
   min-label propagation, whose rounds grow with component DIAMETER)
   at millions of nodes/edges. Shows label-prop failing its round budget
   on diameter-4096 chains while the large/small-star alternation
   (Kiveris et al.) converges in ~log(diameter) rounds, plus the shallow
   LSH-star-shaped contrast where label-prop wins in 1-2 rounds —
   motivating the 'auto' policy dedup_clusters ships with.

B. End-to-end >=1M-doc dedup with chain-shaped near-dup clusters:
   sliding-window documents (doc i of a chain shares tokens with
   neighbors up to distance ~3 at jaccard >= 0.5, per-chain disjoint
   vocabulary so clusters are exactly the chains) -> minhash-LSH pairs
   -> dedup_clusters(algorithm='auto'). Reports pair counts, CC rounds,
   per-round wall, phase wall-clock, and cluster-shape sanity
   (n_clusters, max cluster size vs the constructed chain length).

C. Composed cleaning pipeline (gopher ∧ PII ∧ transitive dedup ∧
   benchmark decontamination) over the SAME >=1M corpus — the end-to-end
   number a training-data user asks for (round-5 verdict #7). Reports
   the per-stage split (each stage timed standalone) plus the composed
   single-plan wall-clock.

Usage: python scripts/cc_scale.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def build_spark(cpus: int = 32):
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cc-scale")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def chain_edges_simple(spark, n_chains: int, length: int):
    """n_chains disjoint path graphs, each of the given length (diameter
    length-1); node id = chain * length + pos, edge (id, id+1) for
    pos < length-1 — dense ids, uniform edge keys."""
    return (
        spark.range(n_chains * length)
        .withColumn("pos", F.col("id") % length)
        .where(F.col("pos") < length - 1)
        .select(F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id"))
    )


def star_edges(spark, n_stars: int, size: int):
    # shallow LSH-shaped clusters: center = star * size, leaves attach
    return (
        spark.range(n_stars * size)
        .withColumn("pos", F.col("id") % size)
        .where(F.col("pos") > 0)
        .select(
            (F.col("id") - F.col("pos")).alias("a_id"),
            F.col("id").alias("b_id"),
        )
    )


def run_cc(edges, algorithm, max_iter=60, switch_after=5):
    from phphinder_spark.ops.dedup import connected_components

    m = {}
    t0 = time.time()
    try:
        out = connected_components(
            edges, max_iter=max_iter, algorithm=algorithm,
            switch_after=switch_after, metrics=m,
        )
        n_nodes = out.count()
        n_clusters = out.select("cluster_id").distinct().count()
        status = "converged"
    except RuntimeError as e:
        n_nodes = n_clusters = None
        status = f"did-not-converge (cap {max_iter})"
    wall = round(time.time() - t0, 2)
    return {
        "algorithm": algorithm,
        "status": status,
        "wall_sec": wall,
        "label_rounds": m.get("label_rounds", 0),
        "star_rounds": m.get("star_rounds", 0),
        "round_secs": m.get("round_secs", []),
        "n_nodes": n_nodes,
        "n_clusters": n_clusters,
    }


def chain_docs(spark, n_chains: int, length: int, n_singletons: int):
    """Sliding-window chain documents: doc (chain j, pos i) = 20 tokens
    'c{j}_{2i+k}' (k=0..19) — stride 2, so jaccard(i, i+d) over
    3-shingles is ~0.8 / 0.64 / 0.5 / <0.4 for d=1..4: near-dup edges
    reach distance <=3, the cluster is exactly the chain (disjoint
    per-chain vocabulary), and the component diameter is ~length/3."""
    base = (
        spark.range(n_chains * length)
        .withColumn("chain", (F.col("id") / length).cast("long"))
        .withColumn("pos", F.col("id") % length)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(19)),
                    lambda k: F.concat(
                        F.lit("c"),
                        F.col("chain"),
                        F.lit("_"),
                        (F.col("pos") * 2 + k),
                    ),
                ),
            ).alias("text"),
        )
    )
    singles = (
        spark.range(n_singletons)
        .select(
            (F.col("id") + n_chains * length).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(19)),
                    lambda k: F.concat(F.lit("s"), F.col("id"), F.lit("_"), k),
                ),
            ).alias("text"),
        )
    )
    return base.unionByName(singles)


def main() -> None:
    quick = "--quick" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cpus": cpus, "quick": quick}

    # ---- A: adversarial chain graphs ------------------------------------
    n_chains, length = (50, 512) if quick else (1000, 4096)
    edges = chain_edges_simple(spark, n_chains, length).cache()
    n_edges = edges.count()
    a = {
        "n_chains": n_chains,
        "chain_length": length,
        "n_edges": n_edges,
        "runs": [],
    }
    # label-prop with a practical cap: must NOT converge on deep chains
    a["runs"].append(run_cc(edges, "label", max_iter=30))
    a["runs"].append(run_cc(edges, "star", max_iter=40))
    a["runs"].append(run_cc(edges, "auto", max_iter=40, switch_after=5))
    edges.unpersist()

    # shallow contrast: star graphs ~ LSH cluster shape
    s_stars, s_size = (2000, 5) if quick else (200_000, 5)
    sedges = star_edges(spark, s_stars, s_size).cache()
    s_edges_n = sedges.count()
    shallow = {
        "n_stars": s_stars,
        "star_size": s_size,
        "n_edges": s_edges_n,
        "runs": [
            run_cc(sedges, "label", max_iter=10),
            run_cc(sedges, "auto", max_iter=10),
        ],
    }
    sedges.unpersist()
    out["A_chain_graphs"] = a
    out["A_shallow_stars"] = shallow

    # ---- B: end-to-end 1M-doc chained dedup -----------------------------
    from phphinder_spark.ops.dedup import dedup_clusters, minhash_lsh_pairs

    b_chains, b_len, b_single = (20, 200, 1000) if quick else (990, 1000, 10_000)
    docs = chain_docs(spark, b_chains, b_len, b_single).cache()
    n_docs = docs.count()
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, "text", threshold=0.5).cache()
    n_pairs = pairs.count()
    t_pairs = round(time.time() - t0, 2)

    m = {}
    from phphinder_spark.ops.dedup import connected_components

    t1 = time.time()
    comp = connected_components(pairs, metrics=m)
    comp = comp.cache()
    comp.count()
    t_cc = round(time.time() - t1, 2)

    t2 = time.time()
    clusters = dedup_clusters(docs, pairs)
    agg = clusters.groupBy("cluster_id").count().agg(
        F.count("*").alias("n_clusters"),
        F.max("count").alias("max_cluster"),
        F.sum(F.when(F.col("count") == 1, 1).otherwise(0)).alias("singletons"),
    ).collect()[0]
    t_full = round(time.time() - t2, 2)
    out["B_e2e_1m_chained_dedup"] = {
        "n_docs": n_docs,
        "n_chains": b_chains,
        "chain_length": b_len,
        "n_singleton_docs": b_single,
        "n_pairs": n_pairs,
        "pairs_sec": t_pairs,
        "cc_sec": t_cc,
        "cc_label_rounds": m.get("label_rounds"),
        "cc_star_rounds": m.get("star_rounds"),
        "cc_round_secs": m.get("round_secs"),
        "cluster_assign_sec": t_full,
        "n_clusters": int(agg["n_clusters"]),
        "max_cluster_size": int(agg["max_cluster"]),
        "singleton_clusters": int(agg["singletons"]),
    }

    # ---- C: composed cleaning pipeline over the same corpus -------------
    from phphinder_spark.ops import pipeline
    from phphinder_spark.ops.textstats import (
        gopher_quality,
        ngram_contamination,
        pii_scrub,
    )

    # eval-suite stand-in: ~1/10k of the corpus (deterministic id stride);
    # its 8-grams contaminate the sampled docs plus their chain neighbors
    bench_df = docs.where(F.col("doc_id") % 9973 == 0)
    n_bench = bench_df.count()
    # chain docs are 20 synthetic tokens with no English stopwords: gate on
    # length only so the quality leg passes the corpus instead of zeroing it
    gate = {"min_words": 10, "min_stop_hits": 0}
    stages = {}
    t = time.time()
    n_gopher = gopher_quality(docs, **gate).where("gopher_pass").count()
    stages["gopher_sec"] = round(time.time() - t, 2)
    t = time.time()
    pii_scrub(docs).count()
    stages["pii_sec"] = round(time.time() - t, 2)
    t = time.time()
    n_contam = ngram_contamination(docs, bench_df, n=8).where("contaminated").count()
    stages["decontam_sec"] = round(time.time() - t, 2)
    # dedup stages measured in B over the same corpus: pairs_sec / cc_sec /
    # cluster_assign_sec
    t = time.time()
    kept = pipeline.clean_corpus(
        docs, jaccard_threshold=0.5, benchmark=bench_df, decontam_n=8, **gate
    )
    n_kept = kept.count()
    stages["composed_e2e_sec"] = round(time.time() - t, 2)
    out["C_composed_pipeline_1m"] = {
        "n_docs": n_docs,
        "n_benchmark_docs": n_bench,
        "n_gopher_pass": n_gopher,
        "n_contaminated": n_contam,
        "n_kept": n_kept,
        "stage_split": {
            "pairs_sec": t_pairs,
            "cc_sec": t_cc,
            "cluster_assign_sec": t_full,
            **stages,
        },
    }
    docs.unpersist()
    pairs.unpersist()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_cc.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
