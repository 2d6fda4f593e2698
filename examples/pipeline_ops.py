"""Training-data-pipeline tour: dedup, similarity search, text analysis
and multimodal stages over the driver-provided tables.

Run:  python examples/pipeline_ops.py  [sf_dir]    (default sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession, functions as F

from phphinder_spark.ops import dedup, multimodal, similarity, textstats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pipeline-ops-tour")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )

    # ---- dedup family
    print("exact dup groups:",
          dedup.exact_duplicates(docs).where("is_dup").count())
    print("minhash-LSH near-dup pairs (j>=0.6):",
          dedup.minhash_lsh_pairs(docs, threshold=0.6).count())
    # pass n_docs when you already know it: the 'auto' scheme pick then
    # costs zero extra jobs (otherwise it counts the cached fingerprints)
    n_docs = docs.count()
    print("simhash pairs (hamming<=6):",
          dedup.simhash_pairs(docs, max_hamming=6, n_docs=n_docs).count())
    print("3-gram jaccard pairs (j>=0.5):",
          dedup.jaccard_pairs(docs, threshold=0.5, shingle_k=3).count())
    # transitive keep/drop: pairs -> connected components -> one keeper
    # per cluster (what the pipeline actually filters on)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.6)
    clusters = dedup.dedup_clusters(docs, pairs)
    print("docs dropped by transitive dedup:",
          clusters.where("is_dup").count())

    # ---- the composed cleaning flow (quality + PII + dedup + decontam)
    from phphinder_spark.ops import pipeline
    from phphinder_spark.ops.textstats import ngram_contamination

    bench = docs.limit(10)   # stand-in for an eval/benchmark corpus
    print("benchmark-contaminated docs:",
          ngram_contamination(docs, bench, n=3).where("contaminated").count())
    kept = pipeline.clean_corpus(
        docs, min_words=20, min_stop_hits=1, benchmark=bench, decontam_n=3
    )
    print("docs surviving the full cleaning pipeline:", kept.count())

    # ---- similarity search
    queries = (emb.orderBy("vec_id").limit(3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    print("exact cosine top-3:",
          similarity.cosine_topk(emb, queries, k=3).count())
    print("SRP-LSH top-3:",
          similarity.srp_lsh_topk(emb, queries, k=3).count())
    print("IVF top-3:",
          similarity.ivf_topk(emb, queries, k=3, n_centroids=16, n_probe=4).count())
    # trained coarse quantizer: spherical k-means once at build time, then
    # the k x dim table drops straight into ivf_topk (commit it as parquet
    # for serving — see scripts/make_ivf_centroid_fixture.py and the
    # ann_ivf_trained driver entry, which oracle-certifies this path)
    cents = similarity.train_centroids(emb, n_centroids=16, n_iter=3)
    print("IVF top-3 (trained centroids):",
          similarity.ivf_topk(emb, queries, k=3, n_probe=4, centroids=cents).count())

    # exact substring-duplication signal (Lee et al. 2021 repeated-span
    # pass): corpus-duplicated word n-gram spans per doc
    print("docs with corpus-duplicated 8-grams:",
          textstats.duplicate_spans(docs, n=8).where("has_dup").count())

    # ---- text analysis
    textstats.token_counts(docs).show(3)
    textstats.quality_scores(docs).show(3)
    textstats.language_id(docs).groupBy("lang_pred").count().show()
    textstats.bpe_token_estimate(docs).agg(F.sum("n_pieces")).show()
    # Gopher-rule quality gate: the filter a pre-training corpus keeps
    gq = textstats.gopher_quality(docs, min_words=20)
    print("gopher-pass fraction:",
          gq.where("gopher_pass").count() / max(gq.count(), 1))

    # span REMOVAL form (cut covered tokens, rebuild the doc)
    removed = textstats.remove_duplicate_spans(docs, n=8)
    print("tokens removed by the span pass:",
          removed.agg(F.sum("n_removed")).collect()[0][0])

    # ---- CCNet paragraph dedup: drop repeated boilerplate paragraphs
    # corpus-wide (keep-first), rebuild the docs
    from phphinder_spark.ops.dedup import dedup_paragraphs

    para_view = docs.select(
        "doc_id", F.regexp_replace("text", r"\bline\b", "\n").alias("text")
    )
    pd_out = dedup_paragraphs(para_view)
    print("paragraphs dropped:",
          pd_out.agg(F.sum(F.col("n_paragraphs") - F.col("n_kept")))
          .collect()[0][0])

    # ---- CCNet-style LM filtering: train a bigram LM on a trusted
    # slice, bucket the corpus by perplexity against it
    from phphinder_spark.ops import lm

    model = lm.train_bigram_lm(docs.where(F.col("doc_id") % 2 == 0))
    scored = lm.score_perplexity(docs, model)
    lm.perplexity_buckets(scored, lo=25.0, hi=32.0).groupBy(
        "bucket"
    ).count().show()

    # ---- surgical decontamination: cut benchmark-overlapping spans
    # instead of dropping contaminated docs whole
    bench_slice = docs.where(F.col("doc_id") % 41 == 0)
    surg = textstats.remove_contaminated_spans(docs, bench_slice, n=3)
    print("tokens cut by decontamination surgery:",
          surg.agg(F.sum("n_removed")).collect()[0][0])

    # ---- DSIR data selection: importance-weight docs toward a target
    # domain (two bigram LMs), take the best-matching head
    lm_target = lm.train_bigram_lm(docs.where(F.col("lang") == "en"))
    lm_raw = lm.train_bigram_lm(docs)
    lm.dsir_select_topk(
        lm.dsir_log_weights(docs, lm_target, lm_raw), 5
    ).show()

    # ---- training batch prep: deterministic mixing + sequence packing
    from phphinder_spark.ops.packing import pack_sequences
    from phphinder_spark.ops.sampling import mixture_sample
    from phphinder_spark.ops.pipeline import prepare_training_corpus

    from phphinder_spark.ops.sampling import temperature_rates

    # alpha-temperature rebalance (mT5/XLM-R): head languages
    # downsampled so kept counts follow n^alpha
    print("temperature rates:", temperature_rates(docs, alpha=0.3))

    mixed = mixture_sample(docs, {"en": 1.0, "de": 0.5}, group_col="lang",
                           default_rate=0.25)
    print("mixture kept:", mixed.count(), "of", docs.count())
    pack_sequences(mixed, 512).orderBy("doc_id").show(3)
    # ...or the whole clean -> mix -> pack flow in one call:
    prepare_training_corpus(
        docs, {"en": 1.0, "de": 0.5}, group_col="lang", max_tokens=512,
        default_rate=0.25, min_words=20, min_stop_hits=1,
    ).show(3)

    # ---- multimodal: decode -> features -> resize
    media = multimodal.synthetic_media(spark, 16)
    multimodal.extract_features(media).select(
        "media_id", "kind", "n_bytes"
    ).show(6)
    multimodal.resize_images(media, 4, 4).where("resized").select(
        "media_id", "mime", "width", "height"
    ).show(3)
    spark.stop()


if __name__ == "__main__":
    main()
