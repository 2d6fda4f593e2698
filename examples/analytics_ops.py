"""Analytics tour: event-log reductions, crawl-frontier URL ops,
embedding linear algebra, and link-graph ranking over the
driver-provided tables.

Run:  python examples/analytics_ops.py  [sf_dir]    (default sf0.001)
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import SparkSession, functions as F

from phphinder_spark.ops import events as ev_ops
from phphinder_spark.ops import linalg, web
from phphinder_spark.ops.graph import pagerank
from phphinder_spark.ops.similarity import (
    assign_centroids,
    train_centroids,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("analytics-ops-tour")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    print("== sessionization (30-min gap) ==")
    st = ev_ops.session_stats(ev, gap_minutes=30.0)
    st.orderBy(F.desc("n_events")).show(5, truncate=False)
    print("hot-key-safe form agrees:",
          ev_ops.session_stats(ev, gap_minutes=30.0,
                               hot_bucket_minutes=120.0).count()
          == st.count())

    print("== funnel view -> click -> commit ==")
    ev_ops.funnel(ev, ["view", "click", "commit"]).groupBy(
        "steps_completed"
    ).count().orderBy("steps_completed").show()

    print("== daily retention cohorts (first 5 cells) ==")
    ev_ops.retention_cohorts(ev, cohort_minutes=1440.0).orderBy(
        "cohort_start_us", "period_offset"
    ).show(5)

    print("== URL canonicalization + first-seen dedup ==")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Site"), (d % 7).cast("string"),
            F.lit(".Example.com:80/p/"), (d % 40).cast("string"),
            F.when(d % 2 == 0, F.lit("/?utm_source=x&b=2&a=1"))
            .otherwise(F.lit("?a=1&b=2")),
        ).alias("url"),
    )
    dd = web.url_dedup(urls)
    print("frontier:", dd.count(), "kept:", dd.where("keep").count(),
          "(hash_key=True for the 100-TB form)")
    web.domain_stats(urls).show(3, truncate=False)

    print("== embedding PCA (train + map-side projection) ==")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = linalg.pca_train(emb, k=4)
    print("explained variance:", [round(v, 4)
                                  for v in model.explained_variance])
    linalg.pca_project(emb, model).show(4)

    print("== grid-quantized k-means (partition-invariant training) ==")
    cents = train_centroids(emb, n_centroids=8, n_iter=2, grid=9)
    assign_centroids(emb, cents).groupBy("cid").count().orderBy(
        "cid"
    ).show()

    print("== PageRank over a synthesized link graph ==")
    n = docs.count()
    edges = docs.where(d % 11 != 0).select(
        d.alias("src"),
        F.explode(F.array((d * 7 + 1) % n, (d * 13 + 2) % n)).alias("dst"),
    )
    pagerank(edges, n_iter=5).orderBy(F.desc("rank")).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
