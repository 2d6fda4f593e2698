"""Generate the committed trained-IVF centroid fixture
(tests/fixtures/ivf_centroids_16.parquet).

Runs spherical-k-means (ops/similarity.train_centroids) over the sf0.01
embeddings table and commits the resulting k x dim centroid table as
parquet. The fixture makes the TRAINED IVF path value-level
oracle-certifiable: training happens once, here; the driver entry
(`ann_ivf_trained`) and its DuckDB oracle both read the SAME committed
literals, so the floating-point-sum-order caveat of distributed k-means
(cell means depend on partition order) never reaches the oracle — the
same pattern as tests/fixtures/stem_map_en.parquet for the stemmer chain.

Usage: python scripts/make_ivf_centroid_fixture.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/tests/fixtures/ivf_centroids_16.parquet"
SRC = "/root/testdata/sf0.01/embeddings.parquet"
N_CENTROIDS = 16
N_ITER = 4


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-ivf-centroid-fixture")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow as pa
    import pyarrow.parquet as pq

    from phphinder_spark.ops.similarity import train_centroids

    emb = spark.read.parquet(SRC).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cents = train_centroids(emb, n_centroids=N_CENTROIDS, n_iter=N_ITER)
    # single plain parquet FILE (pyarrow, like the stem_map fixture) so the
    # DuckDB oracle's read_parquet('<path>') resolves without a glob
    table = pa.table(
        {
            "cid": pa.array([c for c, _ in cents], pa.int64()),
            "centv": pa.array([v for _, v in cents], pa.list_(pa.float64())),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    dims = {len(v) for _, v in cents}
    print(
        f"wrote {len(cents)} centroids (dims={sorted(dims)}) "
        f"from {SRC} -> {OUT} ({os.path.getsize(OUT)} bytes)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
