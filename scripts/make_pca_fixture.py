"""Write the committed PCA fixture for the emb_pca_project driver
entry: k=8 components (+ the mean as row k=-1) trained on the sf0.01
embeddings table via ops/linalg.pca_train. Committing the artifact
(like tests/fixtures/ivf_centroids_16.parquet) makes the projection
entry a pure function of (fixture, table) — float-order noise in
training can never move the certified values.

Usage: python scripts/make_pca_fixture.py
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

OUT = "/root/repo/tests/fixtures/pca_components_8.parquet"


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from phphinder_spark.ops.linalg import pca_train

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    model = pca_train(emb, col="embedding", k=8)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(-1, list(model.mean))] + [
        (k, list(c)) for k, c in enumerate(model.components)
    ]
    table = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "compv": pa.array(
                [r[1] for r in rows], pa.list_(pa.float64())
            ),
        }
    )
    pq.write_table(table, OUT)  # single FILE, like the other fixtures
    print("wrote", OUT, "explained:", model.explained_variance)
    spark.stop()


if __name__ == "__main__":
    main()
