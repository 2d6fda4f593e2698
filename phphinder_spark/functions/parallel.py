"""Input-parallelism guard for per-row compute stages (optimization
guide §2.5, input skew / §4, the Python boundary).

A small corpus often arrives as ONE parquet file under
``spark.sql.files.maxPartitionBytes``, so the scan yields a single input
partition and every map-side stage downstream — Arrow-vectorized
analyzer/signature UDFs in particular — runs on ONE core while the rest
of the cluster idles. ``ensure_min_partitions`` round-robin-repartitions
such inputs up to the session's default parallelism; on real multi-split
inputs (any corpus of scale) the guard is a no-op, so it cannot add a
shuffle at 100 TB.

Determinism: ``repartition(n)`` without keys sorts records locally
before assigning partitions (``spark.sql.execution.sortBeforeRepartition``,
on by default), so retried tasks reproduce the same row placement; the
operators using this guard are row-wise maps + key-grouped aggregations,
whose results are partitioning-independent anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` partitions (default:
    the session's ``sparkContext.defaultParallelism``) iff its current
    plan yields fewer; otherwise return ``df`` unchanged."""
    sc = df.sparkSession.sparkContext
    n_target = int(target or sc.defaultParallelism)
    if n_target <= 1:
        return df
    try:
        n_now = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n_now >= n_target:
        return df
    return df.repartition(n_target)
