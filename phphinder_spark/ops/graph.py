"""Link-graph analytics: PageRank over an edge list.

A crawl pipeline ranks its frontier by link authority — PageRank is
the canonical scorer. This implementation is the standard distributed
power iteration, DataFrame-first:

- ``edges JOIN deg`` once up front (per-source out-degree folded into
  the edge list, cached by the caller if iterating many times);
- each iteration: one contribution join (rank/out-degree shipped to
  the destination), one combining sum by destination, one left join
  back onto the node set — all AQE-splittable shuffle shapes, no
  windows, no driver-side per-node state;
- ``localCheckpoint`` per iteration caps the plan depth at a constant
  (the same discipline as connected_components / train_bpe).

Variant: DANGLING nodes (no out-edges) leak their mass — ranks still
converge and order is preserved for frontier prioritization; the
uniform-redistribution variant needs one extra global aggregate per
iteration and is deliberately not the default (callers who need the
probability-simplex invariant can add the dangling sum themselves).

Engine-exactness: every iteration rounds ranks to a 1e-9 grid, the
same trick the bigram-LM uses for log-probs — distributed float sums
are order-dependent at ~1e-16 relative error, and the grid quantizes
that away so N iterations replay EXACTLY in any engine (the driver
oracle unrolls the same iterations as chained SQL CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    grid: int = 9,
) -> DataFrame:
    """Power-iteration PageRank over ``edges``. Nodes are the union of
    sources and destinations; duplicate edges count once per row
    (a page linking twice contributes twice — the multigraph
    convention). Returns ``(node, rank)`` with rank rounded to the
    1e-``grid`` iteration grid.

    Ranks start uniform at 1/N; per iteration
    ``rank = (1-d)/N + d * sum(in-contribs)`` with contributions
    ``rank_src / out_degree_src``; dangling mass leaks (see module
    docstring)."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_od"))
    ed = e.join(deg, "_s").localCheckpoint(eager=False)
    base = (1.0 - damping) / n
    pr = nodes.withColumn("rank", F.round(F.lit(1.0 / n), grid))
    for _ in range(n_iter):
        contribs = (
            ed.join(pr, ed["_s"] == pr["node"])
            .select(F.col("_d").alias("node"),
                    (F.col("rank") / F.col("_od")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        pr = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("_in", F.lit(0.0)),
                    grid,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return pr
