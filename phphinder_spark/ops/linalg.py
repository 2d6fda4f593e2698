"""Distributed linear algebra over embedding columns.

The workhorse is the classic tall-skinny pattern: for an (N x d)
embedding matrix with huge N and small d (64-1024), every second-order
statistic reduces to ONE distributed pass producing d- and d^2-sized
partial sums (Arrow-batched numpy ``X^T X`` per batch — BLAS-speed,
the legitimate Python step), combined by a single Spark aggregate into
a d x d matrix that fits on the driver. Eigen-decomposition then runs
driver-side (numpy, micro-seconds at these d), and PROJECTION goes
back to the executors as literal column expressions — zero Python in
the projection path, no shuffle at all.

This is the embedding-side complement of ``ops/similarity.py``'s IVF
training: PCA whitening/reduction before clustering or SemDeDup is a
standard step of embedding-based corpus pipelines (and the projection
output feeds ``ann_topk``/``semantic_dedup`` unchanged).

Scale notes (100 TB): the moments pass streams Arrow batches (no
per-row Python), emits one (1 + d + d^2) vector per batch, and the
combine is a combining groupBy over position — map-side partials, d^2
rows total. Nothing corpus-sized ever reaches the driver; the collect
is exactly d^2 + d + 1 doubles. Float summation order varies with
partitioning (as with every distributed float sum); downstream
consumers quantize (round 6) exactly like the LM/divergence ops."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class PCAModel:
    """Driver-side PCA artifact: ``mean`` (length d), ``components``
    (k rows x d, orthonormal, variance-descending), and the matching
    ``explained_variance`` eigenvalues. Signs are canonical: each
    component's largest-|weight| entry is positive, so retraining on
    the same data reproduces the same artifact up to float noise."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    explained_variance: tuple[float, ...]


def _moments(df: DataFrame, col: str, dim: int, count_nonnull: bool = False):
    """One distributed pass -> (n, sum vector, gram matrix[, total]) as
    numpy.

    Per Arrow batch: numpy float64 ``X.sum(0)`` and ``X.T @ X``,
    flattened into a single (2 + d + d*d) vector; ONE combining
    position aggregate merges all batches; the driver reassembles.

    ``count_nonnull=True`` additionally counts every non-null row —
    whatever its length — INSIDE the same pass (slot 0 of the partial
    vector), so the dim-coverage validation does not need a second full
    corpus scan (it previously doubled the reads of every covariance /
    pca_train call). With it False the ``size == dim`` filter stays in
    the plan, pushed ahead of the Arrow transfer."""
    import numpy as np

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            total = float(len(pdf))
            if count_nonnull:
                lens = pdf[col].map(len)
                matching = pdf[col][lens == dim]
            else:
                matching = pdf[col]
            if len(matching):
                x = np.array(matching.tolist(), dtype=np.float64)
                if x.ndim != 2 or x.shape[1] != dim:
                    raise ValueError(
                        f"expected fixed dim {dim}, got shape {x.shape}"
                    )
                vec = np.concatenate(
                    ([total, float(len(x))], x.sum(axis=0), (x.T @ x).ravel())
                )
            else:
                vec = np.zeros(2 + dim + dim * dim)
                vec[0] = total
            yield pd.DataFrame({"m": [vec.tolist()]})

    src = df.select(F.col(col).alias(col)).where(F.col(col).isNotNull())
    if not count_nonnull:
        src = src.where(F.size(col) == dim)
    parts = src.mapInPandas(part, schema="m array<double>")
    rows = (
        parts.select(F.posexplode("m"))
        .groupBy("pos")
        .agg(F.sum("col").alias("v"))
        .collect()
    )
    flat = np.zeros(2 + dim + dim * dim)
    for r in rows:
        flat[r["pos"]] = r["v"]
    total, n = flat[0], flat[1]
    if n == 0:
        raise ValueError("no rows with the expected embedding dim")
    return n, flat[2 : 2 + dim], flat[2 + dim :].reshape(dim, dim), total


def _infer_dim(df: DataFrame, col: str) -> int:
    row = df.where(F.col(col).isNotNull()).select(F.size(col)).first()
    if row is None:
        raise ValueError("empty embedding column")
    return int(row[0])


def _check_coverage(dim: int, n: float, total: float) -> None:
    """Fail loudly when the size==dim guard excluded rows: a deviant
    first row would otherwise make _infer_dim pick the wrong dim and
    the statistics silently cover a tiny subset. ``total`` (the
    non-null row count) comes out of the SAME moments pass as ``n`` —
    no second corpus scan."""
    if int(n) != int(total):
        raise ValueError(
            f"{int(total) - int(n)} of {int(total)} non-null rows do not "
            f"have dim {dim}; pass an explicit dim= (and "
            f"allow_mixed_dims=True to compute over the matching "
            f"subset anyway)"
        )


def covariance(
    df: DataFrame, col: str = "embedding", dim: int | None = None,
    allow_mixed_dims: bool = False,
) -> DataFrame:
    """Population covariance matrix of the embedding column as a long
    DataFrame ``(i, j, cov)`` (d^2 rows, cov rounded to 1e-6 — the
    engine-exactness grid every cross-engine float op here uses).
    Computed as ``G/n - mu mu^T`` from the single moments pass; the
    returned frame is driver-built (d^2 rows) so downstream joins
    against it broadcast for free."""
    dim = dim or _infer_dim(df, col)
    n, s, g, total = _moments(
        df, col, dim, count_nonnull=not allow_mixed_dims
    )
    if not allow_mixed_dims:
        _check_coverage(dim, n, total)
    mu = s / n
    import numpy as np

    c = g / n - np.outer(mu, mu)
    rows = [
        (i, j, round(float(c[i, j]), 6))
        for i in range(dim)
        for j in range(dim)
    ]
    return df.sparkSession.createDataFrame(
        rows, "i long, j long, cov double"
    )


def pca_train(
    df: DataFrame, col: str = "embedding", k: int = 8,
    dim: int | None = None, allow_mixed_dims: bool = False,
) -> PCAModel:
    """Fit PCA: one distributed moments pass + driver-side ``eigh`` of
    the d x d covariance. Returns the top-``k`` variance-descending
    components with canonical signs (largest-|weight| entry positive;
    eigenvalue ties broken by ``eigh``'s deterministic output order)."""
    import numpy as np

    dim = dim or _infer_dim(df, col)
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}]")
    n, s, g, total = _moments(
        df, col, dim, count_nonnull=not allow_mixed_dims
    )
    if not allow_mixed_dims:
        _check_coverage(dim, n, total)
    mu = s / n
    c = g / n - np.outer(mu, mu)
    w, v = np.linalg.eigh((c + c.T) / 2.0)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        vec = v[:, idx]
        if vec[int(np.argmax(np.abs(vec)))] < 0:
            vec = -vec
        comps.append(tuple(float(x) for x in vec))
    return PCAModel(
        mean=tuple(float(x) for x in mu),
        components=tuple(comps),
        explained_variance=tuple(float(w[i]) for i in order),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project embeddings onto the model's components. Output is long
    form ``(id_col, k, proj)`` with proj rounded to 1e-6 (the row-local
    fold is a fixed left-to-right sum, deterministic per row).

    Scale: components and mean fold into LITERAL arrays — the whole
    projection is one map-side codegen projection + posexplode; no
    Python, no shuffle, no join.

    Rows whose embedding is NULL or whose length differs from the
    model's dim are EXCLUDED — same rule as training (zip_with would
    otherwise pad with NULLs and emit proj=NULL rows that poison
    downstream ann/semantic-dedup joins with no signal)."""
    dim = len(model.mean)
    df = df.where(F.col(col).isNotNull() & (F.size(col) == dim))
    centered = F.zip_with(
        F.col(col).cast("array<double>"),
        F.lit([float(m) for m in model.mean]),
        lambda x, m: x - m,
    )
    projs = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        centered,
                        F.lit([float(w) for w in comp]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            for comp in model.components
        ]
    )
    return df.select(F.col(id_col), F.posexplode(projs)).select(
        F.col(id_col),
        F.col("pos").cast("long").alias("k"),
        F.col("col").alias("proj"),
    )
