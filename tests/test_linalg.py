"""Tests for ops/linalg.py (tree-aggregated moments, covariance, PCA)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops.linalg import (
    PCAModel,
    covariance,
    pca_project,
    pca_train,
)

D = 6


def _rows(n, seed=7, d=D):
    rng = np.random.RandomState(seed)
    # anisotropic data so PCA has a meaningful axis order
    scales = np.linspace(3.0, 0.2, d)
    x = rng.randn(n, d) * scales + rng.randn(d)
    return x


@pytest.fixture()
def emb(spark):
    x = _rows(300)
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ), x


def test_covariance_matches_numpy(emb):
    df, x = emb
    got = {(r.i, r.j): r.cov for r in covariance(df).collect()}
    want = np.cov(x, rowvar=False, ddof=0)
    assert len(got) == D * D
    for i in range(D):
        for j in range(D):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=2e-6)


def test_pca_train_matches_numpy_eigh(emb):
    df, x = emb
    model = pca_train(df, k=3)
    c = np.cov(x, rowvar=False, ddof=0)
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1][:3]
    for k, idx in enumerate(order):
        ref = v[:, idx]
        if ref[int(np.argmax(np.abs(ref)))] < 0:
            ref = -ref
        assert np.allclose(model.components[k], ref, atol=1e-9)
        assert model.explained_variance[k] == pytest.approx(w[idx])
    assert np.allclose(model.mean, x.mean(axis=0), atol=1e-9)
    # variance-descending and orthonormal
    ev = model.explained_variance
    assert list(ev) == sorted(ev, reverse=True)
    comp = np.array(model.components)
    assert np.allclose(comp @ comp.T, np.eye(3), atol=1e-9)


def test_pca_project_matches_numpy(emb):
    df, x = emb
    model = pca_train(df, k=2)
    got = {
        (r.vec_id, r.k): r.proj for r in pca_project(df, model).collect()
    }
    want = (x - x.mean(axis=0)) @ np.array(model.components).T
    assert len(got) == 300 * 2
    for i in range(300):
        for k in range(2):
            assert got[(i, k)] == pytest.approx(want[i, k], abs=2e-6)


def test_pca_project_plan_map_only(emb):
    df, _ = emb
    model = PCAModel(
        mean=tuple(0.0 for _ in range(D)),
        components=(tuple(1.0 if i == 0 else 0.0 for i in range(D)),),
        explained_variance=(1.0,),
    )
    plan = (
        pca_project(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_moments_mixed_dims_strict_by_default(spark):
    rows = [
        (0, [1.0, 2.0]),
        (1, None),
        (2, [3.0]),          # deviant dim
        (3, [3.0, 6.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # default: loud failure instead of silently computing over a subset
    with pytest.raises(ValueError, match="do not have dim 2"):
        covariance(df, dim=2)
    # explicit opt-in: NULLs and wrong-dim rows are excluded
    got = {
        (r.i, r.j): r.cov
        for r in covariance(df, dim=2, allow_mixed_dims=True).collect()
    }
    want = np.cov(np.array([[1.0, 2.0], [3.0, 6.0]]), rowvar=False, ddof=0)
    for i in range(2):
        for j in range(2):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=2e-6)
    # the deviant-FIRST-row trap: inferred dim would be 1 and cover a
    # single vector — the guard turns that into an error, not a result
    bad_first = spark.createDataFrame(
        [(0, [9.9]), (1, [1.0, 2.0]), (2, [3.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="do not have dim 1"):
        covariance(bad_first)


def test_pca_project_excludes_malformed_rows(spark):
    model = PCAModel(
        mean=(0.0, 0.0), components=((1.0, 0.0),),
        explained_variance=(1.0,),
    )
    df = spark.createDataFrame(
        [(0, [5.0, 1.0]), (1, None), (2, [7.0]), (3, [2.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {(r.vec_id, r.k): r.proj for r in pca_project(df, model).collect()}
    assert got == {(0, 0): 5.0, (3, 0): 2.0}  # rows 1, 2 excluded


def test_pca_train_k_bounds(emb):
    df, _ = emb
    with pytest.raises(ValueError):
        pca_train(df, k=0)
    with pytest.raises(ValueError):
        pca_train(df, k=D + 1)


def test_train_centroids_grid_partition_invariant(spark):
    """grid=N makes k-means training a pure function of the DATA:
    identical centroids under different physical partitionings (the
    float-sum-order sensitivity the docstring warns about for
    grid=None)."""
    from phphinder_spark.ops.similarity import train_centroids

    x = _rows(120, seed=3, d=8)
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(x)]
    a = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(2)
    b = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(13, "vec_id")
    ca = train_centroids(a, n_centroids=4, n_iter=3, grid=9)
    cb = train_centroids(b, n_centroids=4, n_iter=3, grid=9)
    assert ca == cb
