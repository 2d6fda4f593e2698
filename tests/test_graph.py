"""Tests for ops/graph.pagerank against a plain-Python reference."""

import pytest

from phphinder_spark.ops.graph import pagerank


def _ref_pagerank(edges, n_iter, damping=0.85, grid=9):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    pr = {v: round(1.0 / n, grid) for v in nodes}
    for _ in range(n_iter):
        incoming = {v: 0.0 for v in nodes}
        for s, d in edges:
            incoming[d] += pr[s] / od[s]
        pr = {
            v: round((1 - damping) / n + damping * incoming[v], grid)
            for v in nodes
        }
    return pr


def _run(spark, edges, n_iter, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, n_iter=n_iter, **kw).collect()}


def test_star_graph_golden(spark):
    # 1..4 all link to 0; 0 links to 1. Hub 0 must dominate.
    edges = [(i, 0) for i in range(1, 5)] + [(0, 1)]
    got = _run(spark, edges, n_iter=20)
    ref = _ref_pagerank(edges, 20)
    assert got == pytest.approx(ref, abs=1e-9)
    assert got[0] == max(got.values())
    assert got[2] == got[3] == got[4]  # symmetric leaves


def test_cycle_is_uniform_fixed_point(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _run(spark, edges, n_iter=7)
    for v in got.values():
        assert v == pytest.approx(1 / 6, abs=1e-9)


def test_dangling_mass_leaks_but_order_holds(spark):
    # 0 -> 1 -> 2, node 2 dangling: total mass < 1, rank(2) > rank(1)
    edges = [(0, 1), (1, 2)]
    got = _run(spark, edges, n_iter=15)
    ref = _ref_pagerank(edges, 15)
    assert got == pytest.approx(ref, abs=1e-9)
    assert sum(got.values()) < 1.0
    assert got[2] > got[1] > got[0]


def test_multigraph_double_edge_counts_twice(spark):
    edges = [(0, 1), (0, 1), (0, 2)]
    got = _run(spark, edges, n_iter=5)
    ref = _ref_pagerank(edges, 5)
    assert got == pytest.approx(ref, abs=1e-9)
    assert got[1] > got[2]


def test_zero_iterations_uniform(spark):
    got = _run(spark, [(0, 1), (1, 0)], n_iter=0)
    assert got == {0: 0.5, 1: 0.5}
