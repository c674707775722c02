"""PageRank: DataFrame-native power iteration checked against a dense
numpy reference, plus dangling-mass and non-convergence contracts."""

from __future__ import annotations

import numpy as np
import pytest

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.graph import (
    pagerank,
)


def _numpy_pagerank(edges, n, damping=0.85, iters=300):
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    m = np.zeros((n, n))
    for s, d in edges:
        m[d, s] = 1.0 / out_deg[s]
    dangling = np.array([1.0 if v not in out_deg else 0.0 for v in range(n)])
    r = np.ones(n) / n
    for _ in range(iters):
        r = (1 - damping) / n + damping * (m @ r + (dangling @ r) / n)
    return r


@pytest.mark.slow
def test_pagerank_matches_numpy(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, tol=1e-7, max_iter=60).collect()}
    want = _numpy_pagerank(edges, 4)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for v in range(4):
        assert abs(got[v] - want[v]) < 1e-4, (v, got[v], want[v])


@pytest.mark.slow
def test_pagerank_dangling_mass_redistributed(spark):
    # vertex 2 has no out-edges: its rank must recirculate, keeping the
    # distribution stochastic instead of leaking mass each round
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, tol=1e-7, max_iter=60).collect()}
    want = _numpy_pagerank(edges, 3)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for v in range(3):
        assert abs(got[v] - want[v]) < 1e-4
    # the chain end outranks the start
    assert got[2] > got[0]


def test_pagerank_raises_on_non_convergence(spark):
    edges = [(0, 1), (1, 0), (0, 2), (2, 0)]
    df = spark.createDataFrame(edges, "src int, dst int")
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(df, max_iter=1, tol=1e-12)
