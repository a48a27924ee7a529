"""PageRank (operators/graph.py): closed-form hand cases, an exact
numpy power-iteration replay (same fixed iteration count, same update),
dangling-mass redistribution, and the nodes= universe widening."""

import numpy as np
import pytest

from sgdnet_spark.operators import graph as G


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    r = _ranks(G.pagerank(e, n_iter=5))
    assert r["a"] == pytest.approx(0.5, abs=1e-12)
    assert r["b"] == pytest.approx(0.5, abs=1e-12)


def test_numpy_power_iteration_replay(spark):
    # deterministic weighted digraph with a dangling node (3 has no
    # out-edges) — replay the exact same fixed-iteration update in numpy
    edges = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (2, 3, 1.0), (1, 3, 5.0), (4, 0, 2.0), (4, 3, 1.0),
    ]
    d, iters, n = 0.85, 9, 5
    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = _ranks(G.pagerank(e, weight="w", damping=d, n_iter=iters))

    P = np.zeros((n, n))
    for s, t, w in edges:
        P[s, t] += w
    out = P.sum(axis=1)
    dangling = out == 0
    P[~dangling] /= out[~dangling, None]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (P.T @ r + r[dangling].sum() / n)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in range(n):
        assert got[i] == pytest.approx(r[i], abs=1e-9), f"node {i}"


def test_nodes_param_widens_universe(spark):
    # an isolated node receives teleport + dangling shares but no link
    # mass; without nodes= it would not exist at all
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    nodes = spark.createDataFrame([("a",), ("b",), ("iso",)], ["node"])
    r = _ranks(G.pagerank(e, n_iter=3, nodes=nodes))
    assert set(r) == {"a", "b", "iso"}
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-12)
    assert r["b"] > r["a"] > 0 and r["iso"] > 0
    r2 = _ranks(G.pagerank(e, n_iter=3))
    assert set(r2) == {"a", "b"}


def test_parameter_validation(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError, match="damping"):
        G.pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        G.pagerank(e, n_iter=0)


def test_source_rank_entry_shape(spark, sf_dir):
    from sgdnet_spark.queries import SUBQUERIES

    df = SUBQUERIES["source_rank"](spark, sf_dir)
    rows = df.collect()
    assert df.columns == ["source", "in_w", "rank"]
    assert len(rows) == 20  # one row per source
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)  # ranks rounded to 6dp
    assert sum(r["in_w"] for r in rows) > 0


def test_local_and_distributed_solvers_agree(spark):
    # a 40-node hash-derived digraph with parallel edges, weights, and
    # a few dangling nodes: both solver paths apply the same update
    edges = [
        (i % 40, (i * 7 + 3) % 37, float(1 + i % 5)) for i in range(300)
    ]
    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    loc = _ranks(G.pagerank(e, weight="w", n_iter=8, solver="local"))
    dist = _ranks(G.pagerank(e, weight="w", n_iter=8, solver="distributed"))
    assert set(loc) == set(dist)
    for k in loc:
        assert loc[k] == pytest.approx(dist[k], abs=1e-12), f"node {k}"
    with pytest.raises(ValueError, match="solver"):
        G.pagerank(e, solver="bogus")


def test_nodes_param_unions_with_endpoints(spark):
    # nodes= WIDENS the universe: a frame omitting an edge endpoint must
    # not crash the local solver or leak rank mass from the distributed
    # one — endpoints are unioned in, and sum(rank) == 1 on both paths
    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")],
                              ["src", "dst"])
    nodes = spark.createDataFrame([("a",), ("b",)], ["node"])  # omits c
    for solver in ("local", "distributed"):
        r = _ranks(G.pagerank(e, n_iter=4, nodes=nodes, solver=solver))
        assert set(r) == {"a", "b", "c"}, solver
        assert sum(r.values()) == pytest.approx(1.0, abs=1e-12), solver
