"""Golden test graphs, transliterated from the reference's test instances.

Sources: /root/reference/tests/test_instances/*.graph (METIS text, loaders
tests/io_test.cc:26-73) and inline CSR literals in tests/datastructure/
graph_test.cc:32-44 and tests/utility/metrics_test.cc:12-20. See FIXTURES.md.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from kaminpar_spark.graph import GraphFrame


def _graph(spark: SparkSession, undirected_edges, node_weights=None, n=None) -> GraphFrame:
    """undirected_edges: list of (u, v, w); materialized symmetrically."""
    rows = [(int(u), int(v), int(w)) for u, v, w in undirected_edges]
    e = spark.createDataFrame(rows, "src long, dst long, weight long")
    nodes = None
    if node_weights is not None:
        nodes = spark.createDataFrame(
            [(i, int(w)) for i, w in enumerate(node_weights)], "id long, weight long"
        )
    elif n is not None:
        nodes = spark.createDataFrame([(i, 1) for i in range(n)], "id long, weight long")
    return GraphFrame.from_edge_pairs(e, nodes=nodes, symmetrize=True)


def k3(spark, weighted: bool = False) -> GraphFrame:
    """Triangle {0,1,2}. weighted: node weights (10,20,30), edge weights
    w(0,1)=1 w(0,2)=2 w(1,2)=3 (tests/test_instances/weighted_K3.graph)."""
    if weighted:
        return _graph(spark, [(0, 1, 1), (0, 2, 2), (1, 2, 3)], node_weights=[10, 20, 30])
    return _graph(spark, [(0, 1, 1), (0, 2, 1), (1, 2, 1)], n=3)


def p2(spark) -> GraphFrame:
    """Path 0-1-2 (tests/test_instances/*_P2.graph)."""
    return _graph(spark, [(0, 1, 1), (1, 2, 1)], n=3)


def grid8(spark) -> GraphFrame:
    """2x4 grid, node weights 2^i, unit edges (graph_test.cc:32-44).

    Layout:  0-1-2-3
             |X|X|X|   (no diagonals; vertical + horizontal + the CSR extras)
             4-5-6-7
    Exact adjacency from the CSR literal at graph_test.cc:38-41:
    nodes=[0,2,6,10,13,16,20,24,26],
    edges=[1,4, 0,4,5,2, 1,5,6,3, 2,6,7, 0,1,5, 4,1,2,6, 5,2,3,7, 6,3].
    """
    nodes = [0, 2, 6, 10, 13, 16, 20, 24, 26]
    edges = [1, 4, 0, 4, 5, 2, 1, 5, 6, 3, 2, 6, 7, 0, 1, 5, 4, 1, 2, 6, 5, 2, 3, 7, 6, 3]
    und = set()
    for u in range(8):
        for j in range(nodes[u], nodes[u + 1]):
            v = edges[j]
            und.add((min(u, v), max(u, v)))
    return _graph(spark, [(u, v, 1) for u, v in sorted(und)], node_weights=[2**i for i in range(8)])


def star5(spark) -> GraphFrame:
    """Weighted star: center 0 (weight 4) + 4 leaves (weight 1), edge weights 3
    (metrics_test.cc:12-20)."""
    return _graph(
        spark, [(0, i, 3) for i in range(1, 5)], node_weights=[4, 1, 1, 1, 1]
    )


def isolated12(spark) -> GraphFrame:
    """12-node graph with 6 isolated nodes (graph_utils_test.cc:232-259):
    CSR nodes=[0,0,1,3,4,5,5,5,7,8,8,8,8], edges=[2,1,3,2,7,4,8,7]."""
    nodes = [0, 0, 1, 3, 4, 5, 5, 5, 7, 8, 8, 8, 8]
    edges = [2, 1, 3, 2, 7, 4, 8, 7]
    und = set()
    for u in range(12):
        for j in range(nodes[u], nodes[u + 1]):
            v = edges[j]
            und.add((min(u, v), max(u, v)))
    return _graph(spark, [(u, v, 1) for u, v in sorted(und)], n=12)


def clique_pendant(spark) -> GraphFrame:
    """4-clique {0,1,2,3} + pendant chain 3-4-5 (k_core_test.cc:67-100 spirit)."""
    und = [(u, v, 1) for u in range(4) for v in range(u + 1, 4)]
    und += [(3, 4, 1), (4, 5, 1)]
    return _graph(spark, und, n=6)


def erdos_renyi(
    spark, n: int = 2000, p: float = 0.005, seed: int = 42, hub_overlay: int = 5
) -> tuple[GraphFrame, np.ndarray, np.ndarray]:
    """Random mid-size oracle fixture (FIXTURES.md §3): G(n,p) + power-law hub
    overlay. Returns (GraphFrame, sym_src, sym_dst numpy arrays) so tests can
    run exact numpy oracles on the same edge set."""
    rng = np.random.default_rng(seed)
    iu, ju = np.triu_indices(n, k=1)
    mask = rng.random(iu.shape[0]) < p
    src, dst = iu[mask], ju[mask]
    # hub overlay: attach each of `hub_overlay` hubs to ~n/20 random nodes
    extra_s, extra_d = [], []
    for h in range(hub_overlay):
        targets = rng.choice(n, size=n // 20, replace=False)
        targets = targets[targets != h]
        extra_s.append(np.full(targets.shape[0], h))
        extra_d.append(targets)
    src = np.concatenate([src] + extra_s)
    dst = np.concatenate([dst] + extra_d)
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    und = np.unique(np.stack([lo, hi], axis=1), axis=0)
    pairs = [(int(u), int(v), 1) for u, v in und]
    g = _graph(spark, pairs, n=n)
    sym_src = np.concatenate([und[:, 0], und[:, 1]])
    sym_dst = np.concatenate([und[:, 1], und[:, 0]])
    return g, sym_src, sym_dst
