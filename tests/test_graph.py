"""k-NN graph analytics: PageRank vs a numpy power-iteration reference.

knn_graph_pagerank is iterative (no SQL oracle); this pins exact
equivalence — same edges, same damping, same iteration count — against a
dense numpy implementation at the oracle scale factor. The in-degree
distribution is oracle-checked by the driver gate; here we only sanity
its mass balance (sum(in_degree * n) == N*K edges).
"""

from __future__ import annotations

import numpy as np

from energy_datalake_solution_spark.operators.graph import (
    PR_DAMPING,
    PR_ITERATIONS,
    knn_graph_indegree,
    knn_graph_pagerank,
)
from energy_datalake_solution_spark.operators.similarity import (
    K_NN_GRAPH,
    embeddings_knn_graph,
)

from .conftest import SF_ORACLE


def test_pagerank_matches_numpy_reference(spark):
    edges = embeddings_knn_graph(spark, SF_ORACLE).select("vec_id", "neighbor_id").collect()
    ids = sorted({r.vec_id for r in edges})
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    # adjacency as index lists: every node has out-degree exactly K
    out = [[] for _ in range(n)]
    for r in edges:
        out[pos[r.vec_id]].append(pos[r.neighbor_id])
    assert all(len(o) == K_NN_GRAPH for o in out)

    rank = np.full(n, 1.0 / n)
    base = (1.0 - PR_DAMPING) / n
    for _ in range(PR_ITERATIONS):
        inflow = np.zeros(n)
        share = rank / K_NN_GRAPH
        for u, nbrs in enumerate(out):
            for v in nbrs:
                inflow[v] += share[u]
        rank = base + PR_DAMPING * inflow

    got = {r.vec_id: r.pagerank for r in knn_graph_pagerank(spark, SF_ORACLE).collect()}
    assert set(got) == set(ids)
    for v in ids:
        assert abs(got[v] - round(rank[pos[v]], 9)) < 1e-8, v
    # ranks form a (near-)distribution: total mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_indegree_mass_balance(spark):
    rows = knn_graph_indegree(spark, SF_ORACLE).collect()
    n_vectors = sum(r.n_vectors for r in rows)
    n_edges = sum(r.in_degree * r.n_vectors for r in rows)
    assert n_edges == n_vectors * K_NN_GRAPH
