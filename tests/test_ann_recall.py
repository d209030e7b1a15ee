"""Recall floors for the approximate similarity indexes.

The LSH and IVF operators are rows-only at the driver gate (probabilistic
recall can't hash-match an exact oracle); this pins their QUALITY instead:
recall@k against the exact brute-force top-k must stay above a floor. A
regression here means the index got silently worse, not just different.

Measured steady-state (sf0.001/sf0.01): multi-probe LSH ~0.92, spherical
IVF nprobe=6/8 ~0.92 (the synthetic vectors are isotropic, so IVF recall
tracks the probed fraction; see the operator docstring for the sweep).
"""

from __future__ import annotations

from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

from .conftest import SF_ORACLE

get_queries()


def _recall(spark, approx_name):
    exact = QUERIES["embeddings_cosine_topk"].fn(spark, SF_ORACLE).toPandas()
    approx = QUERIES[approx_name].fn(spark, SF_ORACLE).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    per_q = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index]
    return sum(per_q) / len(per_q)


def test_lsh_ann_recall_floor(spark):
    assert _recall(spark, "embeddings_lsh_ann") >= 0.8


def test_ivf_ann_recall_floor(spark):
    assert _recall(spark, "embeddings_ivf_ann") >= 0.85
