"""Graph analytics over the embedding k-NN graph.

The engine already builds the exact k-NN adjacency
(`operators/similarity.py::embeddings_knn_graph`) and clusters near-dup
pairs with connected components (`operators/corpus.py`). This module adds
the centrality tier: in-degree statistics (which vectors are "hubs" that
many others point at — the signal semantic-dedup uses to pick cluster
representatives) and PageRank over the directed k-NN edges (the classic
retrieval-quality / representative-selection score).

Scale shape: both operators run on the EDGE LIST (N x K rows — model-ish
sized relative to the N x N similarity matrix that never materializes).
PageRank iterations are one groupBy per round on the edge list with the
rank vector joined in; lineage is truncated per round with localCheckpoint
exactly like the connected-components loop (operators/corpus.py), and the
damping redistribution is a scalar, not a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from .similarity import KNN_ORACLE_EDGES_CTE, K_NN_GRAPH, embeddings_knn_graph

PR_DAMPING = 0.85
PR_ITERATIONS = 10


@register(
    "knn_graph_indegree",
    oracle=f"""
        WITH {KNN_ORACLE_EDGES_CTE},
        indeg AS (
            SELECT e.neighbor_id AS vec_id, count(*) AS in_degree
            FROM edges e GROUP BY 1
        )
        SELECT coalesce(i.in_degree, 0) AS in_degree,
               CAST(count(*) AS BIGINT) AS n_vectors
        FROM (SELECT DISTINCT vec_id FROM embeddings) v
        LEFT JOIN indeg i USING (vec_id)
        GROUP BY 1
    """,
    tags=("graph", "similarity"),
)
def knn_graph_indegree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree distribution of the exact k-NN graph: how many vectors
    count each vector among their top-K. Hubs (high in-degree) are the
    natural cluster representatives; isolated vectors (in-degree 0 — KNN
    points AT K neighbors but nothing points back) are outlier candidates.

    Composes the oracled adjacency; the aggregation is edge-list sized
    (N x K), one shuffle on neighbor_id plus the left join that restores
    in-degree-0 vectors (an anti-joined class the edge list alone cannot
    see)."""
    from ..sources.catalog import load_table

    edges = embeddings_knn_graph(spark, sf_dir).select("vec_id", "neighbor_id")
    indeg = edges.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id").distinct()
    return (
        vecs.join(indeg, "vec_id", "left")
        .select(F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
        .groupBy("in_degree")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _pagerank_oracle() -> str:
    """Unroll the FIXED PR_ITERATIONS damped power iterations into chained
    CTEs — no recursion needed, so the iterative operator graduates from a
    rows-only check to a full hash-checked oracle. Each r{{i}} mirrors one
    Spark round exactly: inflow = sum(rank/K) grouped by target, then
    base + damping * coalesce(inflow, 0) over all nodes. Constants are
    emitted with repr() so the SQL literals parse to the bit-identical
    doubles the Python driver code uses; summation order still differs
    between engines, but 10 iterations of ~1e-16 relative drift sit far
    inside the round(9) emitted precision."""
    base = f"({(1.0 - PR_DAMPING)!r})::DOUBLE / nn.n"
    iters = []
    for i in range(1, PR_ITERATIONS + 1):
        iters.append(f"""
        r{i} AS (
            SELECT nodes.vec_id,
                   {base} + ({PR_DAMPING!r})::DOUBLE * coalesce(c.inflow, (0.0)::DOUBLE)
                       AS rank
            FROM nodes CROSS JOIN nn
            LEFT JOIN (
                SELECT e.neighbor_id AS vec_id,
                       sum(r{i - 1}.rank / ({float(K_NN_GRAPH)!r})::DOUBLE) AS inflow
                FROM edges e JOIN r{i - 1} ON e.vec_id = r{i - 1}.vec_id
                GROUP BY 1
            ) c ON nodes.vec_id = c.vec_id
        )""")
    return f"""
        WITH {KNN_ORACLE_EDGES_CTE},
        nodes AS (SELECT DISTINCT vec_id FROM edges),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT vec_id, (1.0)::DOUBLE / nn.n AS rank FROM nodes CROSS JOIN nn),
        {",".join(iters)}
        SELECT vec_id, round(rank, 9) AS pagerank FROM r{PR_ITERATIONS}
    """


@register(
    "knn_graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "similarity", "iterative"),
)
def knn_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the directed k-NN graph (damping 0.85, fixed
    PR_ITERATIONS power iterations) — centrality for representative
    selection and retrieval-quality auditing.

    Every node has out-degree exactly K (the k-NN construction), so the
    contribution of node u to each neighbor is rank(u)/K — no dangling
    mass, no out-degree join. One power iteration = one groupBy over the
    edge list with the rank vector equi-joined in; localCheckpoint per
    round truncates the growing lineage (same pattern as the
    connected-components loop). Driver traffic is zero until the final
    collect-free return.

    The iteration count is FIXED, so the "iterative" fixpoint is
    SQL-expressible after all: the oracle unrolls the 10 rounds into
    chained CTEs (see _pagerank_oracle) and the driver hash-checks values,
    not just row counts. Exact equivalence with an independent numpy power
    iteration on the same edges is additionally pinned in
    tests/test_graph.py.
    """
    edges = (
        embeddings_knn_graph(spark, sf_dir)
        .select("vec_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    nodes = edges.select("vec_id").distinct()
    n = nodes.count()
    if n == 0:  # empty graph (empty/all-NULL embeddings): no ranks to emit
        return spark.createDataFrame([], "vec_id long, pagerank double")
    ranks = nodes.select("vec_id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - PR_DAMPING) / n
    for _ in range(PR_ITERATIONS):
        contribs = (
            edges.join(ranks, "vec_id")
            .groupBy(F.col("neighbor_id").alias("vec_id"))
            .agg(F.sum(F.col("rank") / F.lit(float(K_NN_GRAPH))).alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "vec_id", "left")
            .select(
                "vec_id",
                (
                    F.lit(base)
                    + F.lit(PR_DAMPING) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("vec_id", F.round("rank", 9).alias("pagerank"))


@register(
    "knn_label_consistency",
    oracle=f"""
        WITH {KNN_ORACLE_EDGES_CTE},
        votes AS (
            SELECT e.vec_id, nb.label AS nbr_label, count(*) AS n_votes
            FROM edges e JOIN embeddings nb ON e.neighbor_id = nb.vec_id
            GROUP BY 1, 2
        ),
        winner AS (
            SELECT vec_id, nbr_label,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY n_votes DESC, nbr_label
                   ) AS rn
            FROM votes
        )
        SELECT v.label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(sum(CASE WHEN w.nbr_label = v.label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_consistent,
               round(avg(CASE WHEN w.nbr_label = v.label THEN 1.0 ELSE 0.0 END), 6)
                   AS consistency
        FROM embeddings v JOIN winner w ON v.vec_id = w.vec_id AND w.rn = 1
        GROUP BY v.label
    """,
    tags=("graph", "similarity", "quality"),
)
def knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label k-NN consistency: for every vector, the majority label of
    its 5 nearest neighbors (ties -> smallest label), aggregated to the
    fraction of each class whose neighborhood agrees with it — the
    standard embedding-space quality audit (low consistency = labels that
    are noise or classes the embedding doesn't separate; the same
    leave-one-out vote is the kNN-classifier accuracy on the corpus).

    Pure composition: oracled adjacency -> broadcast label join (the
    label table is 12 bytes/vector) -> two edge-list-sized aggregations.
    Every shuffle is on vec_id or (vec_id, label) — N*K rows, never N^2.
    """
    from ..sources.catalog import load_table

    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    edges = embeddings_knn_graph(spark, sf_dir).select("vec_id", "neighbor_id")
    votes = (
        edges.join(
            F.broadcast(labels.select(F.col("vec_id").alias("neighbor_id"),
                                      F.col("label").alias("nbr_label"))),
            "neighbor_id",
        )
        .groupBy("vec_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    # asc_nulls_last: the engines disagree on NULL placement in ascending
    # order (Spark NULLS FIRST, DuckDB NULLS LAST) — a NULL label winning
    # a vote tie would flip the hash gate by data content; explicit
    # ordering pins the tie-break to the oracle's semantics
    w = W.partitionBy("vec_id").orderBy(
        F.col("n_votes").desc(), F.col("nbr_label").asc_nulls_last()
    )
    winner = votes.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        labels.join(winner.select("vec_id", "nbr_label"), "vec_id")
        .select("label", (F.col("nbr_label") == F.col("label")).cast("int").alias("ok"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("ok").cast("long").alias("n_consistent"),
            F.round(F.avg("ok"), 6).alias("consistency"),
        )
    )
