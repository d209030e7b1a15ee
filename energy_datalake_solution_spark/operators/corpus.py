"""Corpus-pipeline operators: near-dup clustering, deterministic splits,
and the composed training-corpus filter.

These close the loop on the dedup suite (operators/dedup.py): pair lists
become clusters, clusters become a deduplicated corpus, and the corpus is
split train/val/test — the operations a large-scale training-data pipeline
runs after candidate generation. No counterpart exists in the reference
(its dedup is single-table ``dropDuplicates``,
glue_jobs/etl-s3-processed-to-redshift.py:59); this is the north-star
extension surface of BASELINE.json.

Scale notes:
  * connected components uses iterative min-label propagation — each round
    is one join + one groupBy on (node, label) pairs, the same primitive
    the large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond") builds on. Rounds = graph
    diameter, which for near-dup graphs is tiny (dup clusters are cliques
    or short chains). ``localCheckpoint`` truncates lineage per round so
    the plan does not grow with iterations.
  * deterministic splits hash content-stable keys (md5) instead of
    ``rand()`` — reproducible across runs, engines, and cluster sizes, and
    exactly what you want when re-running a 100 TB pipeline must not
    reshuffle examples between train and test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import QUERIES, register
from ..sources.catalog import load_table
from . import dedup as _dedup  # ensures pair query + oracle are registered
from . import text as _text  # keep-best nests the quality-score oracle

MAX_CC_ROUNDS = 30

# Recursive-CTE oracle: enumerate reachable nodes from every doc over the
# symmetrized near-dup edge list, then take the minimum reachable doc_id as
# the cluster id. The edge list is the *same SQL* as the registered
# ngram-jaccard oracle, so the two stay in lockstep by construction.
_CLUSTER_ORACLE = f"""
    WITH RECURSIVE pairs_raw AS (
        {QUERIES["docs_ngram_jaccard_pairs"].oracle}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs_raw
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs_raw
    ),
    walk(doc_id, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.a, w.reach FROM walk w JOIN edges e ON e.b = w.doc_id
    )
    SELECT doc_id,
           min(reach) AS cluster_id,
           (doc_id = min(reach)) AS is_canonical
    FROM walk
    GROUP BY doc_id
"""


@register(
    "docs_dedup_clusters",
    oracle=_CLUSTER_ORACLE,
    tags=("dedup", "graph"),
)
def docs_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the exact ngram-Jaccard
    pair graph, cluster id = smallest doc_id in the component, canonical doc
    = the cluster id holder (the row you keep when deduplicating).

    Iterative min-label propagation: labels start as self; each round every
    node takes the min of its own label and its neighbors' labels; stop when
    a round changes nothing. The edge list is computed ONCE and
    localCheckpoint'ed (it is the expensive part — the label loop touches
    only (node, label) pairs).

    The convergence check is FUSED into the round: the aggregation carries
    each node's previous label alongside the new min (min over nulls for
    neighbor rows), so ``changed`` is a scan of the round's checkpointed
    output — no extra join, no subtree recompute, one cheap count job per
    round. Non-convergence inside MAX_CC_ROUNDS raises instead of silently
    returning split components (a diameter-31 chain is pathological for a
    near-dup graph, whose components are cliques or short chains — fail
    loudly rather than emit labels that disagree with the oracle).
    """
    edges = _dedup.docs_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    e = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint()
    )
    labels = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .localCheckpoint()
    )
    label_type = dict(labels.dtypes)["cluster_id"]
    changed = -1
    for _ in range(MAX_CC_ROUNDS):
        prop = e.join(labels, e.dst == labels.doc_id).select(
            F.col("src").alias("doc_id"),
            "cluster_id",
            F.lit(None).cast(label_type).alias("self_label"),
        )
        own = labels.select(
            "doc_id", "cluster_id", F.col("cluster_id").alias("self_label")
        )
        new_labels = (
            own.unionByName(prop)
            .groupBy("doc_id")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                # exactly one non-null per doc: its previous label
                F.min("self_label").alias("self_label"),
            )
            .localCheckpoint()
        )
        # scan of the checkpointed blocks — nothing upstream recomputes
        changed = new_labels.where(F.col("cluster_id") < F.col("self_label")).count()
        labels = new_labels.select("doc_id", "cluster_id")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"docs_dedup_clusters: min-label propagation did not converge in "
            f"{MAX_CC_ROUNDS} rounds ({changed} labels still changing)"
        )
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


# Keep-best representative selection composes the cluster oracle with the
# registered quality oracle — both nested verbatim, so the three stay in
# lockstep by construction (same pattern as source_quality_dashboard).
def _keep_best_oracle() -> str:
    quality = QUERIES["docs_quality_score"].oracle
    return f"""
        WITH cl AS ({_CLUSTER_ORACLE}),
        q AS ({quality}),
        ranked AS (
            SELECT cl.cluster_id, cl.doc_id, q.quality_flag,
                   row_number() OVER (
                       PARTITION BY cl.cluster_id
                       ORDER BY CASE WHEN q.quality_flag = 'keep'
                                     THEN 0 ELSE 1 END,
                                coalesce(q.n_chars, -1) DESC,
                                cl.doc_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY cl.cluster_id) AS cluster_size
            FROM cl JOIN q ON cl.doc_id = q.doc_id
        )
        SELECT cluster_id,
               doc_id AS kept_doc_id,
               CAST(cluster_size AS BIGINT) AS cluster_size,
               quality_flag AS kept_quality_flag
        FROM ranked WHERE rn = 1
    """


@register(
    "docs_dedup_keep_best",
    oracle=_keep_best_oracle(),
    tags=("dedup", "quality", "corpus"),
)
def docs_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup collapse: one kept document per connected
    near-dup cluster — 'keep'-flagged docs beat 'drop'-flagged, longer
    beats shorter, smallest doc_id breaks ties. This is the curation rule
    real pipelines apply instead of lowest-id-wins: when a boilerplate
    page and its cleaner mirror are near-dups, the cleaner, longer one
    survives (cf. the representative-selection step in SemDeDup and the
    CCNet dedup stage).

    Pure composition of REGISTERED operators (clusters + quality score,
    same plans, same oracle texts nested). Both joins key on doc_id; the
    ranking window partitions by cluster_id — bounded by the largest
    near-dup cluster, orders of magnitude smaller than the corpus (the
    cluster table itself is the propagation output, already shuffled on
    doc_id). At 100 TB the cost is the cluster computation, shared with
    docs_dedup_clusters; this adds one keyed join and one bounded window."""
    from pyspark.sql import Window as W

    from .text import docs_quality_score

    clusters = docs_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    q = docs_quality_score(spark, sf_dir).select("doc_id", "n_chars", "quality_flag")
    joined = clusters.join(q, "doc_id")
    w = W.partitionBy("cluster_id")
    rank_w = w.orderBy(
        F.when(F.col("quality_flag") == "keep", 0).otherwise(1),
        F.coalesce(F.col("n_chars"), F.lit(-1)).desc(),
        "doc_id",
    )
    return (
        joined.select(
            "cluster_id",
            "doc_id",
            "quality_flag",
            F.row_number().over(rank_w).alias("rn"),
            F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        )
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            "cluster_size",
            F.col("quality_flag").alias("kept_quality_flag"),
        )
    )


# ONE definition of the md5 split boundaries: first byte < 0xcc -> train
# (204/256 = 79.7%), < 0xe6 -> val (230/256 = 89.8%), else test. Both the
# Spark operators and every oracle string interpolate THESE constants, so
# changing the ratio cannot silently desynchronize the split operator from
# the contamination/drift audits that police it.
SPLIT_TRAIN_BOUND = "cc"
SPLIT_VAL_BOUND = "e6"


def split_col(doc_id_col: str = "doc_id"):
    """The deterministic split as a Spark column — shared by every
    operator that partitions by split."""
    prefix = F.substring(F.md5(F.col(doc_id_col).cast("string")), 1, 2)
    return (
        F.when(prefix < SPLIT_TRAIN_BOUND, "train")
        .when(prefix < SPLIT_VAL_BOUND, "val")
        .otherwise("test")
    )


@register(
    "docs_deterministic_split",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TRAIN_BOUND}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_BOUND}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    tags=("corpus", "sampling"),
)
def docs_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by hashing the stable
    key: the first md5 byte partitions hex space at 0xcc (204/256 = 79.7%)
    and 0xe6 (230/256 = 89.8%). Unlike ``rand(seed)``, the assignment is a
    pure function of the row — stable under repartitioning, retries,
    cluster size, and engine (Spark and DuckDB md5 agree bit-for-bit)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", split_col().alias("split"))


@register(
    "docs_pack_sequences",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, shard, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens AS start_offset
            FROM t
        )
        SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(floor(start_offset / 512) AS BIGINT) AS pack_id
        FROM c
    """,
    tags=("corpus", "window"),
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents are concatenated in a
    deterministic order and cut into fixed-budget packs (512 tokens);
    pack_id = which pack a document STARTS in (offset-based greedy packing,
    the streaming-friendly variant — no bin-packing search).

    Scale shape: packing is per-shard (md5 nibble, 16 shards), so the
    running-offset window partitions across the cluster instead of
    funnelling 100 TB through one task — a global ORDER BY cumsum is the
    classic single-task window trap. Shard count scales with data; packs
    are only ever read shard-local, so no global order is needed."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    t = d.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    return t.select("doc_id", "shard", "n_tokens", start).select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("start_offset") / 512).alias("pack_id"),
    )


@register(
    "docs_split_contamination",
    oracle=f"""
        WITH pairs_raw AS (
            {QUERIES["docs_ngram_jaccard_pairs"].oracle}
        ),
        s AS (
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b,
               p.jaccard AS jaccard
        FROM pairs_raw p
        JOIN s sa ON p.doc_a = sa.doc_id
        JOIN s sb ON p.doc_b = sb.doc_id
        WHERE sa.split <> sb.split
    """,
    tags=("corpus", "dedup", "quality"),
)
def docs_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination report: near-duplicate pairs that straddle
    split boundaries (a training doc nearly identical to a val/test doc
    leaks the benchmark). Composes the exact Jaccard pair graph with the
    deterministic split — the dedup decision and the audit use the same
    primitives, so fixing contamination (drop the non-train side) is a
    semi-join against this result."""
    pairs = _dedup.docs_ngram_jaccard_pairs(spark, sf_dir)
    splits = docs_deterministic_split(spark, sf_dir)
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    # the split table is CORPUS-sized (one row per doc): leave the join
    # strategy to AQE — a forced broadcast caps out at the scale this
    # audit targets (same rule as the simhash verify rejoin in dedup.py)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


@register(
    "docs_training_corpus",
    oracle=f"""
        WITH canon AS (
            SELECT min(doc_id) AS doc_id
            FROM documents
            GROUP BY md5(lower(trim(text)))
        ),
        scored AS (
            SELECT d.doc_id,
                   len(string_split(d.text, ' ')) AS n_tokens,
                   len(regexp_extract_all(d.text, '[^a-z0-9 ]')) * 1.0
                       / length(d.text) AS nonalpha_ratio
            FROM documents d JOIN canon c ON d.doc_id = c.doc_id
        )
        SELECT s.doc_id,
               s.n_tokens,
               CASE WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TRAIN_BOUND}' THEN 'train'
                    WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_BOUND}' THEN 'val'
                    ELSE 'test' END AS split
        FROM scored s
        WHERE s.n_tokens >= 10 AND s.nonalpha_ratio < 0.3
    """,
    tags=("corpus", "dedup", "quality"),
)
def docs_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline: exact-dedup (keep the smallest doc_id per
    normalized-content digest) -> quality filter (>= 10 tokens, < 30%
    non-alphanumeric) -> deterministic split. One semi join against the
    per-digest canonical set (shuffle on a 16-byte key), then pure row-local
    expressions — the whole filter chain is a single scan at any scale."""
    d = load_table(spark, sf_dir, "documents")
    # canonical set from the registered exact-dedup operator — ONE
    # definition of the content normalization and the canonical pick
    canon = _dedup.docs_exact_dedup(spark, sf_dir).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    n_tokens = F.size(F.split("text", " ")).cast("long")  # match oracle BIGINT
    nonalpha_ratio = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-z0-9 ]"), F.lit(0)))
        * 1.0
        / F.length("text")
    )
    return (
        d.join(canon, "doc_id", "left_semi")
        .select("doc_id", n_tokens.alias("n_tokens"), nonalpha_ratio.alias("nonalpha_ratio"))
        .where((F.col("n_tokens") >= 10) & (F.col("nonalpha_ratio") < 0.3))
        .select("doc_id", "n_tokens", split_col().alias("split"))
    )


# --------------------------------------------------------------------------
# Stratified deterministic sampling (per-source rates)
# --------------------------------------------------------------------------
@register(
    "docs_stratified_sample",
    oracle="""
        SELECT doc_id, source
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'g'
                   WHEN source IN ('src5','src6','src7','src8','src9') THEN '8000'
                   ELSE '4000' END
    """,
    tags=("corpus", "sampling"),
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep 100% of src0-4, 50% of
    src5-9, 25% of the rest — the domain-reweighting step of a training
    mix. The keep decision hashes the doc_id (md5 prefix vs a rate
    threshold in hex space), NOT rand(): reproducible across runs,
    engines, partitionings, and cluster sizes, and a doc's fate never
    changes when the corpus grows. Per-row filter, ZERO shuffle; at 100 TB
    this is a pushed-down scan predicate."""
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    rate_threshold = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3", "src4"), F.lit("g"))
        .when(F.col("source").isin("src5", "src6", "src7", "src8", "src9"), F.lit("8000"))
        .otherwise(F.lit("4000"))
    )
    return d.where(h < rate_threshold).select("doc_id", "source")


# --------------------------------------------------------------------------
# Domain-mix weights (per-(source, lang) token budget shares)
# --------------------------------------------------------------------------
@register(
    "docs_domain_mix_weights",
    oracle="""
        WITH g AS (
            SELECT source, lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source, lang
        )
        SELECT source, lang, n_docs, n_tokens,
               n_tokens * 1.0 / (SELECT sum(n_tokens) FROM g) AS token_share
        FROM g
    """,
    tags=("corpus", "agg"),
)
def docs_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shares per (source, lang) cell — the statistic a
    training-mix designer reweights against. One partial-aggregated
    groupBy; the corpus total is a 1-row aggregate of the GROUPED result
    (not a second corpus scan) broadcast back as a cross join. No global
    window (the all-rows window trap would single-partition the result).
    token_share is a single exact-int division — deterministic unrounded."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    total = g.agg(F.sum("n_tokens").alias("total_tokens"))
    return g.join(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") * F.lit(1.0) / F.col("total_tokens")).alias("token_share"),
    )


@register(
    "docs_temperature_sample",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source, COALESCE(source, '__null__') AS skey,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        per_src AS (
            SELECT skey, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
            FROM toks GROUP BY skey
        ),
        tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens FROM per_src),
        weighted AS (
            SELECT skey, src_tokens,
                   CAST(floor(sqrt(src_tokens * 1.0 / total_tokens) * 1000000)
                        AS BIGINT) AS w_ppm
            FROM per_src, tot
        ),
        rates AS (
            SELECT w.skey, w.src_tokens,
                   -- HUGEINT cast is REQUIRED, not decorative: BIGINT*BIGINT
                   -- does NOT auto-widen in DuckDB (it raises Out of Range),
                   -- and the numerator passes int64 at ~8.8M total tokens
                   CAST((CAST(w.w_ppm AS HUGEINT) * t.total_tokens * 1048576)
                        // (CAST((SELECT sum(w_ppm) FROM weighted) AS HUGEINT)
                            * w.src_tokens)
                        AS BIGINT) AS rate_scaled
            FROM weighted w, tot t
        )
        SELECT d.doc_id, d.source, r.rate_scaled
        FROM toks d JOIN rates r ON d.skey = r.skey
        WHERE r.rate_scaled >= 1048576
           OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)
              < printf('%05x', r.rate_scaled)
    """,
    tags=("corpus", "sampling"),
)
def docs_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain sampling (T=0.5) — the mixture
    rebalancer of multilingual/multi-domain LLM training sets (public
    practice since GPT-3 / XLM-R: raise rare domains, damp dominant ones
    by sampling p_s ~ share_s^T). Per-source acceptance ratio =
    p_s / share_s with p_s the sqrt-flattened normalized share; docs
    accepted by a deterministic md5 threshold — reproducible across runs,
    engines, and cluster sizes, no RNG.

    Exactness discipline: the flattened weight is floored to integer ppm
    (identical IEEE sqrt of an identical exact division on both engines),
    the weight NORMALIZATION sum is an integer sum (order-independent —
    a double sum here could flip a floor at the last ulp), and the final
    ratio is pure integer arithmetic scaled to 2^20, compared against the
    first 5 hex digits of the doc's md5 — string-lexicographic equals
    numeric for fixed-width lowercase hex on both engines. The 2^20-scaled
    product runs in 128-bit intermediates on BOTH engines (DuckDB widens
    to HUGEINT automatically; Spark casts through decimal(38,0), whose
    DIV floors identically — int64 would overflow past ~8.8M total
    tokens, i.e. on any real corpus).

    Plan: one token-count scan + a source-level aggregate (dashboard-
    sized), rates broadcast back onto the doc table; map-side filter."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.coalesce("source", F.lit("__null__")).alias("skey"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    per_src = toks.groupBy("skey").agg(F.sum("n_tokens").alias("src_tokens"))
    tot = per_src.agg(F.sum("src_tokens").alias("total_tokens"))
    weighted = per_src.join(F.broadcast(tot)).select(
        "skey",
        "src_tokens",
        F.floor(
            F.sqrt(F.col("src_tokens") * F.lit(1.0) / F.col("total_tokens")) * 1000000
        ).cast("long").alias("w_ppm"),
    )
    sum_w = weighted.agg(F.sum("w_ppm").alias("sum_w_ppm"))
    rates = weighted.join(F.broadcast(sum_w)).join(F.broadcast(tot)).select(
        "skey",
        # widen through decimal(38,0): w_ppm approaches 1e6 for a dominant
        # source, so the 2^20-scaled numerator overflows int64 on any
        # corpus past ~8.8M tokens (ANSI: ARITHMETIC_OVERFLOW). Decimal
        # DIV floors exactly like DuckDB's HUGEINT // (verified equal).
        F.expr(
            "CAST(CAST(w_ppm AS DECIMAL(38,0)) * total_tokens * 1048576"
            " DIV (CAST(sum_w_ppm AS DECIMAL(38,0)) * src_tokens) AS BIGINT)"
        ).alias("rate_scaled"),
    )
    accepted = toks.join(F.broadcast(rates), "skey").where(
        (F.col("rate_scaled") >= 1048576)
        | (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5)
            < F.format_string("%05x", F.col("rate_scaled"))
        )
    )
    return accepted.select("doc_id", "source", "rate_scaled")


@register(
    "docs_epoch_shuffle",
    oracle="""
        WITH epochs(epoch) AS (SELECT UNNEST(range(0, 3))),
        keyed AS (
            SELECT e.epoch, d.doc_id,
                   md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
                       AS order_key
            FROM documents d, epochs e
        )
        SELECT epoch, doc_id,
               CAST(row_number() OVER (PARTITION BY epoch ORDER BY order_key)
                    AS BIGINT) AS position
        FROM keyed
    """,
    tags=("corpus", "sampling"),
)
def docs_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle — the example-ordering step
    of a training-data pipeline: every epoch reads the corpus in a
    different pseudo-random order, yet the order is a pure function of
    (epoch, doc_id), so a resumed or re-run job sees byte-identical
    batches (the property rand()-based shuffles lose on retry/restart).
    The order key is md5(epoch:doc_id); 3 epochs are materialized.

    Scale shape: a global shuffle of 100 TB IS a distributed sort, and the
    POSITION column must not funnel an epoch through one window task. The
    plan shards each epoch's window by the FIRST HEX DIGIT of the order
    key — a prefix of the sort key, so (shard, key-within-shard) order IS
    the global key order and the sharded positions are provably identical
    to a single per-epoch window (the same concatenation argument as the
    sequence packer's two-pass offsets; the single-window oracle hash-
    gates the equality). Pass 1: row_number within (epoch, shard) — 48
    bounded partitions instead of 3 corpus-sized ones; pass 2: per-shard
    row counts (48 rows) cumulate into shard offsets, broadcast back;
    position = shard offset + local rank. At 100 TB widen the shard
    prefix to 2-3 hex digits — same plan, more shards."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("epoch")
    ).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"), F.col("doc_id").cast("string"))
        ).alias("order_key"),
    ).withColumn("shard", F.substring("order_key", 1, 1))
    from pyspark.sql import Window as W

    w_local = W.partitionBy("epoch", "shard").orderBy("order_key")
    local = keyed.withColumn("local_rn", F.row_number().over(w_local))
    shard_sizes = local.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_off = (
        W.partitionBy("epoch").orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = shard_sizes.select(
        "epoch",
        "shard",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    return local.join(F.broadcast(offsets), ["epoch", "shard"]).select(
        "epoch",
        "doc_id",
        (F.col("offset") + F.col("local_rn")).cast("long").alias("position"),
    )


SOURCE_BUDGET = 20  # max docs kept per source — BELOW the 25 docs every
# sf0.001/sf0.01 source holds, so the cap genuinely cuts rows under the
# exact-oracle gate (a budget above fixture sizes would leave the defining
# WHERE clause dead code in every hash comparison)


@register(
    "docs_source_budget_cap",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   COALESCE(source, '__null__') AS skey,
                   md5(CAST(doc_id AS VARCHAR)) AS pick_key
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, source, pick_key,
                   CAST(row_number() OVER (
                       PARTITION BY skey ORDER BY pick_key
                   ) AS BIGINT) AS keep_rank
            FROM keyed
        )
        SELECT doc_id, source, keep_rank
        FROM ranked WHERE keep_rank <= {SOURCE_BUDGET}
    """,
    tags=("corpus", "sampling"),
)
def docs_source_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document budget: keep at most SOURCE_BUDGET docs per
    source, selected deterministically by md5(doc_id) order — the hard cap
    a training mix places on any single domain (the complement of
    temperature sampling's proportional damping), reproducible across
    runs, engines, and cluster sizes.

    Scale shape: the per-source rank uses the same hash-prefix-sharded
    two-pass windows as docs_epoch_shuffle — rank within (source, first
    hex digit of the pick key), then broadcast per-shard offsets — so no
    window task ever holds a whole source (a 100 TB crawl's dominant
    domain IS a whole-corpus-sized partition). The shard is a prefix of
    the sort key, so sharded ranks equal the single-window ranks; the
    single-window oracle hash-gates that equality. Rows past the budget
    are dropped pre-offset only when a WHOLE SHARD clears the budget —
    here the filter applies after the global rank (budget ~ shard sizes);
    at scale add the per-shard early filter (keep shard-local rank <=
    budget) which is lossless because global rank >= shard-local rank."""
    d = load_table(spark, sf_dir, "documents")
    # skey: NULL-safe grouping/join key (a NULL source is still a domain;
    # joining on the raw column would silently drop its docs — the oracle
    # keeps them, since SQL window PARTITION BY groups NULLs together)
    keyed = d.select(
        "doc_id",
        "source",
        F.coalesce("source", F.lit("__null__")).alias("skey"),
        F.md5(F.col("doc_id").cast("string")).alias("pick_key"),
    ).withColumn("shard", F.substring("pick_key", 1, 1))
    from pyspark.sql import Window as W

    w_local = W.partitionBy("skey", "shard").orderBy("pick_key")
    local = keyed.withColumn("local_rn", F.row_number().over(w_local))
    sizes = local.groupBy("skey", "shard").agg(F.count(F.lit(1)).alias("n"))
    w_off = (
        W.partitionBy("skey").orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "skey", "shard", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    return (
        local.join(F.broadcast(offsets), ["skey", "shard"])
        .select(
            "doc_id",
            "source",
            (F.col("offset") + F.col("local_rn")).cast("long").alias("keep_rank"),
        )
        .where(F.col("keep_rank") <= SOURCE_BUDGET)
    )


LENGTH_BATCH_SIZE = 32  # docs per training batch within a length bucket


@register(
    "docs_length_bucket_batches",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        bucketed AS (
            SELECT doc_id, n_tokens,
                   CAST(length(bin(greatest(n_tokens, 1))) - 1 AS INT) AS bucket
            FROM toks
        ),
        ranked AS (
            SELECT doc_id, n_tokens, bucket,
                   row_number() OVER (
                       PARTITION BY bucket ORDER BY n_tokens, doc_id
                   ) AS pos
            FROM bucketed
        )
        SELECT doc_id, n_tokens, bucket,
               CAST((pos - 1) // {LENGTH_BATCH_SIZE} AS BIGINT) AS batch_idx
        FROM ranked
    """,
    tags=("corpus", "packing"),
)
def docs_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment: docs bucket by power-of-two token
    count (bucket = floor(log2 n), computed as the BIT LENGTH of n — pure
    integer arithmetic on both engines, no float log whose last-ulp could
    flip a floor), then batch into groups of LENGTH_BATCH_SIZE ordered by
    (n_tokens, doc_id) within the bucket — the padding-efficiency step of
    a training-data pipeline (batching similar lengths minimizes pad
    tokens without biasing content: order within equal lengths is by id).

    Scale shape: the in-bucket position uses two-pass windows sharded by
    the EXACT token count (a prefix of the (n_tokens, doc_id) sort key):
    rank by doc_id within (bucket, n_tokens), then broadcast offsets from
    the per-(bucket, n_tokens) count table — model-sized, since distinct
    lengths are bounded by the max document length, not the corpus. No
    corpus-sized window partition anywhere; the single-window oracle
    hash-gates the equality of the sharded positions."""
    d = load_table(spark, sf_dir, "documents")
    # NULL text -> 0 tokens on BOTH engines (size(NULL) is NULL, and the
    # engines disagree on NULL window ordering — normalize up front)
    toks = d.select(
        "doc_id",
        F.coalesce(F.size(F.split(F.col("text"), " ")), F.lit(0))
        .cast("long").alias("n_tokens"),
    )
    bucketed = toks.withColumn(
        "bucket",
        (F.length(F.bin(F.greatest(F.col("n_tokens"), F.lit(1)))) - 1).cast("int"),
    )
    from pyspark.sql import Window as W

    w_local = W.partitionBy("bucket", "n_tokens").orderBy("doc_id")
    local = bucketed.withColumn("local_rn", F.row_number().over(w_local))
    sizes = local.groupBy("bucket", "n_tokens").agg(F.count(F.lit(1)).alias("n"))
    w_off = (
        W.partitionBy("bucket").orderBy("n_tokens").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "bucket",
        "n_tokens",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    return local.join(F.broadcast(offsets), ["bucket", "n_tokens"]).select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.expr(f"(offset + local_rn - 1) DIV {LENGTH_BATCH_SIZE}").alias("batch_idx"),
    )


# --------------------------------------------------------------------------
# Multi-tier duplicate evidence
# --------------------------------------------------------------------------
from . import spans as _spans  # noqa: E402  (ensures span oracle is registered)


@register(
    "docs_multitier_dup_pairs",
    oracle=f"""
        WITH jac AS ({QUERIES["docs_ngram_jaccard_pairs"].oracle}),
        sub AS ({QUERIES["docs_duplicate_span_pairs"].oracle}),
        sh AS ({QUERIES["docs_simhash_near_dups"].oracle}),
        u AS (
            SELECT doc_a, doc_b, 'jaccard' AS tier FROM jac
            UNION ALL SELECT doc_a, doc_b, 'substring' AS tier FROM sub
            UNION ALL SELECT doc_a, doc_b, 'simhash' AS tier FROM sh
        )
        SELECT doc_a, doc_b,
               array_to_string(list_sort(list(DISTINCT tier)), ',') AS tiers,
               CAST(count(DISTINCT tier) AS BIGINT) AS n_tiers
        FROM u GROUP BY doc_a, doc_b
    """,
    tags=("dedup", "corpus"),
)
def docs_multitier_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-pair evidence across the engine's three pair tiers —
    set-similarity (word-3-gram Jaccard), exact substring (8-token spans),
    and fingerprint (banded SimHash) — with per-pair provenance: which
    tiers flagged it and how many agreed. This is the review table a
    dedup-policy decision reads (e.g. drop pairs any tier flags, or
    require 2-of-3 agreement).

    Pure composition: each tier is the REGISTERED operator (same code,
    same plans, including their skew guards), the union is column-aligned,
    and the rollup groups on the 16-byte pair key. The oracle nests the
    three registered oracle texts, so the composed result stays in
    lockstep with the tiers by construction.
    """
    tag = lambda df, t: df.select("doc_a", "doc_b", F.lit(t).alias("tier"))  # noqa: E731
    u = (
        tag(_dedup.docs_ngram_jaccard_pairs(spark, sf_dir), "jaccard")
        .unionByName(tag(_spans.docs_duplicate_span_pairs(spark, sf_dir), "substring"))
        .unionByName(tag(_dedup.docs_simhash_near_dups(spark, sf_dir), "simhash"))
    )
    return u.groupBy("doc_a", "doc_b").agg(
        F.array_join(F.array_sort(F.collect_set("tier")), ",").alias("tiers"),
        F.count_distinct("tier").alias("n_tiers"),
    )


@register(
    "docs_dup_rate_by_source",
    oracle=None,  # assigned below: wraps the registered jaccard oracle as a CTE
    tags=("dedup", "corpus", "quality"),
)
def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source near-duplication rate: the fraction of each source's
    documents that participate in at least one exact-Jaccard near-dup
    pair — the per-provider contamination figure a data-sourcing report
    leads with (a source with a high dup rate is re-crawling or mirroring
    content the corpus already has).

    Composition: oracled PPJoin pairs -> explode to pair members ->
    distinct doc set -> broadcast-join source labels -> per-source rate
    against total counts. Every aggregate is source-cardinality sized;
    the oracle TEXTUALLY wraps docs_ngram_jaccard_pairs' oracle as a CTE,
    so both engines run the same pair semantics.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = _dedup.docs_ngram_jaccard_pairs(spark, sf_dir)
    dup_docs = (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        d.select("doc_id", "source")
        .join(dup_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_dup", F.lit(0))).cast("long").alias("n_dup_docs"),
            F.round(
                F.sum(F.coalesce("is_dup", F.lit(0))) / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
    )


QUERIES["docs_dup_rate_by_source"].oracle = f"""
    WITH pairs AS ({QUERIES["docs_ngram_jaccard_pairs"].oracle}),
    dup_docs AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM pairs
            UNION ALL
            SELECT doc_b FROM pairs
        )
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           round(sum(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS dup_rate
    FROM documents d LEFT JOIN dup_docs dd ON d.doc_id = dd.doc_id
    GROUP BY d.source
"""


_DRIFT_TOKENS_SQL = f"""
        WITH toks AS (
            SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TRAIN_BOUND}' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_BOUND}' THEN 'val'
                        ELSE 'test' END AS split,
                   UNNEST(string_split(text, ' ')) AS token
            FROM documents
        ),
        counts AS (
            SELECT token,
                   sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS c_train,
                   sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS c_val
            FROM toks
            WHERE split IN ('train', 'val')
            GROUP BY token
        ),
        totals AS (
            SELECT sum(c_train)::BIGINT AS t_train, sum(c_val)::BIGINT AS t_val
            FROM counts
        ),
        rated AS (
            SELECT token, c_train, c_val,
                   (c_train * 1000000) // NULLIF(t_train, 0) AS rate_train_ppm,
                   (c_val * 1000000) // NULLIF(t_val, 0) AS rate_val_ppm
            FROM counts, totals
        )
"""


@register(
    "docs_split_token_drift",
    oracle=_DRIFT_TOKENS_SQL
    + """
        SELECT token, c_train, c_val, rate_train_ppm, rate_val_ppm,
               abs(rate_train_ppm - rate_val_ppm) AS drift_ppm
        FROM rated
    """,
    tags=("corpus", "quality", "agg"),
)
def docs_split_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-val token-distribution drift: per-token occurrence rates in
    each split (parts-per-million) and their absolute gap — the eval-hygiene
    check that a hash split didn't skew the vocabulary (a skewed split makes
    validation loss lie). All arithmetic is INTEGER (counts, and
    floor(c * 1e6 / total) via integer division), so the gate is an exact
    hash match with no float-order hazard. One token shuffle; the totals are
    a 1-row broadcast back over the counts table. This synthetic vocabulary
    is small enough to emit fully; at 100 TB you bound the output to the
    top-K tokens by (count, token) — same plan with a TakeOrdered head."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        split_col().alias("split"), F.explode(F.split("text", " ")).alias("token")
    ).where(
        F.col("split").isin("train", "val")
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).cast("long").alias("c_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).cast("long").alias("c_val"),
    )
    totals = counts.agg(
        F.sum("c_train").alias("t_train"), F.sum("c_val").alias("t_val")
    )
    rated = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "c_train",
        "c_val",
        # true integral division (DIV), not double-divide-then-cast: the
        # double quotient can round UP across an integer boundary while
        # DuckDB's // floors exactly. nullif guards the empty-split corpus:
        # under ANSI mode a zero total would raise DIVIDE_BY_ZERO; NULL
        # rates (mirrored by the oracle's NULLIF) are the honest answer
        F.expr("c_train * 1000000 DIV nullif(t_train, 0)").alias("rate_train_ppm"),
        F.expr("c_val * 1000000 DIV nullif(t_val, 0)").alias("rate_val_ppm"),
    )
    return rated.select(
        "token",
        "c_train",
        "c_val",
        "rate_train_ppm",
        "rate_val_ppm",
        F.abs(F.col("rate_train_ppm") - F.col("rate_val_ppm")).alias("drift_ppm"),
    )
