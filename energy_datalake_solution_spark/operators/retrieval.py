"""Sparse retrieval and data-selection operators over ``documents``.

Two classic large-corpus operators the LLM-data tier still lacked:

  * **BM25 top-k retrieval** (Robertson & Zaragoza 2009, "The
    Probabilistic Relevance Framework: BM25 and Beyond") — the standard
    lexical ranking function, used in training-data pipelines for
    benchmark decontamination sweeps and retrieval-augmented filtering.
  * **DSIR importance weights** (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") — per-document
    log-likelihood ratios between a target-domain and a raw-corpus
    hashed-n-gram model; sampling proportionally to these weights tilts a
    100 TB crawl toward a target distribution without training a model.

The reference has no text tier at all (its documents never leave S3
verbatim — reference: glue_jobs/dynamic-data-processor.py); both operators
are north-star surface like the rest of operators/text.py.

Scale shape (both): one corpus explode scan, model-sized aggregate state
(query-term postings / 256 hash buckets), broadcast model join back onto
the stream, one final per-key shuffle. No UDFs — everything is built-in
split/md5/higher-order functions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table, spread

# --------------------------------------------------------------------------
# BM25 top-k retrieval
# --------------------------------------------------------------------------

# Fixed query workload (terms drawn from the synthetic corpus vocabulary).
# A production pipeline would broadcast a benchmark's query set the same
# way — the shape only requires the query list to be executor-broadcastable.
BM25_QUERIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("q_hash_join", ("hash", "join")),
    ("q_window_agg", ("window", "agg")),
    ("q_customer_order", ("customer", "order", "value")),
    ("q_slow_scan", ("slow", "scan")),
    ("q_spark_partition", ("spark", "table", "partition")),
)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def _bm25_query_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{term}')" for qid, terms in BM25_QUERIES for term in terms
    )
    return f"(VALUES {rows})"


@register(
    "docs_bm25_topk",
    oracle=f"""
        WITH queries(query_id, term) AS {_bm25_query_values_sql()},
        t AS (
            SELECT doc_id,
                   string_split(replace(text, chr(10), ' '), ' ') AS w
            FROM documents
        ),
        stats AS (
            SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM t
        ),
        toks AS (
            SELECT doc_id, len(w) AS dl, u.term
            FROM t, UNNEST(w) AS u(term)
        ),
        matched AS (SELECT * FROM toks WHERE term IN (SELECT term FROM queries)),
        tf AS (
            SELECT doc_id, dl, term, count(*) AS tf
            FROM matched GROUP BY doc_id, dl, term
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df
            FROM matched GROUP BY term
        ),
        scored AS (
            SELECT q.query_id, tf.doc_id,
                   round(sum(
                       ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                       * tf.tf * ({BM25_K1} + 1)
                       / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                          + {BM25_B} * tf.dl / stats.avgdl))
                   ), 6) AS bm25
            FROM tf
            JOIN queries q USING (term)
            JOIN df USING (term)
            CROSS JOIN stats
            GROUP BY q.query_id, tf.doc_id
        )
        SELECT query_id, doc_id, bm25,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY bm25 DESC, doc_id
            ) AS rank
            FROM scored
        )
        WHERE rank <= {BM25_TOPK}
    """,
    tags=("text", "retrieval", "window"),
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per query under BM25 (k1=1.2, b=0.75), with
    Robertson's ln(1 + (N - df + .5)/(df + .5)) idf.

    Plan: the corpus token stream is FILTERED to query-vocabulary terms
    BEFORE any aggregation (an IN-list of literals, pushed into the scan
    stage), so postings, tf, and df aggregates are all sized by query-term
    matches, not the corpus. N and avgdl are one cheap full-scan aggregate
    (two scalars, computed driver-side — same precedent as the tfidf
    n_docs count). Query terms join as a broadcast literal frame; scoring
    is a matched-postings-sized groupBy((query, doc)); the top-k window
    partitions by query over score-sorted candidates. Scores are rounded
    to 6 BEFORE ranking so ordering is stable across engines.

    At 100 TB: the only corpus-sized work is the scan+explode (scan-bound,
    the best available regime); everything downstream is proportional to
    documents actually containing query terms. A benchmark-decontamination
    sweep with thousands of queries keeps the same plan — the query frame
    stays broadcast-sized and the matched-postings shuffle grows with true
    match volume only."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.regexp_replace("text", "\n", " "), " ")
    docs = d.select("doc_id", w.alias("w"))

    # Two scalars over one scan — model-sized driver pull (precedent:
    # docs_tfidf_top_terms' n_docs count). avgdl is NULL on an empty
    # corpus (empty-lake sweep); any positive stand-in keeps the plan
    # valid — every downstream frame is already empty.
    n_docs, avgdl = docs.agg(
        F.count(F.lit(1)), F.avg(F.size("w"))
    ).first()
    avgdl = float(avgdl) if avgdl else 1.0

    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id string, term string",
    )
    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})

    toks = (
        spread(docs)  # explode fans out ~100x per row: parallelize first
        .select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("term"))
        .where(F.col("term").isin(all_terms))  # literal IN-list, scan-stage
    )
    tf = toks.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))

    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (
        F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(float(avgdl)))
        )
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )
    rank_w = W.partitionBy("query_id").orderBy(F.col("bm25").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .where(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "bm25", "rank")
    )


# --------------------------------------------------------------------------
# DSIR importance weights
# --------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed-bigram feature space (Xie et al. use 10k; the
# bucket count only scales the broadcast model table, not the plan)
DSIR_TARGET_LANG = "en"  # target domain: English documents


@register(
    "docs_dsir_weights",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   string_split(replace(text, chr(10), ' '), ' ') AS w
            FROM documents
        ),
        b AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(w[g.i] || ' ' || w[g.i + 1]), 1, 15))::BIGINT
                       % {DSIR_BUCKETS} AS bucket
            FROM t, UNNEST(range(1, len(w))) AS g(i)
            WHERE len(w) >= 2
        ),
        model AS (
            SELECT bucket,
                   count(*) AS c_r,
                   sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS c_t
            FROM b GROUP BY bucket
        ),
        tot AS (SELECT sum(c_r) AS t_r, sum(c_t) AS t_t FROM model),
        scored AS (
            SELECT b.doc_id,
                   ln((model.c_t + 1.0) / (tot.t_t + {DSIR_BUCKETS}))
                   - ln((model.c_r + 1.0) / (tot.t_r + {DSIR_BUCKETS})) AS llr
            FROM b JOIN model USING (bucket) CROSS JOIN tot
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_features,
               round(avg(llr), 6) AS dsir_weight
        FROM scored GROUP BY doc_id
    """,
    headline=True,
    tags=("text", "selection", "featurize"),
)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight: the mean log-likelihood ratio
    of the document's hashed-bigram features under a Laplace-smoothed
    target-domain unigram-over-buckets model vs the raw-corpus model
    (Xie et al. 2023; target domain here = ``lang = 'en'`` documents,
    the stand-in for "looks like my curated set"). Sampling documents with
    probability proportional to exp(weight) performs the paper's
    importance resampling; the weight column alone already ranks documents
    by target-domain affinity.

    Feature hashing reuses the engine's md5 convention
    (docs_feature_hash_vectors): bucket = md5(w1 ' ' w2) mod 256, exact
    in both engines. Plan: one explode scan producing (doc, bucket,
    is-target) rows — the target indicator is a PER-ROW predicate on
    ``lang``, so no join touches the corpus; the model is a 256-row
    groupBy(bucket) aggregate whose totals fold in via an unpartitioned
    window over the model table (safe: model-sized, precedent
    corpus_vocabulary); scoring joins the stream to the BROADCAST model
    and aggregates per doc_id — one corpus shuffle total. avg() of f64
    logs is order-insensitive at round(6).

    At 100 TB: model state is O(DSIR_BUCKETS) regardless of corpus size;
    the per-doc aggregate is the same map-side-combined shape as
    docs_token_stats. Raising the bucket count to the paper's 10k changes
    only the broadcast table's size."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.regexp_replace("text", "\n", " "), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    b = (
        spread(d)  # bigram fan-out ~100x per row: parallelize first
        .where(F.size(w) >= 2)
        .select(
            "doc_id",
            (F.col("lang") == DSIR_TARGET_LANG).alias("is_target"),
            F.explode(bigrams).alias("bigram"),
        )
        .select(
            "doc_id",
            "is_target",
            F.pmod(
                F.conv(F.substring(F.md5("bigram"), 1, 15), 16, 10).cast("bigint"),
                F.lit(DSIR_BUCKETS),
            ).alias("bucket"),
        )
    )
    model = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
    )
    tot = W.partitionBy()  # totals over the 256-row model table
    llr_model = model.select(
        "bucket",
        (
            F.log(
                (F.col("c_t") + 1.0)
                / (F.sum("c_t").over(tot) + F.lit(float(DSIR_BUCKETS)))
            )
            - F.log(
                (F.col("c_r") + 1.0)
                / (F.sum("c_r").over(tot) + F.lit(float(DSIR_BUCKETS)))
            )
        ).alias("llr"),
    )
    return (
        b.join(F.broadcast(llr_model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.round(F.avg("llr"), 6).alias("dsir_weight"),
        )
    )
