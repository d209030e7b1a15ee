"""Exact-substring (token-span) deduplication over the ``documents`` table.

The sub-document exact-dedup tier of an LLM data pipeline (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better"): two documents
are related if they share an exact run of SPAN consecutive tokens. The
reference engine has no sub-document dedup (its dedup is row-level,
reference: etl-s3-processed-to-redshift.py:55-63); this extends the same
latest-wins idea down to span granularity, which is what matters for
training-corpus contamination.

Spark-first shape (NOT a suffix array — that needs a global sort of every
corpus position; the fixed-width span digest gets the same cross-doc exact
matches with a plain equi-join):

  1. per row, enumerate the SPAN-token sliding windows with
     ``transform(sequence(...))`` — JVM higher-order functions, zero
     shuffle, output bounded by tokens-per-doc;
  2. hash each window to a 16-byte md5 digest and ``array_distinct`` it
     BEFORE the explode, so a doc repeating its own span contributes one
     candidate row, keeping the exchange narrow;
  3. one shuffle groups digests to compute document frequency; spans with
     df < 2 (unique — the overwhelming majority) are dropped, spans with
     df > DF_CAP (boilerplate-hot: licence headers, navigation chrome) are
     excluded from PAIR generation, exactly like the df-cap skew guard in
     ``dedup.docs_ngram_jaccard_pairs`` — a hot span with df=10^6 would
     otherwise emit 10^12 pairs out of one reduce key;
  4. the surviving (span, doc) rows self-join on the digest — an equi-join
     whose per-key fan-out is bounded by DF_CAP**2.

At 100 TB the only wide ops are the digest groupBy and the bounded
self-join; both shuffle 16-byte keys, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table, spread

SPAN = 8      # tokens per window (Lee et al. use 50 BPE tokens at web scale)
DF_CAP = 64   # pair generation skipped for spans hotter than this


def _span_digests(d: DataFrame) -> DataFrame:
    """(doc_id, span_h) — per-doc-distinct md5 digests of every SPAN-token
    sliding window. Newlines are normalized to spaces so a span crossing a
    line break still matches its single-line twin."""
    w = F.split(F.regexp_replace("text", "\n", " "), " ")
    digests = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(SPAN - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(w, i, SPAN))),
        )
    )
    return (
        spread(d)  # md5-window expansion is ~50x the input: parallelize first
        .where(F.size(w) >= SPAN)  # guard: sequence(1, n-7) needs n >= SPAN
        .select("doc_id", F.explode(digests).alias("span_h"))
    )


_ORACLE_SPANS = f"""
        t AS (
            SELECT doc_id,
                   string_split(replace(text, chr(10), ' '), ' ') AS w
            FROM documents
        ),
        s AS (
            SELECT DISTINCT doc_id,
                   md5(array_to_string(w[g.i:g.i + {SPAN - 1}], ' ')) AS span_h
            FROM t, UNNEST(range(1, len(w) - {SPAN - 2})) AS g(i)
            WHERE len(w) >= {SPAN}
        )
"""


@register(
    "docs_duplicate_span_pairs",
    oracle=f"""
        WITH {_ORACLE_SPANS},
        f AS (
            SELECT span_h FROM s
            GROUP BY span_h HAVING count(*) BETWEEN 2 AND {DF_CAP}
        ),
        e AS (SELECT s.doc_id, s.span_h FROM s JOIN f USING (span_h))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(DISTINCT a.span_h) AS n_shared_spans
        FROM e a JOIN e b ON a.span_h = b.span_h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """,
    headline=True,
    tags=("dedup", "text"),
)
def docs_duplicate_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= 1 exact SPAN-token run, with the count of
    distinct shared spans — the exact-substring dedup candidate set.

    Single-digest-pass shape (the docs_duplicate_span_stats window idiom):
    annotate each (doc, span) row with its span's document frequency via
    `count() OVER (PARTITION BY span_h)` — ONE span_h exchange — then
    self-join the df-filtered rows on span_h. The previous 3-subtree form
    (df aggregate + two join branches, the aggregate BROADCAST into each)
    enumerated the md5 windows once per branch (pruned projections differ,
    so no exchange reuse: 4 scans / 4 spread exchanges / 2 identical df
    aggregations in the static plan) and ended in a BroadcastHashJoin
    whose build side was the CORPUS-sized shared-span table — a driver
    OOM at 100 TB. Now both self-join sides hang off the one window
    exchange (AQE ReusedExchange, pinned in tests/test_plan_shapes.py)
    and the pair join is a plain equi-join keyed by the exchange's own
    partitioning. The window buffers one span group at a time (spillable,
    bounded by the hottest span's df — the span_stats disposition).

    n_shared_spans is count(*), not count(DISTINCT): (doc_id, span_h)
    rows are unique by construction (array_distinct before the explode),
    so every joined (doc_a, doc_b, span_h) row is distinct — identical
    result without the two-phase distinct aggregation (oracle unchanged,
    hash-verified)."""
    from pyspark.sql import Window as W

    spans = _span_digests(load_table(spark, sf_dir, "documents"))
    shared = (
        spans.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("span_h"))
        )
        .where((F.col("df") >= 2) & (F.col("df") <= DF_CAP))
        .select("doc_id", "span_h")
    )
    a = shared.alias("a")
    b = shared.alias("b")
    return (
        a.join(b, "span_h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
    )


@register(
    "docs_duplicate_span_stats",
    oracle=f"""
        WITH {_ORACLE_SPANS},
        f AS (
            SELECT span_h FROM s GROUP BY span_h HAVING count(*) >= 2
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_spans FROM s GROUP BY doc_id
        ),
        dup_per_doc AS (
            SELECT s.doc_id, count(*) AS n_dup_spans
            FROM s JOIN f USING (span_h) GROUP BY s.doc_id
        )
        SELECT p.doc_id, p.n_spans,
               coalesce(d.n_dup_spans, 0) AS n_dup_spans,
               round(coalesce(d.n_dup_spans, 0) * 1.0 / p.n_spans, 6)
                   AS dup_span_frac
        FROM per_doc p LEFT JOIN dup_per_doc d USING (doc_id)
    """,
    tags=("dedup", "text", "quality"),
)
def docs_duplicate_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination signal: how many of its distinct
    SPAN-token windows also occur in some other document (no DF_CAP here —
    this is a groupBy, not pair generation, so hot spans cost nothing).
    Docs shorter than SPAN tokens have no windows and are excluded, same
    as the oracle.

    Single-pass shape: annotating each (doc, span) row with its span's
    document frequency via `count() OVER (PARTITION BY span_h)` needs ONE
    span_h shuffle and keeps doc_id on the row, so the per-doc rollup is a
    plain second aggregation — the naive 3-subtree form (freq + join +
    per-doc count) re-ran the md5 window enumeration three times with zero
    exchange reuse (pruned projections differ). The window buffers one
    span-group at a time (spillable; bounded by the hottest span's df)."""
    from pyspark.sql import Window as W

    spans = _span_digests(load_table(spark, sf_dir, "documents"))
    with_df = spans.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("span_h"))
    )
    n_dup = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("long")
    return (
        with_df.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            n_dup.alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.round(F.col("n_dup_spans") * F.lit(1.0) / F.col("n_spans"), 6).alias(
                "dup_span_frac"
            ),
        )
    )


CHUNK_TOKENS = 32   # tokens per chunk
CHUNK_STRIDE = 24   # 8-token overlap between consecutive chunks


@register(
    "docs_chunk_fixed_tokens",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   string_split(replace(text, chr(10), ' '), ' ') AS w
            FROM documents
        )
        SELECT doc_id,
               CAST((g.i - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(least({CHUNK_TOKENS}, len(w) - g.i + 1) AS BIGINT)
                   AS n_tokens,
               md5(array_to_string(
                   w[g.i:g.i + {CHUNK_TOKENS - 1}], ' ')) AS chunk_hash
        FROM t, UNNEST(range(1, len(w) + 1, {CHUNK_STRIDE})) AS g(i)
        WHERE len(w) >= 1
    """,
    tags=("text", "chunking"),
)
def docs_chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (32-token windows, stride
    24) — how a pretraining/RAG pipeline splits long documents into
    model-sized pieces while overlapping 8 tokens so no boundary context
    is lost. Emits (doc_id, chunk_idx, n_tokens, chunk_hash); the final
    partial chunk is kept (standard chunker behavior), and a doc shorter
    than one window is a single chunk.

    Same zero-shuffle shape as the span digests: per-row window
    enumeration with transform(sequence(...)), md5 over concat_ws, one
    explode — output is ~tokens/stride rows per doc, all computed where
    the row lives. spread() parallelizes under-split scans."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.regexp_replace("text", "\n", " "), " ")
    starts = F.sequence(F.lit(1), F.size(w), F.lit(CHUNK_STRIDE))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            ((i - 1) / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.least(F.lit(CHUNK_TOKENS), F.size(w) - i + 1).cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.slice(w, i, CHUNK_TOKENS))).alias("chunk_hash"),
        ),
    )
    return (
        spread(d)
        .where(F.size(w) >= 1)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_hash")
    )
