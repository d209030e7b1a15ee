"""Text-analysis operators over the ``documents`` table — the LLM-pipeline
preprocessing surface (token counting, language ID, quality scoring,
fingerprinting). All pure built-in functions (split/regexp/md5/array ops) —
JVM-side, codegen'd, no Python in the hot path; scales linearly with no
shuffle (per-row transforms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

# Marker-token heuristic language ID: per-language function-word lists.
# (Deterministic n-gram/stopword heuristic — the classic fastText-free
# fallback; real corpora would use a trained model via a Pandas UDF.)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "los"],
    "fr": ["le", "la", "les", "des"],
    "de": ["der", "die", "das", "und"],
}


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


def _marker_count(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))


@register(
    "docs_token_stats",
    oracle="""
        SELECT doc_id,
               length(text) AS n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
               len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')) AS type_token_ratio
        FROM documents
    """,
    headline=True,
    tags=("text",),
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: chars, whitespace tokens, vocabulary size,
    type-token ratio. Array ops stay JVM-side (split/array_distinct/size)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct * F.lit(1.0) / n_tokens).alias("type_token_ratio"),
    )


def _lang_oracle() -> str:
    branches = "\n            UNION ALL\n".join(
        f"""SELECT doc_id, lang AS labeled_lang, '{lang}' AS cand,
                   len(regexp_extract_all(text, '\\b({'|'.join(ws)})\\b')) AS sc
            FROM documents"""
        for lang, ws in LANG_MARKERS.items()
    )
    return f"""
        WITH scored AS (
            {branches}
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id ORDER BY sc DESC, cand
                   ) AS rn
            FROM scored
        )
        SELECT doc_id, labeled_lang,
               CASE WHEN sc > 0 THEN cand ELSE 'und' END AS predicted_lang
        FROM ranked WHERE rn = 1
    """


@register("docs_lang_id", oracle=_lang_oracle(), tags=("text", "lang"))
def docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count function-word markers per language, pick
    the argmax (ties broken by language code; no markers -> 'und')."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.array(
            *[
                F.struct(
                    _marker_count(F.col("text"), ws).alias("sc"),
                    F.lit(lang).alias("lg"),
                )
                for lang, ws in LANG_MARKERS.items()
            ]
        ).alias("scores"),
    )
    # argmax with (score desc, lang asc) tiebreak: sort structs on
    # (-score, lang) ascending, take the head.
    neg = F.transform(
        F.col("scores"), lambda s: F.struct((-s["sc"]).alias("nsc"), s["lg"].alias("lg"), s["sc"].alias("sc"))
    )
    best = F.element_at(F.array_sort(neg), 1)
    return scored.select(
        "doc_id",
        "labeled_lang",
        F.when(best["sc"] > 0, best["lg"]).otherwise("und").alias("predicted_lang"),
    )


@register(
    "docs_quality_score",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_nonalpha,
                   len(regexp_extract_all(text, '\\b(the|a|of|and|el|la|de|der|die|und|le|les)\\b')) AS n_stop
            FROM documents
        )
        SELECT doc_id, n_chars, n_tokens,
               n_nonalpha * 1.0 / nullif(n_chars, 0) AS nonalpha_ratio,
               n_stop * 1.0 / n_tokens AS stopword_ratio,
               (n_chars - n_tokens + 1) * 1.0 / n_tokens AS avg_token_len,
               CASE WHEN n_tokens >= 10
                         AND n_nonalpha * 1.0 / nullif(n_chars, 0) < 0.3
                    THEN 'keep' ELSE 'drop' END AS quality_flag
        FROM t
    """,
    tags=("text", "quality"),
)
def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring for corpus filtering: length, punctuation
    ratio, stopword ratio, average token length, keep/drop flag."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = F.size(_tokens(F.col("text")))
    n_nonalpha = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-z0-9 ]"), F.lit(0)))
    n_stop = F.size(
        F.regexp_extract_all(
            F.col("text"),
            F.lit(r"\b(the|a|of|and|el|la|de|der|die|und|le|les)\b"),
            F.lit(0),
        )
    )
    t = d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_nonalpha.alias("n_nonalpha"),
        n_stop.alias("n_stop"),
    )
    return t.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        # try_divide: an EMPTY document has n_chars = 0 — plain division
        # throws under ANSI mode; NULL ratio -> quality_flag 'drop'
        F.try_divide(F.col("n_nonalpha") * 1.0, F.col("n_chars")).alias("nonalpha_ratio"),
        (F.col("n_stop") * 1.0 / F.col("n_tokens")).alias("stopword_ratio"),
        ((F.col("n_chars") - F.col("n_tokens") + 1) * 1.0 / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
        F.when(
            (F.col("n_tokens") >= 10)
            & (F.try_divide(F.col("n_nonalpha") * 1.0, F.col("n_chars")) < 0.3),
            "keep",
        )
        .otherwise("drop")
        .alias("quality_flag"),
    )


@register(
    "docs_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS content_md5,
               ('0x' || substr(md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))), 1, 15))::BIGINT
                   AS fingerprint64
        FROM documents
    """,
    tags=("text", "fingerprint"),
)
def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercase text,
    plus a 60-bit integer fingerprint (first 15 hex chars) for compact
    join/dedup keys at scale."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", " +", " ")))
    digest = F.md5(norm)
    return d.select(
        "doc_id",
        digest.alias("content_md5"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint").alias("fingerprint64"),
    )


# GPT-2-style pre-tokenizer, restricted to syntax valid in BOTH Java regex
# (Spark) and RE2 (DuckDB): no lookahead, no \p classes. Contraction tails,
# space-prefixed letter runs, digit runs, punctuation runs.
# the whitespace class is spelled out EXPLICITLY (not \s): Java's \s
# includes vertical tab \x0B, RE2's does not — an implicit \s silently
# tokenizes VT-adjacent punctuation differently on the two engines
BPE_PATTERN = r"'[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0b']+"


@register(
    "docs_bpe_token_counts",
    oracle=r"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(regexp_extract_all(text, '''[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+'))
                   AS n_bpe_tokens,
               len(regexp_extract_all(text, '''[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+')) * 1.0
                   / len(string_split(text, ' ')) AS tokens_per_word
        FROM documents
    """,
    tags=("text",),
)
def docs_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (the GPT-2 split
    classes minus lookahead, so Java and RE2 agree) next to the whitespace
    count — the cost-estimation primitive of an LLM data pipeline.

    Pure regexp_extract_all/split, JVM-side codegen, zero shuffle; the
    tokens-per-word ratio is one exact int division per row.
    """
    d = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
    ws = F.size(_tokens(F.col("text")))
    return d.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (bpe * F.lit(1.0) / ws).alias("tokens_per_word"),
    )


WINNOW_K = 3   # shingle width (words)
WINNOW_W = 4   # winnowing window (shingle positions)


@register(
    "docs_winnowed_fingerprints",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= {WINNOW_K}
        ),
        grams AS (
            SELECT doc_id, i,
                   ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT AS h,
                   len(w) - {WINNOW_K} + 1 AS n_grams
            FROM toks, UNNEST(range(1, len(w) - {WINNOW_K} + 2)) AS t(i)
        ),
        wins AS (
            SELECT doc_id, i,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp,
                   n_grams
            FROM grams
        ),
        fps AS (
            SELECT DISTINCT doc_id, fp
            FROM wins WHERE i + {WINNOW_W - 1} <= n_grams
        )
        SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fingerprint
        FROM fps GROUP BY doc_id
    """,
    tags=("text", "fingerprint"),
)
def docs_winnowed_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    local fingerprinting algorithm): hash every word-3-gram, slide a window
    of 4 positions, keep each window's minimum hash — guaranteeing any
    shared run of >= k+w-1 words between two documents shares a
    fingerprint, while storing only ~2/(w+1) of the hashes.

    The rolling window is a plain window-function min over shingle
    positions (partitioned per doc — no global ordering), the md5-derived
    hash keeps Spark and DuckDB bit-identical, and the fingerprint SET per
    doc (not the full hash stream) is what an index at 100 TB stores.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).where(
        F.size("w") >= WINNOW_K
    )
    idx = F.explode(F.sequence(F.lit(1), F.size("w") - WINNOW_K + 1)).alias("i")
    gram = F.concat_ws(
        " ",
        F.element_at("w", F.col("i")),
        F.element_at("w", F.col("i") + 1),
        F.element_at("w", F.col("i") + 2),
    )
    grams = toks.select("doc_id", "w", idx).select(
        "doc_id",
        "i",
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint").alias("h"),
        (F.size("w") - WINNOW_K + 1).alias("n_grams"),
    )
    win = (
        W.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(W.currentRow, WINNOW_W - 1)
    )
    fps = (
        grams.select(
            "doc_id", "i", "n_grams", F.min("h").over(win).alias("fp")
        )
        .where(F.col("i") + (WINNOW_W - 1) <= F.col("n_grams"))
        .select("doc_id", "fp")
        .distinct()
    )
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )


# --------------------------------------------------------------------------
# Repetition / quality filters (the Gopher-style repetition suite)
# --------------------------------------------------------------------------
@register(
    "docs_repetition_stats",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        g AS (
            SELECT doc_id, w, len(w) AS n_tokens,
                   CASE WHEN len(w) >= 2
                        THEN list_transform(range(1, len(w)),
                                            i -> w[i] || ' ' || w[i+1])
                        ELSE [] END AS g2
            FROM t
        )
        SELECT doc_id, n_tokens,
               list_max(list_transform(list_distinct(w),
                        x -> len(list_filter(w, t -> t = x)))) * 1.0
                   / n_tokens AS top_word_frac,
               CASE WHEN len(g2) > 0
                    THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2)
                    ELSE 0.0 END AS dup_2gram_frac,
               (list_max(list_transform(list_distinct(w),
                         x -> len(list_filter(w, t -> t = x)))) * 1.0
                   / n_tokens <= 0.2)
               AND (CASE WHEN len(g2) > 0
                         THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2)
                         ELSE 0.0 END <= 0.6) AS keep
        FROM g
    """,
    tags=("text", "quality"),
)
def docs_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): fraction of
    the doc that is its single most frequent word, and the duplicate-2gram
    fraction; ``keep`` applies the filter thresholds (<=0.2 top-word,
    <=0.6 dup-2gram). All higher-order array functions — per-row JVM
    compute, ZERO shuffle; the per-row cost is O(tokens * distinct) which
    is bounded by document length, not corpus size."""
    d = load_table(spark, sf_dir, "documents")
    w = _tokens(F.col("text"))
    n = F.size(w)
    top_count = F.array_max(
        F.transform(F.array_distinct(w), lambda x: F.size(F.filter(w, lambda t: t == x)))
    )
    top_word_frac = top_count * F.lit(1.0) / n
    g2 = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_2gram_frac = F.when(
        F.size(g2) > 0, F.lit(1.0) - F.size(F.array_distinct(g2)) * F.lit(1.0) / F.size(g2)
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        top_word_frac.alias("top_word_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
        ((top_word_frac <= 0.2) & (dup_2gram_frac <= 0.6)).alias("keep"),
    )


# --------------------------------------------------------------------------
# TF-IDF top terms per document
# --------------------------------------------------------------------------
@register(
    "docs_tfidf_top_terms",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        toks AS (
            SELECT doc_id, len(w) AS n_tokens, u.term AS term
            FROM t, UNNEST(w) AS u(term)
        ),
        tf AS (
            SELECT doc_id, term, n_tokens, count(*) AS c
            FROM toks GROUP BY doc_id, term, n_tokens
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS n_docs_with
            FROM toks GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round((tf.c * 1.0 / tf.n_tokens)
                         * ln(n.n_docs * 1.0 / df.n_docs_with), 6) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term
                   ) AS rank
            FROM scored
        )
        SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
    """,
    tags=("text", "agg", "window"),
)
def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms. Plan: one explode -> (doc, term)
    count aggregation; document frequency is a second aggregation of the
    SAME exchange (AQE reuse); idf is a broadcast join (the vocabulary is
    tiny here and df-capped in any real corpus); per-doc ranking is a
    bounded window. Rounded to 6 before ranking so ordering is stable
    across engines."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar; one cheap job on the dimension-free count
    toks = d.select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.explode(_tokens(F.col("text"))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "n_tokens", "term").agg(F.count(F.lit(1)).alias("c"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("n_docs_with"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(
            (F.col("c") * F.lit(1.0) / F.col("n_tokens"))
            * F.log(F.lit(float(n_docs)) / F.col("n_docs_with")),
            6,
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


# --------------------------------------------------------------------------
# Corpus vocabulary / Zipf profile
# --------------------------------------------------------------------------
@register(
    "corpus_vocabulary",
    oracle="""
        WITH t AS (
            SELECT string_split(replace(text, chr(10), ' '), ' ') AS w
            FROM documents
        ),
        toks AS (SELECT u.term FROM t, UNNEST(w) AS u(term)),
        counts AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM toks GROUP BY term
        )
        SELECT term, n_occurrences,
               CAST(row_number() OVER (
                   ORDER BY n_occurrences DESC, term) AS BIGINT) AS rank,
               round(CAST(sum(n_occurrences) OVER (
                         ORDER BY n_occurrences DESC, term
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / (SELECT sum(n_occurrences) FROM counts), 6)
                   AS cum_share
        FROM counts
    """,
    tags=("text", "agg", "window"),
)
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary with occurrence counts, frequency rank, and
    cumulative corpus share — the Zipf profile a tokenizer-training or
    stopword-selection pass starts from.

    Plan shape: explode -> partial-aggregated groupBy(term) — map-side
    combine collapses the per-partition token stream to vocabulary-sized
    state before the one shuffle. The ranking window is UNPARTITIONED,
    which is safe ONLY because its input is the post-aggregation
    vocabulary, already many orders of magnitude smaller than the corpus
    (vocabulary grows ~ O(corpus^0.5) by Heaps' law); the corpus-sized
    stream never sees a single-partition window. The grand total reuses
    the same window order, so no second scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.regexp_replace("text", "\n", " "), " ")).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_occurrences"))
    w = W.orderBy(F.col("n_occurrences").desc(), "term")
    total = W.partitionBy()  # grand total over the vocab-sized aggregate
    return counts.select(
        "term",
        "n_occurrences",
        F.row_number().over(w).cast("long").alias("rank"),
        F.round(
            F.sum("n_occurrences").over(w.rowsBetween(W.unboundedPreceding, 0))
            / F.sum("n_occurrences").over(total),
            6,
        ).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# Per-source quality dashboard
# --------------------------------------------------------------------------
from . import lm as _lm  # noqa: E402  (dashboard oracle nests the LM oracle)


def _source_dashboard_oracle() -> str:
    from ..plans.registry import QUERIES

    q = QUERIES["docs_quality_score"].oracle
    l = QUERIES["docs_bigram_lm_score"].oracle
    return f"""
        WITH q AS ({q}), l AS ({l})
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(q.nonalpha_ratio), 6) AS avg_nonalpha_ratio,
               round(avg(q.stopword_ratio), 6) AS avg_stopword_ratio,
               round(avg(CASE WHEN q.quality_flag = 'keep'
                              THEN 1.0 ELSE 0.0 END), 6) AS keep_share,
               round(avg(l.avg_logp), 6) AS avg_lm_logp
        FROM documents d
        JOIN q ON d.doc_id = q.doc_id
        LEFT JOIN l ON d.doc_id = l.doc_id
        GROUP BY d.source
    """


@register(
    "source_quality_dashboard",
    oracle=_source_dashboard_oracle(),
    tags=("text", "quality", "dashboard"),
)
def source_quality_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-quality rollup — the dashboard a corpus curator
    watches: document counts, heuristic quality ratios, keep share, and
    mean LM log-likelihood per ingestion source.

    Pure composition of REGISTERED operators (same plans, same oracle
    texts nested), joined back to the source column and rolled up to one
    row per source. Both joins key on doc_id (the quality join is 1:1,
    the LM join left — short docs have no bigram score and avg() skips
    their nulls in both engines); the final aggregate is source-sized."""
    from ..operators.lm import docs_bigram_lm_score

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = docs_quality_score(spark, sf_dir).select(
        "doc_id", "nonalpha_ratio", "stopword_ratio", "quality_flag"
    )
    l = docs_bigram_lm_score(spark, sf_dir).select("doc_id", "avg_logp")
    return (
        d.join(q, "doc_id")
        .join(l, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("nonalpha_ratio"), 6).alias("avg_nonalpha_ratio"),
            F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
            F.round(
                F.avg(F.when(F.col("quality_flag") == "keep", 1.0).otherwise(0.0)), 6
            ).alias("keep_share"),
            F.round(F.avg("avg_logp"), 6).alias("avg_lm_logp"),
        )
    )


HASH_DIM = 64  # feature-hashing target dimensionality (matches embeddings dim)


@register(
    "docs_feature_hash_vectors",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT % {HASH_DIM} AS dim,
                   CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT // {HASH_DIM}) % 2 = 0
                        THEN 1 ELSE -1 END AS s
            FROM toks
        )
        SELECT doc_id, CAST(dim AS INT) AS dim, sum(s)::BIGINT AS weight
        FROM hashed
        GROUP BY doc_id, dim
    """,
    tags=("text", "featurize", "embeddings"),
)
def docs_feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free text featurization via the signed hashing trick
    (Weinberger et al., "Feature Hashing for Large Scale Multitask
    Learning", ICML 2009): every token lands in dimension md5(token) mod
    HASH_DIM with a hash-derived ±1 sign, and a document's vector is the
    signed term-frequency sum — sparse long-form (doc_id, dim, weight)
    rows, ready to densify into array columns for the similarity tier
    when no learned embedding model is available (inner products of these
    vectors are unbiased estimates of term-overlap kernels, which is what
    makes the trick sound). All arithmetic is integral, so the oracle gate
    is exact; one token-explode scan plus one (doc, dim) map-side-combined
    aggregation — the same scan shape as docs_token_stats, no UDF.

    At 100 TB: the explode is scan-bound and the aggregate's key space is
    |docs| x HASH_DIM, shuffled once; densification (collect_list over 64
    dims) stays per-doc. Raising HASH_DIM trades collision bias for width
    with no plan change."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    hashed = toks.select("doc_id", h.alias("h")).select(
        "doc_id",
        F.pmod("h", F.lit(HASH_DIM)).cast("int").alias("dim"),
        F.when(F.pmod(F.expr(f"h div {HASH_DIM}"), 2) == 0, 1).otherwise(-1).alias("s"),
    )
    return hashed.groupBy("doc_id", "dim").agg(F.sum("s").cast("long").alias("weight"))


# --------------------------------------------------------------------------
# Text normalization — the cleaning pass before tokenization/dedup
# --------------------------------------------------------------------------

# Dialect-portable patterns (same discipline as operators/pii.py): literal
# classes, +, hex escapes — identical semantics in Java regex and RE2.
_WS_RUN_RE = r"[ \t\n\r]+"
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


@register(
    "docs_normalize_text",
    oracle=f"""
        WITH cleaned AS (
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(text, '{_CTRL_RE}', '', 'g'),
                       '{_WS_RUN_RE}', ' ', 'g')) AS clean_text,
                   length(text) AS n_chars_before,
                   len(regexp_extract_all(text, '{_WS_RUN_RE}')) AS n_ws_runs
            FROM documents
            WHERE text IS NOT NULL
        )
        SELECT doc_id, clean_text,
               CAST(n_chars_before AS BIGINT) AS n_chars_before,
               CAST(length(clean_text) AS BIGINT) AS n_chars_after,
               CAST(n_ws_runs AS BIGINT) AS n_ws_runs
        FROM cleaned
    """,
    tags=("text", "quality"),
)
def docs_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/control normalization — the cleaning pass every public
    pipeline (CCNet, Dolma, RefinedWeb) runs before tokenization and
    dedup: strip non-printing control characters, collapse whitespace
    runs (spaces/tabs/newlines) to single spaces, trim, and report the
    before/after character counts plus how many runs collapsed (the
    boilerplate signal — HTML-extracted text is full of them).

    Plan: pure map-side codegen'd regexp_replace — zero shuffle, the
    ideal scan-bound 100 TB regime (same posture as the PII scrub, whose
    dialect-portable regex discipline these patterns follow: literal
    classes and hex escapes only, identical in Java regex and RE2).
    NULL text is excluded on both engines (nothing to normalize; the
    WHERE mirrors)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    cleaned = d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _CTRL_RE, ""), _WS_RUN_RE, " "
            )
        ).alias("clean_text"),
        F.length("text").cast("long").alias("n_chars_before"),
        F.regexp_count(F.col("text"), F.lit(_WS_RUN_RE)).cast("long").alias("n_ws_runs"),
    )
    return cleaned.select(
        "doc_id",
        "clean_text",
        "n_chars_before",
        F.length("clean_text").cast("long").alias("n_chars_after"),
        "n_ws_runs",
    )
