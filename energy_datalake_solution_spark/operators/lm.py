"""Corpus n-gram language-model operators over ``documents``.

The CCNet-style quality tier of an LLM data pipeline (Wenzek et al. 2019):
train a small LM on the corpus, score every document's per-token
log-likelihood, and filter/bucket on the score. Real CCNet uses a KenLM
5-gram; the engine-shaped part — and what this module implements — is the
distributed counting, smoothing, broadcast-scoring pipeline, here with a
bigram LM so the whole thing stays SQL-expressible and oracle-checkable.

The reference has no text tier at all (its documents never leave S3
verbatim, reference: dynamic-data-processor.py); this is north-star
surface, same as operators/text.py.

Scale shape:
  * bigram extraction is a per-row higher-order transform (zero shuffle)
    followed by one explode;
  * C(w1,w2) and C(w1) are partial-aggregated groupBys — the token stream
    collapses map-side to aggregate state far smaller than the corpus.
    VOCAB is O(corpus^beta), beta~0.5 by Heaps' law, but bigram TYPES do
    NOT enjoy the same bound — distinct pairs grow near-linearly in corpus
    size for web text, so at 100 TB the pair table is billions of rows and
    past any broadcast/driver limit;
  * scoring therefore joins the corpus-sized bigram stream to the
    probability table with a SIZE-GUARDED strategy: broadcast hash join
    while the model fits (<= MAX_BROADCAST_LM_ROWS pairs, counted on the
    already-checkpointed pair table — one cheap metadata-ish job), else a
    shuffle hash join on (w1, w2), which is the correct plan for a
    model table too big to ship to every executor. The Pandas-kernel and
    streaming paths, which materialize the model as a Python dict, REFUSE
    above the same threshold rather than silently OOM the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table, spread

ADD_K = 0.1  # add-k smoothing mass

# Guard for every path that treats the bigram model as "small": broadcast
# scoring join, driver-side dict for the Pandas kernel, streaming closure.
# 20M pairs x ~40 B/row ~ 800 MB serialized — the practical ceiling for a
# broadcast table / driver pull on a mid-sized driver. Above it the JVM
# path degrades gracefully to a shuffle hash join; the dict paths raise.
MAX_BROADCAST_LM_ROWS = 20_000_000


def _doc_bigrams(d: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, newline-
    normalized; docs with < 2 tokens contribute nothing."""
    w = F.split(F.regexp_replace("text", "\n", " "), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.struct(
            F.element_at(w, i).alias("w1"), F.element_at(w, i + 1).alias("w2")
        ),
    )
    return (
        spread(d)  # pair expansion is ~50x the input: parallelize first
        .where(F.size(w) >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


_ORACLE_BIGRAMS = """
        t AS (
            SELECT doc_id,
                   string_split(replace(text, chr(10), ' '), ' ') AS w
            FROM documents
        ),
        bg AS (
            SELECT doc_id, w[g.i] AS w1, w[g.i + 1] AS w2
            FROM t, UNNEST(range(1, len(w))) AS g(i)
            WHERE len(w) >= 2
        )
"""


@register(
    "corpus_bigram_merge_candidates",
    oracle=f"""
        WITH {_ORACLE_BIGRAMS},
        counts AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM bg GROUP BY w1, w2
        )
        SELECT w1, w2, n_occurrences,
               CAST(row_number() OVER (
                   ORDER BY n_occurrences DESC, w1, w2) AS BIGINT) AS rank
        FROM counts
        QUALIFY rank <= 20
    """,
    tags=("text", "tokenizer", "agg"),
)
def corpus_bigram_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent token pairs by corpus frequency — the first merge
    iteration of BPE tokenizer training (Sennrich et al. 2016): the
    highest-count pair is the next merge rule. One explode, one
    partial-aggregated groupBy; the global rank window runs on the
    model-sized pair table, never the token stream."""
    bg = _doc_bigrams(load_table(spark, sf_dir, "documents"))
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_occurrences"))
    w = W.orderBy(F.col("n_occurrences").desc(), "w1", "w2")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 20)
    )


@register(
    "docs_bigram_lm_score",
    oracle=f"""
        WITH {_ORACLE_BIGRAMS},
        c12 AS (
            SELECT w1, w2, count(*) AS c_pair FROM bg GROUP BY w1, w2
        ),
        c1 AS (
            SELECT w1, count(*) AS c_ctx FROM bg GROUP BY w1
        ),
        v AS (
            SELECT count(*) AS vocab FROM (
                SELECT w1 AS term FROM c12 UNION SELECT w2 FROM c12
            )
        ),
        lm AS (
            SELECT c12.w1, c12.w2,
                   ln((c_pair + {ADD_K}) / (c_ctx + {ADD_K} * vocab)) AS logp
            FROM c12 JOIN c1 USING (w1) CROSS JOIN v
        )
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(lm.logp), 6) AS avg_logp
        FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
        GROUP BY bg.doc_id
    """,
    headline=True,
    tags=("text", "quality", "lm"),
)
def docs_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-likelihood under an add-k-smoothed
    corpus bigram LM — the CCNet quality signal (low avg_logp = unusual
    token sequences = boilerplate/garble candidates).

    P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k*V). The LM (pair counts joined
    to context counts, vocab scalar folded in) is BROADCAST to the scoring
    join while it fits (<= MAX_BROADCAST_LM_ROWS distinct pairs — checked
    with a count on the checkpointed pair table, NOT assumed: bigram types
    grow near-linearly in corpus size, unlike Heaps-bounded vocab), else
    the scoring join falls back to a shuffle hash join on (w1, w2) — same
    results, one extra shuffle of the bigram stream. Every in-corpus
    bigram has c_pair >= 1 by construction, so the inner scoring join is
    lossless. avg() of float64 logs is order-insensitive at round(6)
    (per-doc sums are hundreds of terms; fp spread is ~1e-13 relative)."""
    d = load_table(spark, sf_dir, "documents")
    bg = _doc_bigrams(d)
    # The pair table feeds THREE consumers (context rollup, vocab count,
    # scoring join) and is MODEL-sized — checkpoint it so the corpus-sized
    # bigram aggregation underneath runs exactly once (the tiny-subtree
    # localCheckpoint pattern, same as the simhash fingerprint table)
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .localCheckpoint(eager=False)
    )
    # C(w1) = sum_w2 C(w1,w2): roll up the MODEL-sized pair table instead
    # of re-aggregating the corpus-sized bigram stream a second time
    c1 = c12.groupBy("w1").agg(F.sum("c_pair").alias("c_ctx"))
    # model vocabulary = distinct words appearing in any bigram — derived
    # from the pair table, not a third corpus pass; tokens of bigram-less
    # singleton docs are outside the model by definition (those docs are
    # never scored). ONE job computes vocab AND the broadcast-guard pair
    # count: exploding (w1, w2) yields exactly two rows per pair, so
    # count(*)/2 is the pair count and count_distinct(term) the vocab —
    # previously two separate driver-blocking jobs (union-distinct-count
    # + c12.count()), i.e. two passes over the checkpointed model table.
    _row = (
        c12.select(F.explode(F.array("w1", "w2")).alias("term"))
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
            F.count_distinct("term").alias("vocab"),
        )
        .first()
    )
    n_pairs, vocab = _row["n_pairs"], _row["vocab"]
    lm = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.log(
            (F.col("c_pair") + F.lit(ADD_K))
            / (F.col("c_ctx") + F.lit(ADD_K) * F.lit(float(vocab)))
        ).alias("logp"),
    )
    # Broadcast only if the model actually fits (counted, not assumed —
    # n_pairs comes from the same single stats job as vocab above).
    # Oversized model => shuffle hash join: the bigram stream shuffles on
    # (w1, w2) instead of shipping the model everywhere. Identical rows.
    if n_pairs <= MAX_BROADCAST_LM_ROWS:
        lm = F.broadcast(lm)
    else:
        lm = lm.hint("shuffle_hash")
    return (
        bg.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("avg_logp"),
        )
    )


@register(
    "docs_lm_quality_buckets",
    oracle=f"""
        WITH {_ORACLE_BIGRAMS},
        c12 AS (
            SELECT w1, w2, count(*) AS c_pair FROM bg GROUP BY w1, w2
        ),
        c1 AS (
            SELECT w1, sum(c_pair) AS c_ctx FROM c12 GROUP BY w1
        ),
        v AS (
            SELECT count(*) AS vocab FROM (
                SELECT w1 AS term FROM c12 UNION SELECT w2 FROM c12
            )
        ),
        lm AS (
            SELECT c12.w1, c12.w2,
                   ln((c_pair + {ADD_K}) / (c_ctx + {ADD_K} * vocab)) AS logp
            FROM c12 JOIN c1 USING (w1) CROSS JOIN v
        ),
        scored AS (
            SELECT bg.doc_id, round(avg(lm.logp), 6) AS avg_logp
            FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
            GROUP BY bg.doc_id
        ),
        bucketed AS (
            SELECT doc_id, avg_logp,
                   ntile(5) OVER (ORDER BY avg_logp DESC, doc_id) AS bucket
            FROM scored
        )
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               round(min(avg_logp), 6) AS min_logp,
               round(max(avg_logp), 6) AS max_logp
        FROM bucketed GROUP BY bucket
    """,
    tags=("text", "quality", "lm", "window"),
)
def docs_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-score quality quintiles — the bucket boundaries a CCNet-style
    head/middle/tail split publishes. Composes `docs_bigram_lm_score` with
    an NTILE window; the window input is one row per DOCUMENT (not per
    token), and at extreme scale the same split comes from
    `approx_percentile` boundaries instead of a global ntile — documented
    tradeoff, the exact form is what the oracle can check. Ties broken by
    doc_id so both engines assign identical buckets."""
    scored = docs_bigram_lm_score(spark, sf_dir).select("doc_id", "avg_logp")
    wb = W.orderBy(F.col("avg_logp").desc(), "doc_id")
    return (
        scored.withColumn("bucket", F.ntile(5).over(wb))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("avg_logp"), 6).alias("min_logp"),
            F.round(F.max("avg_logp"), 6).alias("max_logp"),
        )
    )


N_BPE_MERGES = 10


def _bpe_train_ctes() -> str:
    """DuckDB CTE chain that TRAINS the same N_BPE_MERGES BPE merges as
    :func:`corpus_bpe_merges` — the round-14 oracle graduation of the
    two previously rows-only tokenizer queries. The iterative trainer
    unrolls (N_BPE_MERGES is a compile-time constant), one stage per
    merge:

    * each word is a '|'-delimited symbol string (``'|a|b|'``; the
      corpus alphabet is space + lowercase, so '|' cannot collide);
    * ``p{{k}}``: count-weighted adjacent-pair totals via list_zip over
      the symbol arrays;
    * ``b{{k}}``: argmax with the trainer's exact tie-break
      (total DESC, left, right);
    * ``r{{k}}``: a recursive CTE applying the merge by replacing the
      FIRST ``'|l|r|'`` occurrence per step until none remains —
      leftmost-single-replacement iterated to fixpoint equals the
      trainer's greedy left-to-right non-overlapping scan (a
      replacement can never create an earlier match: the new symbol
      ``l||r`` is never equal to ``l`` or ``r``).

    Every non-recursive CTE is MATERIALIZED: DuckDB inlines CTEs by
    default, and ten chained stages each referencing the previous twice
    would re-evaluate the prefix exponentially."""
    parts = [r"""
w0 AS MATERIALIZED (
    SELECT u.w AS word, count(*) AS n
    FROM (SELECT str_split(replace(coalesce(text, ''), chr(10), ' '), ' ')
                 AS ws FROM documents) t,
         UNNEST(t.ws) AS u(w)
    WHERE len(u.w) > 0
    GROUP BY 1
),
v0 AS MATERIALIZED (
    SELECT word, '|' || regexp_replace(word, '(.)', '\1|', 'g') AS s, n
    FROM w0
)"""]
    for k in range(1, N_BPE_MERGES + 1):
        j = k - 1
        parts.append(f"""
p{k} AS MATERIALIZED (
    SELECT u.pr[1] AS lft, u.pr[2] AS rgt, CAST(sum(n) AS BIGINT) AS total
    FROM (SELECT str_split(trim(s, '|'), '|') AS sy, n FROM v{j}) t,
         UNNEST(list_zip(t.sy[1:len(t.sy)-1], t.sy[2:len(t.sy)])) AS u(pr)
    WHERE len(t.sy) >= 2
    GROUP BY 1, 2
),
b{k} AS MATERIALIZED (
    -- a corpus that exhausts its merges before stage {k} leaves p{k}
    -- empty; a sentinel pair (chr(1) never occurs in any word) keeps
    -- the rewrite cross-joins populated so v{k} degrades to v{j}
    -- instead of collapsing to zero rows — mirroring the trainer's
    -- early break. The merges output filters it out on total > 0.
    SELECT * FROM (
        SELECT lft, rgt, total FROM p{k}
        ORDER BY total DESC, lft, rgt LIMIT 1
    )
    UNION ALL
    SELECT chr(1), chr(1), CAST(0 AS BIGINT)
    WHERE NOT EXISTS (SELECT 1 FROM p{k})
),
r{k} AS (
    SELECT word, s, n FROM v{j}
    UNION ALL
    SELECT word,
           substr(s, 1, strpos(s, '|' || b{k}.lft || '|' || b{k}.rgt || '|') - 1)
             || '|' || b{k}.lft || b{k}.rgt || '|'
             || substr(s, strpos(s, '|' || b{k}.lft || '|' || b{k}.rgt || '|')
                          + len('|' || b{k}.lft || '|' || b{k}.rgt || '|')),
           n
    FROM r{k}, b{k}
    WHERE strpos(s, '|' || b{k}.lft || '|' || b{k}.rgt || '|') > 0
),
v{k} AS MATERIALIZED (
    SELECT word, s, n FROM r{k}, b{k}
    WHERE strpos(s, '|' || b{k}.lft || '|' || b{k}.rgt || '|') = 0
)""")
    return "WITH RECURSIVE " + ",".join(parts)


_BPE_MERGES_ORACLE = _bpe_train_ctes() + "\n" + "\nUNION ALL\n".join(
    f'SELECT CAST({k} AS INTEGER) AS merge_rank, lft AS "left", '
    f'rgt AS "right", lft || rgt AS merged, total AS pair_count '
    f"FROM b{k} WHERE total > 0"  # drop the exhaustion sentinel
    for k in range(1, N_BPE_MERGES + 1)
)

_BPE_ENCODE_ORACLE = _bpe_train_ctes() + f""",
docw AS MATERIALIZED (
    SELECT t.doc_id, u.w AS word
    FROM (SELECT doc_id, str_split(replace(coalesce(text, ''), chr(10), ' '),
                 ' ') AS ws FROM documents) t,
         UNNEST(t.ws) AS u(w)
    WHERE len(u.w) > 0
),
wtok AS MATERIALIZED (
    SELECT word, len(word) AS n_chars_w,
           len(str_split(trim(s, '|'), '|')) AS n_tok_w
    FROM v{N_BPE_MERGES}
),
agg AS MATERIALIZED (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_chars_w) AS BIGINT) AS n_chars,
           CAST(sum(n_tok_w) AS BIGINT) AS n_tokens
    FROM docw JOIN wtok USING (word)
    GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_words, 0) AS n_words,
       coalesce(a.n_chars, 0) AS n_chars,
       coalesce(a.n_tokens, 0) AS n_tokens,
       round(CAST(a.n_chars AS DOUBLE) / a.n_tokens, 6) AS chars_per_token
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register(
    "corpus_bpe_merges",
    oracle=_BPE_MERGES_ORACLE,
    tags=("text", "tokenizer", "iterative"),
)
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
    first N_BPE_MERGES character-pair merge rules from the corpus.

    The scale trick is the classic one: BPE merges happen INSIDE words, so
    training needs only the word-frequency table — ONE corpus-sized scan
    aggregates (word, count), and every merge iteration then runs on the
    vocabulary, which is Heaps-law-sized (O(corpus^0.5)), not the corpus.
    Per iteration: adjacent symbol pairs via a higher-order transform,
    count-weighted pair totals via a vocab-sized groupBy, argmax to the
    driver (one scalar per iteration — model-sized driver traffic, K
    rounds total), then a mapInPandas pass rewrites each word's symbol
    array left-to-right (greedy non-overlapping, the reference semantics).
    localCheckpoint truncates lineage per round, same as the
    connected-components loop (operators/corpus.py).

    Oracled since round 14: the DuckDB twin (_bpe_train_ctes) unrolls
    the same 10 merges as chained recursive CTEs, so the full iterative
    trainer is hash-gated; exact equivalence with a pure-Python
    reference BPE stays pinned in tests/test_bpe.py. Ties break on
    (left, right) lexical order so the merge sequence is deterministic
    across engines and partitionings.
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.regexp_replace("text", "\n", " "), " ")).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = words.select(
        F.split("word", "").alias("symbols"), "n"
    ).localCheckpoint(eager=False)

    merges = []
    for rank in range(1, N_BPE_MERGES + 1):
        pairs = vocab.where(F.size("symbols") >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("symbols") - 1),
                    lambda i: F.struct(
                        F.element_at("symbols", i).alias("left"),
                        F.element_at("symbols", i + 1).alias("right"),
                    ),
                )
            ).alias("p"),
            "n",
        )
        best = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("total"))
            .orderBy(F.col("total").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, total = best[0].left, best[0].right, best[0].total
        merges.append((rank, left, right, left + right, int(total)))

        def apply_merge(batches, _l=left, _r=right):
            for pdf in batches:
                out = []
                for syms in pdf["symbols"]:
                    merged, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == _l and syms[i + 1] == _r:
                            merged.append(_l + _r)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    out.append(merged)
                yield pd.DataFrame({"symbols": out, "n": pdf["n"]})

        vocab = vocab.mapInPandas(
            apply_merge, "symbols array<string>, n long"
        ).localCheckpoint(eager=False)

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, merged string, pair_count long"
    )


@register(
    "docs_lm_score_pandas_kernel",
    oracle=f"""
        WITH {_ORACLE_BIGRAMS},
        c12 AS (
            SELECT w1, w2, count(*) AS c_pair FROM bg GROUP BY w1, w2
        ),
        c1 AS (
            SELECT w1, sum(c_pair) AS c_ctx FROM c12 GROUP BY w1
        ),
        v AS (
            SELECT count(*) AS vocab FROM (
                SELECT w1 AS term FROM c12 UNION SELECT w2 FROM c12
            )
        ),
        lm AS (
            SELECT c12.w1, c12.w2,
                   ln((c_pair + {ADD_K}) / (c_ctx + {ADD_K} * vocab)) AS logp
            FROM c12 JOIN c1 USING (w1) CROSS JOIN v
        )
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(lm.logp), 6) AS avg_logp
        FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
        GROUP BY bg.doc_id
    """,
    tags=("text", "quality", "lm", "pandas-kernel"),
)
def docs_lm_score_pandas_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as ``docs_bigram_lm_score`` computed through the
    Arrow-batched Pandas scoring kernel shared with the STREAMING scorer
    (streaming/pipeline.py::score_stream_with_lm) — model dict in the task
    closure, per-row Python scoring, no per-token shuffle. Registered with
    the same oracle so the Python kernel path earns its own driver-gate
    row; the JVM expression path (docs_bigram_lm_score) is the production
    default, this is the extension point for model formats SQL can't
    express (KenLM binaries, learned quality classifiers).

    The driver-side model pull is CAPPED at MAX_BROADCAST_LM_ROWS: above
    it the dict would OOM the driver, so this path refuses with a clear
    error pointing at the shuffle-join path instead of failing opaquely."""
    import math

    from ..streaming.pipeline import score_stream_with_lm

    d = load_table(spark, sf_dir, "documents")
    bg = _doc_bigrams(d)
    c12_df = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .localCheckpoint(eager=False)
    )
    n_pairs = c12_df.count()
    if n_pairs > MAX_BROADCAST_LM_ROWS:
        raise ValueError(
            f"bigram model has {n_pairs} pairs > MAX_BROADCAST_LM_ROWS="
            f"{MAX_BROADCAST_LM_ROWS}; a driver-side model dict would OOM. "
            "Use docs_bigram_lm_score (shuffle-join fallback) at this scale."
        )
    c12_rows = c12_df.collect()  # counted-capped driver pull (<= guard rows)
    c1: dict = {}
    for r in c12_rows:
        c1[r.w1] = c1.get(r.w1, 0) + r.c_pair
    vocab = len({w for r in c12_rows for w in (r.w1, r.w2)})
    if vocab == 0:  # empty corpus: no model, nothing to score (and the
        # add-k smoothing mass k*V would be a zero divisor)
        return spark.createDataFrame([], "doc_id long, n_bigrams long, avg_logp double")
    lm_logp = {
        (r.w1, r.w2): math.log((r.c_pair + ADD_K) / (c1[r.w1] + ADD_K * vocab))
        for r in c12_rows
    }
    # score_stream_with_lm is stream-agnostic: mapInPandas works on batch
    # too; c1 rides along so unseen bigrams with in-model contexts get the
    # exact ln(k/(C(w1)+kV)) mass (no unseen pairs exist on this replay,
    # but the kernel contract is shared with true streams)
    return score_stream_with_lm(
        # add_k passed EXPLICITLY: the kernel's unseen-bigram mass must use
        # THIS module's smoothing constant, not a silently duplicated
        # default in the streaming module (the constant-desync class the
        # simhash helpers guard against)
        d.select("doc_id", "text"), lm_logp, vocab, add_k=ADD_K, ctx_counts=c1
    )


@register(
    "docs_bpe_encode",
    oracle=_BPE_ENCODE_ORACLE,
    tags=("text", "tokenizer"),
)
def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the corpus-trained BPE merges — the
    APPLY half of the tokenizer loop (corpus_bpe_merges trains; this
    encodes), i.e. the per-document token accounting a training-data
    pipeline runs before packing sequences.

    The merge table is MODEL-sized by construction (N_BPE_MERGES rows),
    so it ships in the task closure like the streaming LM dict; encoding
    is one Arrow-batched mapInPandas pass — zero shuffle, corpus scanned
    once. Merges apply in rank order with the trainer's greedy
    left-to-right non-overlapping scan, so enc(word) equals the trainer's
    final symbol table for in-corpus words (pinned in tests/test_bpe.py);
    a per-word memo dict inside the kernel exploits Zipf repetition
    (vocabulary is Heaps-sized, so the cache stays small while skipping
    the merge loop for almost every token instance).

    Oracled since round 14: the DuckDB twin re-trains the merges with
    the recursive-CTE trainer (_bpe_train_ctes) and re-derives every
    word's token count from ITS final symbol table — valid because the
    encoder's greedy rank-order merge application reproduces the
    trainer's final segmentation for in-corpus words, and this corpus
    IS the training corpus (the python-reference equivalence test in
    tests/test_bpe.py pins that property).
    """
    import pandas as pd

    merges = [
        (r.left, r.right)
        for r in corpus_bpe_merges(spark, sf_dir).orderBy("merge_rank").collect()
    ]
    d = load_table(spark, sf_dir, "documents")

    def encode(batches):
        memo: dict = {}

        def enc_len(word: str) -> tuple[int, int]:
            hit = memo.get(word)
            if hit is None:
                syms = list(word)
                n_chars = len(syms)
                for left, right in merges:
                    merged, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    syms = merged
                hit = (n_chars, len(syms))
                memo[word] = hit
            return hit

        for pdf in batches:
            out = {"doc_id": [], "n_words": [], "n_chars": [], "n_tokens": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text encodes as the empty document (mirrors the
                # UDTF chunker's None guard) instead of crashing the job
                if text is None:
                    text = ""
                words = [w for w in text.replace("\n", " ").split(" ") if w]
                nc = nt = 0
                for w in words:
                    c, t = enc_len(w)
                    nc += c
                    nt += t
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_chars"].append(nc)
                out["n_tokens"].append(nt)
            yield pd.DataFrame(out)

    enc = d.select("doc_id", "text").mapInPandas(
        encode, "doc_id long, n_words long, n_chars long, n_tokens long"
    )
    return enc.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_tokens",
        # try_divide: a zero-token doc (empty/whitespace text) must yield
        # NULL, not an ANSI DIVIDE_BY_ZERO abort of the whole encode job
        F.round(F.try_divide(F.col("n_chars"), F.col("n_tokens")), 6).alias("chars_per_token"),
    )
