"""Deduplication operators over ``documents`` — the LLM-corpus dedup suite.

Four tiers, cheapest first:
  1. exact        — hash-groupBy on normalized content (one shuffle on a
                    compact digest key).
  2. ngram-jaccard — exact set-similarity on word-3-gram shingles via a
                    prefix-filtered inverted-index join (PPJoin family):
                    candidates only from each set's rarest-first prefix,
                    exact array_intersect verification. SQL-expressible.
  3. simhash      — 60-bit simhash per doc; near-dup pairs found by banding
                    the fingerprint (4 x 15-bit bands, join per band) and
                    verifying Hamming distance. Deterministic (md5-based),
                    SQL-expressible, scales as band-key joins.
  4. minhash-lsh  — banded MinHash signatures over the same shingle sets
                    (16 x xxhash64, b=8 r=2), candidates from band-bucket
                    joins; probabilistic recall, so rows-only check.

Scale posture: tiers 2-4 avoid the O(n^2) cross join — candidate pairs come
from inverted-index / band-bucket joins, which shuffle on shingle/band keys.
Hot shingles (stopword-only 3-grams) are the classic skew source; the
Jaccard operator drops shingles with document frequency above a cap, which
is both a skew guard and the standard quality fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table, spread

JACCARD_THRESHOLD = 0.5
MAX_SHINGLE_DF = 100        # inverted-index df cap (skew + quality guard)
SIMHASH_BITS = 60           # from 15 hex chars of md5 (fits signed int64)
SIMHASH_BANDS = 4           # 4 bands x 15 bits
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS   # 15
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1    # 32767
HAMMING_THRESHOLD = 8


def simhash_band_key_col():
    """Band-key extraction for a (simhash, band) row — the ONE definition
    used by the batch operators, the streaming twin, and (via the SQL
    variant below) the DuckDB oracles, so a constant change can't desync
    them."""
    return F.expr(f"shiftright(simhash, band * {SIMHASH_BAND_BITS})").bitwiseAND(
        SIMHASH_BAND_MASK
    )


# SQL fragment of the same extraction for oracle CTEs (DuckDB dialect)
SIMHASH_BAND_KEY_SQL = (
    f"(simhash >> (b.band * {SIMHASH_BAND_BITS})) & {SIMHASH_BAND_MASK}"
)


def md5_60(col):
    """60-bit integer hash of a string column (first 15 hex digits of md5)
    — the ONE token/shingle hash shared by the simhash fingerprint, the
    MinHash pipeline, and the streaming twin (same single-definition rule
    as simhash_band_key_col: a width change in one copy would silently
    desync batch and stream fingerprints)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def simhash_token_hashes_col(text_col: str = "text"):
    """Distinct-token md5_60 hash array for one document."""
    return F.transform(F.array_distinct(F.split(text_col, " ")), md5_60)


def simhash_fold_expr():
    """The 60-bit majority-vote fold over a token-hash array column named
    ``hs`` — per-bit vote then OR of winning bits, one nested higher-order
    expression (zero shuffle). Shared by the batch fingerprint operator
    and the streaming twin."""
    return F.expr(
        f"""
        aggregate(
          transform(sequence(0, {SIMHASH_BITS - 1}), b ->
            if(aggregate(hs, 0, (acc, h) -> acc + if((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
               shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)
        """
    )


# --------------------------------------------------------------------------
# 1. Exact dedup
# --------------------------------------------------------------------------
@register(
    "docs_exact_dedup",
    oracle="""
        SELECT md5(lower(trim(text))) AS content_hash,
               min(doc_id) AS canonical_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    tags=("dedup",),
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the smallest doc_id.
    Hashing first means the shuffle key is 16 bytes, not the document."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.lower(F.trim("text"))).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# 2. Exact n-gram Jaccard near-dup pairs (inverted index join)
# --------------------------------------------------------------------------
@register(
    "docs_ngram_jaccard_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        shingles AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 3
        ),
        df AS (
            SELECT shingle FROM shingles GROUP BY shingle
            HAVING count(*) <= {MAX_SHINGLE_DF}
        ),
        filtered AS (
            SELECT s.doc_id, s.shingle FROM shingles s JOIN df USING (shingle)
        ),
        sizes AS (
            SELECT doc_id, count(*) AS n_sh FROM filtered GROUP BY doc_id
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM filtered a JOIN filtered b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               p.n_shared * 1.0 / (sa.n_sh + sb.n_sh - p.n_shared) AS jaccard
        FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
        WHERE p.n_shared * 1.0 / (sa.n_sh + sb.n_sh - p.n_shared) >= {JACCARD_THRESHOLD}
    """,
    headline=True,
    tags=("dedup", "similarity"),
)
def docs_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity pairs above a threshold, via
    prefix-filtered inverted-index join (the PPJoin family: Xiao et al.,
    "Efficient Similarity Joins for Near Duplicate Detection", WWW'08).

    Plan shape: explode shingles -> 64-bit hash (8-byte shuffle keys, not
    ~20-char strings) -> distinct -> document-frequency cap (skew + quality
    guard) -> per-doc shingle arrays sorted rarest-first by global df ->
    PREFIX FILTER, asymmetric index/probe split: under a common global
    order, any pair with J >= t shares its SMALLEST common token within
    the probe side's mid-prefix (|x| - ceil(t*|x|) + 1, ~1/2 at t=0.5)
    AND the index side's short prefix (|y| - ceil(2t/(1+t)*|y|) + 1,
    ~1/3), provided |y| <= |x| — so the inverted index holds only short
    prefixes and the hot tail of frequent shingles never generates
    candidates, which is exactly what explodes at corpus scale. Candidates (bare 16-byte pair keys) then verify exactly with
    array_intersect against the full sorted sets. Lossless: identical
    output to the unfiltered join, and the string-keyed oracle doubles as
    a hash-collision canary (collision probability ~n^2/2^64).

    The shingle-set subtree feeds three branches (prefix index, verify-a,
    verify-b) but executes ONCE: the branches canonicalize identically, so
    AQE serves them from a single shuffle (3 ReusedExchange nodes in the
    final adaptive plan — pinned by
    test_jaccard_shared_subtree_exchange_reuse; an explicit localCheckpoint
    measured ~45% slower by serializing the materialization).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).where(F.size("w") >= 3)
    # Per-doc dedup BEFORE the explode (the _span_digests idiom): a
    # shingle repeated within one document dedups in a row-local
    # array_distinct instead of a global distinct — that distinct was a
    # full shuffle of the shingle stream on (doc_id, sh) whose output
    # then re-shuffled on sh for BOTH the document-frequency aggregate
    # and the df join-back (three full-stream exchanges). Now the
    # exploded stream is distinct by construction and both consumers
    # hang off ONE canonical exchange on sh (AQE ReusedExchange — the
    # tokenize+hash segment below it also runs once). Plan diff:
    # 3 full-stream Exchanges -> 1 (pinned in tests/test_plan_shapes.py);
    # rows identical (the distinct was per-doc: its key was (doc_id, sh)).
    sh_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 2),
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ",
                    F.element_at("w", i),
                    F.element_at("w", i + 1),
                    F.element_at("w", i + 2),
                )
            ),
        )
    )
    shingles = toks.select("doc_id", F.explode(sh_arr).alias("sh"))
    dfreq = (
        shingles.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") <= MAX_SHINGLE_DF)
    )
    # sorted rarest-first: (df, hash) gives every doc the SAME global order
    sets = (
        shingles.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("cnt", "sh"))), lambda s: s["sh"]
            ).alias("shs")
        )
    )
    t = JACCARD_THRESHOLD
    # ASYMMETRIC index/probe split (the canonical PPJoin scheme): the
    # PROBE side uses the mid-prefix |x| - ceil(t*|x|) + 1 and the INDEX
    # side the shorter |y| - ceil(2t/(1+t)*|y|) + 1, joined under the size
    # ordering |y| <= |x|. Losslessness (smallest-common-token argument):
    # let w be the smallest shared token in the global order. If w were
    # outside x's probe prefix, every prefix token of x would be
    # non-shared, so overlap <= ceil(t*|x|) - 1 < ceil(t*|x|) <= required
    # overlap (since |y| >= t*|x| by the length filter) — contradiction;
    # if w were outside y's index prefix, overlap <= ceil(2t/(1+t)*|y|)-1
    # < ceil(t/(1+t)*(|x|+|y|)) (using |x| >= |y|) — contradiction. So the
    # SAME token w sits in both prefixes and the pair is generated.
    # Equal sizes match in both orientations; the (lo, hi) relabel +
    # distinct dedups them. Using the mid-prefix on BOTH sides is also
    # lossless but indexes ~50% more tokens; using the short prefix on
    # both sides is LOSSY (falsified by hypothesis with "a a a" vs
    # "a a a b", J = 0.5) — the split below is the fast AND correct form,
    # hammered by test_jaccard_ppjoin_filters_lossless on arbitrary corpora.
    probe_len = (F.size("shs") - F.ceil(F.size("shs") * t) + 1).cast("int")
    index_len = (
        F.size("shs") - F.ceil(F.size("shs") * (2 * t / (1 + t))) + 1
    ).cast("int")
    # carry (position in the global order, set size) through the inverted
    # index: PPJoin's positional filter. For a shared prefix token at
    # 0-based positions (ia, ib), the overlap can't exceed
    # min(na-ia, nb-ib); pairs whose bound is below the required overlap
    # ceil(t/(1+t)*(na+nb)) are pruned BEFORE the candidate distinct and
    # the array_intersect verify — lossless (the bound provably holds at
    # the smallest shared token of any true pair), and it is what turns
    # the hot verify join from |prefix-matches| into nearly |true pairs|.
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.size("shs").alias("na"),
        F.posexplode(F.slice("shs", 1, probe_len)).alias("ia", "psh"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.size("shs").alias("nb"),
        F.posexplode(F.slice("shs", 1, index_len)).alias("ib", "psh"),
    )
    required = F.ceil(F.lit(t / (1 + t)) * (F.col("na") + F.col("nb")))
    cand = (
        a.join(b, "psh")
        .where(
            # size ordering for the asymmetric prefixes, self-pairs out
            (F.col("nb") <= F.col("na")) & (F.col("doc_a") != F.col("doc_b"))
            # length filter: J >= t forces |y| >= t*|x| (|y| <= |x| here)
            & (F.col("nb") >= F.ceil(F.lit(t) * F.col("na")))
            # positional filter: overlap upper bound must reach the target
            & (F.least(F.col("na") - F.col("ia"), F.col("nb") - F.col("ib")) >= required)
        )
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    fa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    fb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    shared = F.size(F.array_intersect("shs_a", "shs_b"))
    jac = shared * 1.0 / (F.size("shs_a") + F.size("shs_b") - shared)
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .where(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


# --------------------------------------------------------------------------
# 3. SimHash fingerprints + banded near-dup candidates
# --------------------------------------------------------------------------
def _simhash_oracle_fp() -> str:
    """Shared CTE text computing per-doc 60-bit simhash in DuckDB."""
    return """
        toks AS (
            SELECT DISTINCT doc_id, u.tok AS tok
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
                 UNNEST(w) AS u(tok)
        ),
        hashed AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
        ),
        bits AS (
            SELECT doc_id, b.bit AS bit,
                   sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
            FROM hashed, UNNEST(range(0, 60)) AS b(bit)
            GROUP BY doc_id, b.bit
        ),
        fp AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
                       AS simhash
            FROM bits GROUP BY doc_id
        )
    """


@register(
    "docs_simhash",
    oracle=f"WITH {_simhash_oracle_fp()} SELECT doc_id, simhash FROM fp",
    tags=("dedup", "fingerprint"),
)
def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (md5-derived token hashes, majority vote
    per bit). Deterministic across engines because the token hash is md5.

    Plan: ZERO-shuffle per-row compute. A document's fingerprint depends
    only on its own distinct tokens, so the whole majority vote folds into
    one nested higher-order expression (token-hash array -> per-bit vote
    aggregate -> bit OR-fold) instead of the naive explode(tokens) x
    explode(60 bits) -> two keyed aggregations, which shuffled a 60x
    fan-out of the token stream twice. Per-row cost is unchanged
    (60 x tokens adds); shuffle bytes drop to nothing; spread() unlocks
    core parallelism on under-split scans.
    """
    # NULL text has no tokens to vote: the fold would otherwise emit
    # fingerprint 0 (NULL-text docs all becoming mutual "near-dups"),
    # while the oracle's UNNEST(NULL) naturally omits the doc — exclude
    # on the Spark side too (the streaming twin carries the same filter)
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return (
        spread(d)
        .select("doc_id", simhash_token_hashes_col().alias("hs"))
        .select("doc_id", simhash_fold_expr().alias("simhash"))
    )


@register(
    "docs_simhash_near_dups",
    oracle=f"""
        WITH {_simhash_oracle_fp()},
        banded AS (
            SELECT doc_id, simhash, b.band AS band,
                   {SIMHASH_BAND_KEY_SQL} AS band_key
            FROM fp, UNNEST(range(0, {SIMHASH_BANDS})) AS b(band)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                            b.doc_id AS doc_b, b.simhash AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b)) AS hamming
        FROM cand
        WHERE bit_count(xor(sh_a, sh_b)) <= {HAMMING_THRESHOLD}
    """,
    tags=("dedup", "similarity"),
)
def docs_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs via LSH banding.

    The 60-bit fingerprint splits into 4 x 15-bit bands; any pair agreeing
    on a full band becomes a candidate (pigeonhole: Hamming <= 3 guarantees
    a matching band). Candidates are verified by exact Hamming distance.
    Join key = (band, band_key) — equi-join, no cross product, scales to
    corpus size x 4 rows.

    The fingerprint subtree feeds FOUR branches (band sides a/b, verify
    rejoins fa/fb) and since the zero-shuffle simhash rewrite there is no
    exchange for AQE to reuse — unchecked, each branch would re-run the
    60 x tokens vote expression. fp is 16 bytes/doc (the Q15 tiny-subtree
    case), so a localCheckpoint materializes it once and every branch
    reads the checkpoint.
    """
    fp = docs_simhash(spark, sf_dir).localCheckpoint(eager=False)
    band = F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band")
    banded = fp.select("doc_id", "simhash", band).withColumn(
        "band_key", simhash_band_key_col()
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    # dedup candidates on the bare 16-byte pair key; the fingerprints (one
    # row per doc) rejoin afterwards — never haul sh_a/sh_b through the
    # candidate-generation shuffle
    cand = (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # the rejoin sides are CORPUS-sized (one 16-byte row per doc): let AQE
    # pick the strategy — at test scale it broadcasts them anyway, but a
    # FORCED broadcast would abort at the billions-of-docs scale this
    # module targets (broadcast relations cap out in low GBs)
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .where(hamming <= HAMMING_THRESHOLD)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )


# --------------------------------------------------------------------------
# 4. MinHash-LSH approximate near-dup join (banding mirrored in the oracle)
# --------------------------------------------------------------------------
MINHASH_N_HASH, MINHASH_N_BANDS = 16, 8  # r = 2


def _minhash_oracle() -> str:
    """DuckDB mirror of the full MinHash-LSH pipeline — same md5-derived
    shingle hashes, same seeded minhash slots, same (band, k1, k2) bucket
    join, same exact-Jaccard verify — so the driver hash-checks VALUES.
    The LSH *recall* claim (which true pairs the banding surfaces) is
    still pinned separately by the hash-free brute-force reference in
    tests/test_ann_recall.py; an oracle that mirrors the banding cannot
    see a recall gap by construction."""
    mins = ",\n                   ".join(
        f"min(('0x' || substr(md5(CAST({s} AS VARCHAR) || ':' || CAST(sh AS VARCHAR)), 1, 15))::BIGINT)"
        for s in range(MINHASH_N_HASH)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE len(string_split(text, ' ')) >= 3
        ),
        idx AS (
            SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i FROM toks
        ),
        shingles AS (
            SELECT doc_id,
                   ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT
                       AS sh
            FROM idx
        ),
        mh AS (
            SELECT doc_id,
                   [{mins}] AS mh,
                   list(DISTINCT sh) AS shs
            FROM shingles GROUP BY doc_id
        ),
        banded AS (
            SELECT doc_id, b.band AS band,
                   mh[b.band * 2 + 1] AS k1, mh[b.band * 2 + 2] AS k2
            FROM mh, UNNEST(range(0, {MINHASH_N_BANDS})) AS b(band)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
                 AND a.doc_id < b.doc_id
        ),
        verified AS (
            SELECT c.doc_a, c.doc_b,
                   len(list_intersect(ma.shs, mb.shs)) AS inter,
                   len(ma.shs) + len(mb.shs) - len(list_intersect(ma.shs, mb.shs)) AS un,
                   CAST(list_sum(list_transform(range(1, {MINHASH_N_HASH + 1}),
                            i -> CASE WHEN ma.mh[i] = mb.mh[i] THEN 1 ELSE 0 END))
                        AS DOUBLE) / ({float(MINHASH_N_HASH)!r})::DOUBLE AS est
            FROM cand c
            JOIN mh ma ON c.doc_a = ma.doc_id
            JOIN mh mb ON c.doc_b = mb.doc_id
        )
        SELECT doc_a, doc_b,
               round(inter / un, 6) AS jaccard,
               round(est, 4) AS est_jaccard
        FROM verified
        WHERE inter / un >= {JACCARD_THRESHOLD}
    """


@register("docs_minhash_lsh_pairs", oracle=_minhash_oracle(), tags=("dedup", "approx"))
def docs_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate Jaccard near-dup pairs via banded MinHash-LSH over the
    SAME word-3-gram shingle sets as the exact operator — approximating a
    different feature (e.g. unigrams) would answer a different question,
    and on a shared-vocabulary corpus unigram Jaccard is ~1 for everything,
    which blows the candidate set up to ~n^2.

    16 deterministic minhash functions (md5-derived, seeded by slot — md5
    rather than xxhash64 so the DuckDB oracle reproduces every hash
    bit-for-bit and the driver gate checks VALUES, not just row counts),
    banded as b=8 bands x r=2 rows — the classic (b, r) construction with
    match probability 1-(1-J^2)^8 (~90% at J=0.5, ~100% at J=0.8). The AND
    within a band is what makes this scale: a candidate bucket requires TWO
    minhash agreements, so hot buckets collapse and the bucket join stays
    near-linear at 100 TB. Candidates dedup on the bare (doc_a, doc_b) key
    (16 bytes — never haul the signature arrays through a shuffle).

    Candidates are then VERIFIED EXACTLY: the pair rejoins the hashed
    shingle sets and the TRUE Jaccard (array_intersect over the distinct
    shingle-hash sets — identical to string-set Jaccard modulo negligible
    60-bit-hash collisions) gates the output, with the signature-based
    matching-slots/16 estimate carried alongside for diagnostics. The
    oracle mirrors the banding, so the driver checks end-to-end values;
    LSH recall vs ground truth (>= 0.9 candidate recall, zero false
    positives, bit-equal jaccard) is pinned by the hash-free brute-force
    reference in tests/test_ann_recall.py::test_minhash_verify_stage_exact.
    The exact counterpart (docs_ngram_jaccard_pairs) bounds the result
    from above.
    """
    N_HASH, N_BANDS = MINHASH_N_HASH, MINHASH_N_BANDS
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).where(F.size("w") >= 3)
    idx = F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i")

    shingle = toks.select("doc_id", "w", idx).select(
        "doc_id",
        md5_60(
            F.concat_ws(
                " ",
                F.element_at("w", F.col("i")),
                F.element_at("w", F.col("i") + 1),
                F.element_at("w", F.col("i") + 2),
            )
        ).alias("sh"),
    )
    # 16 minhashes AND the distinct shingle-hash set (for the exact verify
    # stage) in ONE groupBy pass over the exploded shingles
    mh = shingle.groupBy("doc_id").agg(
        F.array(
            *[
                F.min(
                    md5_60(F.concat_ws(":", F.lit(s), F.col("sh").cast("string")))
                )
                for s in range(N_HASH)
            ]
        ).alias("mh"),
        F.collect_set("sh").alias("shs"),
    )
    band = F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band")
    banded = mh.select("doc_id", band, "mh").select(
        "doc_id",
        "band",
        F.element_at("mh", F.col("band") * 2 + 1).alias("k1"),
        F.element_at("mh", F.col("band") * 2 + 2).alias("k2"),
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "k1", "k2")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "k1", "k2")
    cand = (
        a.join(b, ["band", "k1", "k2"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    mh_a = mh.select(
        F.col("doc_id").alias("doc_a"), F.col("mh").alias("mh_a"), F.col("shs").alias("shs_a")
    )
    mh_b = mh.select(
        F.col("doc_id").alias("doc_b"), F.col("mh").alias("mh_b"), F.col("shs").alias("shs_b")
    )
    est = (
        F.aggregate(
            F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(N_HASH))
    )
    # exact verify stage: true Jaccard over the distinct shingle-hash sets
    # gates the output — the estimate never decides membership
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    union = F.size("shs_a") + F.size("shs_b") - inter
    return (
        cand.join(mh_a, "doc_a")
        .join(mh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / union).alias("_jac_raw"),
            F.round(est, 4).alias("est_jaccard"),
        )
        # membership decided on the UNROUNDED ratio (mirrored in the
        # oracle): a pair at 0.4999996 must not round its way past the
        # threshold, or the exact operator stops being an upper bound
        .where(F.col("_jac_raw") >= JACCARD_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            F.round("_jac_raw", 6).alias("jaccard"),
            "est_jaccard",
        )
    )


# --------------------------------------------------------------------------
# 5. Incremental ingest-time near-dedup against the standing corpus index
# --------------------------------------------------------------------------
INGEST_MOD, INGEST_REM = 10, 7  # doc_id % 10 == 7 plays the incoming batch


@register(
    "docs_incremental_simhash_dedup",
    oracle=f"""
        WITH {{fp_cte}},
        batch AS (
            SELECT doc_id, simhash FROM fp WHERE doc_id % {INGEST_MOD} = {INGEST_REM}
        ),
        corpus AS (
            SELECT doc_id, simhash FROM fp WHERE doc_id % {INGEST_MOD} <> {INGEST_REM}
        ),
        bb AS (
            SELECT doc_id, simhash, b.band AS band,
                   {SIMHASH_BAND_KEY_SQL} AS band_key
            FROM batch, UNNEST(range(0, {{n_bands}})) AS b(band)
        ),
        cb AS (
            SELECT doc_id, simhash, b.band AS band,
                   {SIMHASH_BAND_KEY_SQL} AS band_key
            FROM corpus, UNNEST(range(0, {{n_bands}})) AS b(band)
        ),
        cand AS (
            SELECT DISTINCT bb.doc_id AS b_id, bb.simhash AS sh_b,
                            cb.doc_id AS c_id, cb.simhash AS sh_c
            FROM bb JOIN cb ON bb.band = cb.band AND bb.band_key = cb.band_key
        ),
        verified AS (
            SELECT b_id, c_id,
                   bit_count(xor(sh_b, sh_c)) AS hamming
            FROM cand
            WHERE bit_count(xor(sh_b, sh_c)) <= {{ham}}
        ),
        best AS (
            SELECT b_id, c_id, hamming,
                   row_number() OVER (
                       PARTITION BY b_id ORDER BY hamming, c_id
                   ) AS rn
            FROM verified
        )
        SELECT b.doc_id,
               (best.c_id IS NOT NULL) AS is_dup,
               coalesce(best.c_id, -1) AS dup_of,
               CAST(coalesce(best.hamming, -1) AS BIGINT) AS best_hamming
        FROM batch b LEFT JOIN best ON b.doc_id = best.b_id AND best.rn = 1
    """,
    headline=True,
    tags=("dedup", "incremental"),
)
def docs_incremental_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time near-dedup: check an INCOMING BATCH of documents
    (doc_id % INGEST_MOD == INGEST_REM stands in for the new arrivals)
    against the STANDING corpus's simhash index, without touching
    corpus-vs-corpus pairs at all. One row per batch doc: its best
    (lowest-Hamming, lowest-id) BANDING-CANDIDATE corpus match — i.e. the
    best match among pairs that agree on at least one full 15-bit band.
    Banding is pigeonhole-complete only for Hamming <= SIMHASH_BANDS - 1
    (= 3); a true match at distance 4..HAMMING_THRESHOLD that shares no
    full band is NOT found. The HAMMING_THRESHOLD filter bounds which
    candidates are *reported*, not recall.

    This is the operator an incremental pipeline runs per ingest cycle —
    the corpus index is write-once (at scale: the persisted fingerprint
    table that docs_simhash maintains, 16 bytes/doc), and the batch side
    is BROADCAST into the band join: the corpus never shuffles, the batch
    never self-joins, and per-cycle cost is corpus-scan-free when the
    index is stored. Candidate generation is the same 4x15-bit banding as
    docs_simhash_near_dups (pigeonhole-complete for Hamming <= 3; the
    oracle mirrors the banding, so the gate checks values, not the
    LSH recall claim). The streaming twin is
    streaming/pipeline.py::dedup_stream_against_corpus — identical
    banding as a stream-static join.
    """
    fp = docs_simhash(spark, sf_dir).localCheckpoint(eager=False)
    is_batch = F.pmod(F.col("doc_id"), F.lit(INGEST_MOD)) == F.lit(INGEST_REM)
    batch = fp.where(is_batch)
    corpus = fp.where(~is_batch)
    band = F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band")

    def banded(df, id_alias, sh_alias):
        return (
            df.select("doc_id", "simhash", band)
            .withColumn("band_key", simhash_band_key_col())
            .select(
                F.col("doc_id").alias(id_alias),
                F.col("simhash").alias(sh_alias),
                "band",
                "band_key",
            )
        )

    # batch side broadcast: the standing corpus index never shuffles
    cand = (
        banded(corpus, "c_id", "sh_c")
        .join(F.broadcast(banded(batch, "b_id", "sh_b")), ["band", "band_key"])
        .select("b_id", "sh_b", "c_id", "sh_c")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_b").bitwiseXOR(F.col("sh_c")))
    verified = cand.select("b_id", "c_id", hamming.alias("hamming")).where(
        F.col("hamming") <= HAMMING_THRESHOLD
    )
    from pyspark.sql import Window as W

    best = (
        verified.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("b_id").orderBy("hamming", "c_id")
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # best has at most one row per batch doc — broadcast it so the final
    # left join costs no shuffle either (the plan audit flagged this as
    # the one SortMergeJoin in an operator whose contract says the corpus
    # side is the only big table)
    return batch.select("doc_id").join(
        F.broadcast(best), batch.doc_id == best.b_id, "left"
    ).select(
        "doc_id",
        F.col("c_id").isNotNull().alias("is_dup"),
        F.coalesce("c_id", F.lit(-1)).alias("dup_of"),
        F.coalesce("hamming", F.lit(-1)).cast("long").alias("best_hamming"),
    )


# Fill in the oracle template now that the fp CTE helper exists above.
from ..plans.registry import QUERIES as _QUERIES  # noqa: E402

_QUERIES["docs_incremental_simhash_dedup"].oracle = _QUERIES[
    "docs_incremental_simhash_dedup"
].oracle.format(
    fp_cte=_simhash_oracle_fp(), n_bands=SIMHASH_BANDS, ham=HAMMING_THRESHOLD
)
