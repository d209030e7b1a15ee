"""Distributed BPE trainer vs a pure-Python reference implementation.

corpus_bpe_merges has no SQL oracle (iterative); this pins exact
equivalence of the learned merge sequence — order, symbols, and weighted
pair counts — against the standard word-frequency BPE loop (Sennrich et
al. 2016) run in plain Python on the same corpus.
"""

from __future__ import annotations

from collections import Counter

from energy_datalake_solution_spark.operators.lm import (
    N_BPE_MERGES,
    corpus_bpe_merges,
)
from energy_datalake_solution_spark.sources.catalog import load_table

from .conftest import SF_ORACLE


def _reference_bpe(word_counts: dict, n_merges: int):
    vocab = {tuple(w): n for w, n in word_counts.items()}
    out = []
    for rank in range(1, n_merges + 1):
        pair_totals: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_totals[(a, b)] += n
        if not pair_totals:
            break
        # max count, ties -> lexicographically smallest (left, right)
        (left, right), total = min(
            pair_totals.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out.append((rank, left, right, left + right, total))
        new_vocab: dict = {}
        for syms, n in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return out


def test_bpe_merge_sequence_matches_reference(spark):
    import pyspark.sql.functions as F

    d = load_table(spark, SF_ORACLE, "documents")
    words = Counter()
    for r in (
        d.select(F.explode(F.split(F.regexp_replace("text", "\n", " "), " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .count()
        .collect()
    ):
        words[r.w] = r["count"]

    expected = _reference_bpe(words, N_BPE_MERGES)
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in corpus_bpe_merges(spark, SF_ORACLE).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_bpe_encode_matches_reference(spark):
    """docs_bpe_encode token counts == applying the reference merge
    sequence per word with the same greedy left-to-right scan."""
    import pyspark.sql.functions as F

    from energy_datalake_solution_spark.operators.lm import docs_bpe_encode

    d = load_table(spark, SF_ORACLE, "documents")
    words = Counter()
    for r in (
        d.select(F.explode(F.split(F.regexp_replace("text", "\n", " "), " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    ):
        words[r.w] = r.n
    merges = [(m[1], m[2]) for m in _reference_bpe(dict(words), N_BPE_MERGES)]

    def ref_encode(word: str) -> int:
        syms = list(word)
        for left, right in merges:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        return len(syms)

    got = {r.doc_id: r for r in docs_bpe_encode(spark, SF_ORACLE).collect()}
    rows = d.select("doc_id", "text").collect()
    assert set(got) == {r.doc_id for r in rows}
    for r in rows:
        ws = [w for w in r.text.replace("\n", " ").split(" ") if w]
        want_tokens = sum(ref_encode(w) for w in ws)
        want_chars = sum(len(w) for w in ws)
        g = got[r.doc_id]
        assert (g.n_words, g.n_chars, g.n_tokens) == (len(ws), want_chars, want_tokens)
        assert abs(g.chars_per_token - round(want_chars / want_tokens, 6)) < 1e-12
