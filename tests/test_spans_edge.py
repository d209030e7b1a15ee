"""Edge semantics for the token-span dedup tier + the spread() rebalancer.

The sf* oracle runs cover the happy path; these pin the boundary rules on
adversarial inputs the synthetic corpus doesn't contain:
  * the DF_CAP skew guard excludes boilerplate-hot spans from PAIR
    generation but still counts them in the per-doc stats;
  * docs shorter than SPAN tokens contribute nothing (the sequence()
    guard — descending-sequence bug trap);
  * newline normalization makes a span crossing a line break match its
    single-line twin;
  * spread() fans an under-split input out to cluster parallelism and
    leaves well-split inputs alone.
"""

from __future__ import annotations

import pytest

from energy_datalake_solution_spark.operators import spans as SP
from energy_datalake_solution_spark.sources.catalog import spread


def _write_docs(spark, tmp_path, rows):
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    return str(tmp_path)


WORDS = "alpha beta gamma delta epsilon zeta eta theta"  # exactly SPAN tokens


def test_hot_span_excluded_from_pairs_but_counted_in_stats(spark, tmp_path):
    # DF_CAP+2 docs all share the same 8-token span -> hot; two other docs
    # share a rare span -> the only eligible pair.
    hot = [(i, f"{WORDS} filler{i}") for i in range(SP.DF_CAP + 2)]
    rare = [
        (1000, "one two three four five six seven eight uniq1000"),
        (1001, "one two three four five six seven eight uniq1001"),
    ]
    sf_dir = _write_docs(spark, tmp_path, hot + rare)

    pairs = SP.docs_duplicate_span_pairs(spark, sf_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1000, 1001)}

    stats = {r.doc_id: r for r in SP.docs_duplicate_span_stats(spark, sf_dir).collect()}
    # every hot-span doc still sees its shared span in the stats rollup
    assert all(stats[i].n_dup_spans >= 1 for i, _ in hot)
    assert stats[1000].n_dup_spans == 1  # 'one..eight' shared; uniq suffix spans not


def test_short_docs_excluded_everywhere(spark, tmp_path):
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [(1, "only seven tokens in this doc here"), (2, WORDS), (3, WORDS)],
    )
    stats = {r.doc_id: r for r in SP.docs_duplicate_span_stats(spark, sf_dir).collect()}
    assert set(stats) == {2, 3}  # doc 1 has no SPAN-token window
    assert stats[2].n_spans == 1 and stats[2].n_dup_spans == 1
    pairs = SP.docs_duplicate_span_pairs(spark, sf_dir).collect()
    assert {(r.doc_a, r.doc_b, r.n_shared_spans) for r in pairs} == {(2, 3, 1)}


def test_newline_normalized_span_matches(spark, tmp_path):
    broken = WORDS.replace("delta ", "delta\n")  # span crosses a line break
    sf_dir = _write_docs(spark, tmp_path, [(1, WORDS), (2, broken)])
    pairs = SP.docs_duplicate_span_pairs(spark, sf_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


def test_spread_rebalances_only_undersplit_inputs(spark):
    target = spark.sparkContext.defaultParallelism
    skinny = spark.range(1000).coalesce(1)
    assert spread(skinny).rdd.getNumPartitions() == target
    wide = spark.range(1000).repartition(target + 4)
    assert spread(wide) is wide  # no-op: already parallel enough


def test_quality_score_handles_empty_document(spark, tmp_path):
    """An empty text row must yield NULL ratios and 'drop' — not an ANSI
    DIVIDE_BY_ZERO crash (n_chars = 0)."""
    from energy_datalake_solution_spark.operators.text import docs_quality_score

    sf_dir = _write_docs(spark, tmp_path, [(1, ""), (2, WORDS + " " + WORDS)])
    rows = {r.doc_id: r for r in docs_quality_score(spark, sf_dir).collect()}
    assert rows[1].nonalpha_ratio is None
    assert rows[1].quality_flag == "drop"
    assert rows[2].quality_flag == "keep"
