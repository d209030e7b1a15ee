"""Invariant tests for int8 quantization and sequence packing (the oracle
gate proves engine parity; these prove the MATH means what it claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

from .conftest import SF_ORACLE

get_queries()


def test_int8_quantization_error_bound(spark):
    """Symmetric round-to-nearest can never be off by more than half a
    quantization step, and the max-magnitude lane always saturates to
    ±127 by construction of the scale."""
    df = QUERIES["embeddings_int8_quantization"].fn(spark, SF_ORACLE)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.max_rel_error_micro <= 500_000
        assert r.rms_rel_error_micro <= r.max_rel_error_micro
        assert r.n_saturated >= 1
        assert r.scale > 0


def test_sequence_packing_offsets_contiguous(spark):
    """Per-shard offsets must tile the token stream with no gap or overlap:
    the largest start_offset + n_tokens equals the shard's token total."""
    pack = QUERIES["docs_sequence_packing"].fn(spark, SF_ORACLE)
    chk = (
        pack.groupBy("source")
        .agg(
            F.max(F.col("start_offset") + F.col("n_tokens")).alias("end"),
            F.sum("n_tokens").alias("total"),
            F.sum(F.col("crosses_boundary").cast("int")).alias("crossers"),
        )
        .collect()
    )
    assert len(chk) == 20
    for r in chk:
        assert r.end == r.total


def test_sequence_packing_stats_consistent(spark):
    """The stats query must agree with the per-doc assignment it summarizes."""
    pack = QUERIES["docs_sequence_packing"].fn(spark, SF_ORACLE)
    stats = {r.source: r for r in QUERIES["docs_sequence_packing_stats"].fn(spark, SF_ORACLE).collect()}
    agg = (
        pack.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total"),
            F.sum(F.col("crosses_boundary").cast("long")).alias("crossers"),
        )
        .collect()
    )
    for r in agg:
        s = stats[r.source]
        assert s.n_docs == r.n_docs
        assert s.total_tokens == r.total
        assert s.boundary_docs == r.crossers
        assert s.n_sequences * 2048 == s.total_tokens + s.padding_tokens
        assert 0 <= s.padding_tokens < 2048


def test_sequence_packing_single_shard_shuffle(spark):
    """The packing plan must shuffle ONCE, on the shard key — no global
    single-partition window (the scale hazard this operator is designed
    around)."""
    import io
    from contextlib import redirect_stdout

    df = QUERIES["docs_sequence_packing"].fn(spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(source" in plan
    # exactly one exchange node in the plan tree (each node renders once in
    # the tree header and once in the detail section)
    assert plan.count("Exchange (") == 1
