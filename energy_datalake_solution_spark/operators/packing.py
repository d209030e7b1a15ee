"""Sequence packing: concat-and-chunk document layout for training batches.

An LLM training pipeline does not feed one document per sequence — it
concatenates the tokenized corpus and slices it into fixed-length training
sequences (the GPT-style "packed" layout; documents crossing a sequence
boundary get split, and attention masking handles the seam). This module
computes that layout declaratively: a per-shard running token offset
assigns every document its sequence id, boundary-crossing flag, and span
count, plus a per-shard packing-efficiency report.

Relation to ``corpus.py::docs_pack_sequences`` (the round-2 minimal form):
that query answers only "which pack does each document START in" over
synthetic md5-nibble shards. This module is the full layout contract a
dataloader consumes — boundary-crossing flags and span counts (which
documents need splitting + attention masking), per-shard padding
efficiency, packing by the REAL source shard, and an incremental
streaming twin (streaming/pipeline.py::pack_stream_docs) that carries the
running offsets across micro-batches.

Packing is per ``source`` shard, not global: a single global prefix sum
would serialize the corpus through one window partition. Sharded, each
window partition is one source — at 100 TB you additionally sub-shard hot
sources into bounded (source, shard_id) buckets (a deterministic
``pmod(hash(doc_id), n)``) so no partition exceeds executor memory; the
semantics here are per-shard either way. Token counts are whitespace
tokens (same definition as text.py's docs_token_stats), all arithmetic is
integral, so the oracle gate is an exact hash match.

Ordering contract: ``doc_id`` is the corpus primary key (unique — true of
every driver table and any sane corpus). A duplicated id would make the
ROWS-frame running offset tie-order-dependent, i.e. nondeterministic
across runs; run docs_exact_dedup first if ingest cannot guarantee the
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

SEQ_LEN = 2048


def _doc_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, source, n_tokens, start_offset (running within source)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    return docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
    ).withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"))


_OFFSETS_SQL = """
        WITH t AS (
            SELECT doc_id, source,
                   len(string_split(text, ' '))::BIGINT AS n_tokens
            FROM documents
        ),
        off AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                       AS start_offset
            FROM t
        )
"""


@register(
    "docs_sequence_packing",
    oracle=_OFFSETS_SQL
    + f"""
        SELECT doc_id, source, n_tokens, start_offset,
               (start_offset // {SEQ_LEN})::BIGINT AS seq_id,
               ((start_offset + n_tokens - 1) // {SEQ_LEN}
                   - start_offset // {SEQ_LEN} + 1)::BIGINT AS n_sequences_spanned,
               ((start_offset + n_tokens - 1) // {SEQ_LEN}
                   > start_offset // {SEQ_LEN}) AS crosses_boundary
        FROM off
    """,
    tags=("documents", "packing", "window"),
)
def docs_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document its training-sequence id under concat-and-chunk
    packing (SEQ_LEN-token sequences, packed per source shard in doc_id
    order): first sequence touched, how many sequences the document spans,
    and whether it crosses a boundary (needs split + attention masking).
    One window shuffle on the shard key; everything else is codegen
    integer arithmetic."""
    off = _doc_offsets(spark, sf_dir)
    first_seq = F.floor(F.col("start_offset") / SEQ_LEN).cast("long")
    last_seq = F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / SEQ_LEN).cast("long")
    return off.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        first_seq.alias("seq_id"),
        (last_seq - first_seq + 1).alias("n_sequences_spanned"),
        (last_seq > first_seq).alias("crosses_boundary"),
    )


@register(
    "docs_sequence_packing_stats",
    oracle=_OFFSETS_SQL
    + f"""
        SELECT source,
               count(*)::BIGINT AS n_docs,
               sum(n_tokens)::BIGINT AS total_tokens,
               ceil(sum(n_tokens) / {SEQ_LEN}.0)::BIGINT AS n_sequences,
               (ceil(sum(n_tokens) / {SEQ_LEN}.0)::BIGINT * {SEQ_LEN}
                   - sum(n_tokens))::BIGINT AS padding_tokens,
               sum(CASE WHEN (start_offset + n_tokens - 1) // {SEQ_LEN}
                             > start_offset // {SEQ_LEN}
                        THEN 1 ELSE 0 END)::BIGINT AS boundary_docs
        FROM off
        GROUP BY source
    """,
    tags=("documents", "packing", "agg"),
)
def docs_sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing efficiency: sequence count, padding in the final
    partial sequence (concat-and-chunk pads nothing else), and how many
    documents straddle a boundary. The numbers that size a training run's
    dataloader. Rides the same shard-key shuffle as docs_sequence_packing;
    the aggregate itself is map-side combinable."""
    off = _doc_offsets(spark, sf_dir)
    last_seq = F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / SEQ_LEN)
    first_seq = F.floor(F.col("start_offset") / SEQ_LEN)
    n_seq = F.ceil(F.sum("n_tokens") / float(SEQ_LEN)).cast("long")
    return (
        off.withColumn("crosses", (last_seq > first_seq).cast("int"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            n_seq.alias("n_sequences"),
            (n_seq * SEQ_LEN - F.sum("n_tokens")).alias("padding_tokens"),
            F.sum("crosses").cast("long").alias("boundary_docs"),
        )
    )
