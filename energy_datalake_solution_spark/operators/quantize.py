"""Embedding compression: per-vector symmetric int8 scalar quantization.

The ANN tier (similarity.py) answers "which vectors are close"; this module
answers "how do 100 TB of fp32 embeddings fit in serving memory". Per-vector
symmetric int8 — the scalar-quantizer layout used by public FAISS
(IndexScalarQuantizer QT_8bit) and the IVF-SQ8 papers — cuts storage 4x
(64 floats -> 64 bytes + one fp32 scale) while keeping inner products
computable in integer space.

Engine-exact determinism (the whole query is oracle-hash-gated):

* quantize with an explicit ``floor(x / scale + 0.5)`` instead of round():
  division, addition, and floor are exactly-defined IEEE ops, so Spark and
  DuckDB produce bit-identical codes from bit-identical inputs (engine
  round() half-way conventions differ; floor sidesteps that);
* the reconstruction-error sum accumulates left-to-right in double on both
  sides (F.aggregate vs list_sum — same evaluation order, see
  functions/vector.py);
* error figures are emitted as ``floor(err * 1e6)`` micro-unit integers,
  NOT round(err, 6) — floor has no half-way tie convention to disagree on
  between engines;
* error is measured RELATIVE to the scale (``x / scale - q``, in units of
  one quantization step): division and subtraction are single IEEE ops,
  exactly reproducible on both engines, and absolute error is just
  rel * scale;
* the display rounding of ``scale`` happens in a projection AFTER every
  expression that consumes scale — see the in-function note on Spark's
  lateral-column-alias resolution, which otherwise silently substitutes
  the rounded value into sibling expressions;
* zero vectors (scale = 0) are dropped by the same predicate on both sides.

100 TB posture: strictly per-row (narrow projection of vec_id + embedding,
no shuffle, no UDF — everything is codegen'd higher-order functions), so it
scales embarrassingly; the output is the 4x-smaller table you bucket-write
for the ANN serving tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

INT8_MAX = 127
DIM = 64


@register(
    "embeddings_int8_quantization",
    oracle=f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS x
            FROM embeddings
        ),
        scaled AS (
            SELECT vec_id, x,
                   list_max(list_transform(x, v -> abs(v))) / {INT8_MAX}.0 AS scale
            FROM base
        ),
        coded AS (
            SELECT vec_id, x, scale,
                   list_transform(x, v ->
                       greatest(-{INT8_MAX}, least({INT8_MAX},
                           floor(v / scale + 0.5)::BIGINT))) AS qv
            FROM scaled
            WHERE scale > 0
        )
        SELECT vec_id,
               round(scale, 9) AS scale,
               list_sum(qv)::BIGINT AS q_checksum,
               len(list_filter(qv, v -> abs(v) = {INT8_MAX})) AS n_saturated,
               floor(sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                     i -> (x[i] / scale - qv[i]) * (x[i] / scale - qv[i]))) / {DIM})
                     * 1e6)::BIGINT AS rms_rel_error_micro,
               floor(list_max(list_transform(range(1, {DIM + 1}),
                     i -> abs(x[i] / scale - qv[i]))) * 1e6)::BIGINT AS max_rel_error_micro
        FROM coded
    """,
    headline=True,
    tags=("embeddings", "compression", "quantization"),
)
def embeddings_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding table with
    reconstruction-error audit: scale = max|x| / 127, code = clamp(floor(x /
    scale + 0.5)). Emits per vector the scale, an integer code checksum
    (exact), the saturated-lane count, and RMS / max RELATIVE error in
    micro-steps (error in units of one quantization step, x/scale - code;
    multiply by scale for absolute) — the figures a quantization rollout
    decision needs. NULL and zero vectors drop out via the scale > 0
    predicate on both engines."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    df = emb.select("vec_id", x.alias("x"))
    scale = (F.array_max(F.transform(F.col("x"), F.abs)) / float(INT8_MAX)).alias("scale")
    df = df.select("vec_id", "x", scale).where(F.col("scale") > 0)
    qv = F.transform(
        F.col("x"),
        lambda v: F.greatest(
            F.lit(-INT8_MAX),
            F.least(F.lit(INT8_MAX), F.floor(v / F.col("scale") + 0.5)),
        ).cast("long"),
    )
    df = df.select("vec_id", "x", "scale", qv.alias("qv"))
    err = F.zip_with(F.col("x"), F.col("qv"), lambda a, q: a / F.col("scale") - q.cast("double"))
    sse = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e)
    # NOTE: the display rounding of scale happens in a SEPARATE projection:
    # aliasing round(scale, 9) AS scale in the same select whose sibling
    # expressions reference col("scale") made Spark resolve those references
    # against the rounded alias (lateral-column-alias resolution), silently
    # shifting x/scale by ~2e-7 relative and flipping the floored error
    # metrics vs the oracle.
    out = df.select(
        "vec_id",
        "scale",
        F.aggregate(F.col("qv"), F.lit(0).cast("long"), lambda acc, v: acc + v).alias(
            "q_checksum"
        ),
        F.size(F.filter(F.col("qv"), lambda v: F.abs(v) == INT8_MAX))
        .cast("long")
        .alias("n_saturated"),
        F.floor(F.sqrt(sse / DIM) * 1e6).alias("rms_rel_error_micro"),
        F.floor(F.array_max(F.transform(err, F.abs)) * 1e6).alias("max_rel_error_micro"),
    )
    return out.withColumn("scale", F.round("scale", 9))
