"""Vector math over ``array<float>`` embedding columns — pure Spark SQL.

Implemented with higher-order functions (``zip_with``/``aggregate``) so the
whole computation stays JVM-side inside codegen — no Python/Pandas UDF in
the hot path. Floats are cast to double before accumulation so precision
matches a double-accumulating oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (not an ANSI DIVIDE_BY_ZERO crash) when
    either vector has zero norm — matching the oracle engine, whose plain
    division also yields NULL, so zero/missing embeddings drop out of
    threshold filters identically on both sides."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
