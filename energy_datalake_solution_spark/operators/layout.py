"""Data-layout operators: multi-dimensional clustering for scan pruning.

The reference's layout story is one Hive-style partition column per table
(`fecha_carga`, reference: dynamic-data-processor.py:49-55) — a single-
dimension prune. At 100 TB a fact table is queried on MORE than one key
(orderkey ranges, partkey lookups), and a linear sort on one column makes
the other a full scan. Z-ORDERING (interleaving the bits of several sort
keys, as in Delta Lake's OPTIMIZE ZORDER BY and the classic Morton curve)
is the standard lakehouse answer: files written in z-value ranges cover a
small rectangle in (x, y) space, so min/max file statistics prune scans
on EITHER dimension.

The operator below computes the z-value with pure JVM bit arithmetic
(shiftright/shiftleft/AND — whole-stage-codegen'd, no UDF), buckets rows
into would-be files, and emits each bucket's per-dimension min/max spans:
exactly the file-skipping statistics a writer would get from
``df.repartitionByRange(N, "z").sortWithinPartitions("z")`` followed by a
parquet write. The oracle recomputes the identical interleave in SQL, so
the bucketing is value-checked, not just shape-checked; the companion
pytest asserts the locality guarantee itself (every bucket's x/y span
<= the Morton-cell bound, far below the ~full-range span a single-key
sort leaves on its minor dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

Z_BITS = 10  # bits per dimension -> 20-bit z-value
Z_BUCKETS = 64  # would-be files; each covers a 128x128 Morton cell


def _z_terms(x: str, y: str) -> "F.Column":
    """Morton interleave: bit i of x -> z bit 2i, bit i of y -> z bit 2i+1.

    Built as a 2*Z_BITS-term sum of shift/mask expressions — all JVM
    built-ins inside one codegen stage, no UDF, no shuffle.
    """
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = z + F.shiftleft(F.shiftright(F.col(x), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(F.col(y), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def _z_sql_terms(x: str, y: str) -> str:
    """The identical interleave as ANSI SQL text for the DuckDB oracle.

    Every shift term is FULLY parenthesized: SQL gives `<<` lower
    precedence than `+`, so an unparenthesized sum of shifts associates
    into nested shifts and overflows.
    """
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "lineitem_zorder_layout",
    oracle=f"""
        WITH keyed AS (
            SELECT l_orderkey % {1 << Z_BITS} AS x,
                   l_partkey % {1 << Z_BITS} AS y
            FROM lineitem
        ),
        z AS (
            SELECT x, y, ({_z_sql_terms("x", "y")}) AS zval
            FROM keyed
        )
        SELECT CAST(zval // {(1 << (2 * Z_BITS)) // Z_BUCKETS} AS BIGINT)
                   AS zbucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(x) AS BIGINT) AS x_min,
               CAST(max(x) AS BIGINT) AS x_max,
               CAST(min(y) AS BIGINT) AS y_min,
               CAST(max(y) AS BIGINT) AS y_max
        FROM z
        GROUP BY 1
    """,
    tags=("layout", "scan-pruning"),
)
def lineitem_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout statistics for lineitem clustered on
    (l_orderkey, l_partkey): bucket rows by interleaved-bit z-value and
    report each would-be file's per-dimension min/max — the file-skipping
    statistics that make point/range queries on EITHER key prune to
    O(files^(1/2)) instead of a full scan.

    Scale path: the z-value is a pure projection (codegen, zero shuffle);
    the real writer is one range-repartition on z + sortWithinPartitions
    + parquet write, i.e. exactly ONE shuffle to cluster 100 TB on two
    dimensions at once. The bucket aggregation here stands in for the
    parquet footer min/max stats so the layout quality is oracle-checkable
    as values, and tests/test_layout.py asserts the Morton locality bound
    (every bucket spans <= 128 in x AND y; a single-key sort leaves the
    minor dimension's span at ~the full 1024 range).
    """
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.pmod(F.col("l_orderkey"), F.lit(1 << Z_BITS)).cast("long").alias("x"),
        F.pmod(F.col("l_partkey"), F.lit(1 << Z_BITS)).cast("long").alias("y"),
    )
    cell = (1 << (2 * Z_BITS)) // Z_BUCKETS
    return (
        keyed.withColumn("zval", _z_terms("x", "y"))
        .groupBy((F.col("zval") / F.lit(cell)).cast("bigint").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
