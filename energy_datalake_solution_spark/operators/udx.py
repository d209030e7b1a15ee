"""Explicit UDAF / UDTF surface (SURVEY §2.8).

The reference uses built-ins only; the engine's extension tiers are
mostly mapInPandas / applyInPandas(+WithState) kernels (LM scoring,
blocked cosine, multimodal decode, BPE). This module adds the two
remaining user-defined shapes as FIRST-CLASS, oracle-checked registry
entries, so "the UDF/UDAF/UDTF surface exists" is a value-verified claim
rather than an API note:

  * a GROUPED-AGG pandas UDF (vectorized UDAF): per-group Arrow batch in,
    scalar out, usable directly inside groupBy().agg() — the escape hatch
    for aggregations Spark lacks (here IQR; real pipelines: trimmed
    means, custom robust stats, sketch merges);
  * a Python UDTF (table function, Spark 4): one row in, N rows out with
    a declared schema, composable in SQL via LATERAL — the escape hatch
    for row-expanding logic too procedural for transform()/explode()
    (here the fixed-token chunker; real pipelines: parser/decoder fanout).

Both are deliberately REDUNDANT with built-in implementations elsewhere
in the repo (events_value_percentiles, docs_chunk_fixed_tokens) and share
those oracles: the JVM expression forms remain the production default
(UDFs are the slow path), while these rows pin that the Python extension
tier produces identical values through the same gate.

Scale notes: the grouped-agg UDAF buffers one group's values per call —
same constraint as exact percentile; swap to a sketch when groups outgrow
executors. The UDTF is Arrow-batched per row and stateless, so it
pipelines inside the scan stage with zero shuffle, exactly like the
transform()/explode() form it mirrors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import QUERIES, register
from ..sources.catalog import load_table, spread
from .events import load_events
from .spans import CHUNK_STRIDE, CHUNK_TOKENS

# NOTE: pandas_udf / udtf decorators parse their DDL return types against
# the ACTIVE SparkSession, so they cannot run at import time (the registry
# imports every operator module sessionless). Both are built lazily inside
# the operator functions instead.


def _iqr_udafs():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _cnt(v: pd.Series) -> int:
        # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
        # agg() (INVALID_PANDAS_UDF_PLACEMENT); the count rides the same path
        return int(v.count())

    # NULL/NaN policy: NULLs are dropped (the oracle's quantile_cont and
    # the built-in percentile() twin skip them) and pandas folds NaN into
    # the same missing bucket — a deliberate divergence from DuckDB, which
    # sorts NaN greatest; the gate data carries no NaN, and NaN-as-missing
    # is the defensible analytics semantics. A group whose values are ALL
    # missing must yield NULL, not an IndexError from np.percentile([]).
    @pandas_udf("double")
    def _q1(v: pd.Series) -> float:
        import numpy as np

        arr = v.dropna().to_numpy(np.float64)
        return float(np.percentile(arr, 25)) if arr.size else None

    @pandas_udf("double")
    def _q3(v: pd.Series) -> float:
        import numpy as np

        arr = v.dropna().to_numpy(np.float64)
        return float(np.percentile(arr, 75)) if arr.size else None

    return _cnt, _q1, _q3


@register(
    "events_value_iqr_udaf",
    oracle="""
        SELECT event_type,
               CAST(count(value) AS BIGINT) AS n,
               round(quantile_cont(value, 0.25), 6) AS q1,
               round(quantile_cont(value, 0.75), 6) AS q3,
               round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6)
                   AS iqr
        FROM events GROUP BY event_type
    """,
    tags=("events", "agg", "stats", "udaf"),
)
def events_value_iqr_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type interquartile range computed through GROUPED-AGG pandas
    UDFs (numpy percentile inside groupBy().agg()) — the vectorized UDAF
    path. numpy's linear interpolation is the same (n-1)*q rule as
    Spark's percentile and DuckDB's quantile_cont, so the oracle checks
    values bit-for-bit at round(6); events_value_percentiles is the
    built-in twin."""
    _cnt, _q1, _q3 = _iqr_udafs()
    e = load_events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            _cnt(F.col("value")).alias("n"),
            _q1(F.col("value")).alias("rq1"),
            _q3(F.col("value")).alias("rq3"),
        )
        .select(
            "event_type",
            "n",
            F.round("rq1", 6).alias("q1"),
            F.round("rq3", 6).alias("q3"),
            F.round(F.col("rq3") - F.col("rq1"), 6).alias("iqr"),
        )
    )


class _ChunkerUDTF:
    """Fixed-token chunker as a table function: text in, one row per
    32-token window at stride 24 (same constants as the transform()
    form). md5 via hashlib matches Spark/DuckDB md5 on utf-8 bytes.
    Wrapped with the udtf() decorator lazily (see module note)."""

    def eval(self, text: str):
        import hashlib

        if text is None:
            return
        toks = text.replace("\n", " ").split(" ")
        for idx, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
            window = toks[start : start + CHUNK_TOKENS]
            yield (
                idx,
                len(window),
                hashlib.md5(" ".join(window).encode("utf-8")).hexdigest(),
            )


@register(
    "docs_chunk_udtf",
    # the UDTF implements the SAME chunking contract as the expression
    # form, so it shares that oracle FROM THE REGISTRY — a verbatim copy
    # here could silently go stale on a boundary tweak (spans.py is
    # imported above, so its registration precedes this lookup)
    oracle=QUERIES["docs_chunk_fixed_tokens"].oracle,
    tags=("text", "chunking", "udtf"),
)
def docs_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-token chunker through the Python UDTF path (LATERAL
    table function), sharing docs_chunk_fixed_tokens' oracle — identical
    rows through a user-defined table function instead of
    transform()+explode(). Registered per-session under a unique temp
    name; the LATERAL join keeps the expansion inside the scan stage."""
    from pyspark.sql.functions import udtf

    d = spread(load_table(spark, sf_dir, "documents"))
    spark.udtf.register(
        "__chunk_udtf",
        udtf(_ChunkerUDTF, returnType="chunk_idx bigint, n_tokens bigint, chunk_hash string"),
    )
    d.createOrReplaceTempView("__chunk_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_hash
        FROM __chunk_docs d, LATERAL __chunk_udtf(d.text) c
        """
    )
