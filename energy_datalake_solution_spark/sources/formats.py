"""Multi-format source/sink support: parquet, csv, json(l), orc.

The reference reads CSV and writes parquet (dynamic-data-processor.py:31-38,
:155). A general lake ingests whatever lands; these helpers give each format
one read and one write entry point with the engine's dialect defaults, all
returning lazy DataFrames (schema optional everywhere; required for
streaming sources).

Format guidance at scale: parquet (columnar, stats, pruning) for analytics
zones; orc equivalent where the ecosystem prefers it; csv/json only at the
ingest edge — they are row-oriented, schema-on-read, and non-splittable when
compressed with gzip, so convert on first touch.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_DIALECT = {"header": True, "sep": ",", "quote": '"', "escape": "\\"}


def read_any(
    spark: SparkSession,
    path: str | Path,
    fmt: Optional[str] = None,
    schema: Optional[T.StructType] = None,
    infer: bool = True,
) -> DataFrame:
    """Read a table in any supported format; fmt defaults from the extension."""
    p = str(path)
    fmt = fmt or Path(p).suffix.lstrip(".").lower() or "parquet"
    if fmt in ("jsonl", "ndjson"):
        fmt = "json"
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(p)
    if fmt == "orc":
        return reader.orc(p)
    if fmt == "csv":
        opts = dict(CSV_DIALECT)
        if schema is None and infer:
            opts["inferSchema"] = True
        return reader.options(**opts).csv(p)
    if fmt == "json":
        return reader.json(p)
    raise ValueError(f"unsupported format: {fmt}")


def read_evolved(spark: SparkSession, path: str | Path, fmt: str = "parquet") -> DataFrame:
    """Read a table whose files were written under EVOLVING schemas
    (columns added over time — the normal life of a lake table fed by the
    dynamic/unrecognized ingest path, SURVEY §1.3 mode 3).

    ``mergeSchema`` unions the per-file footers: rows from files lacking a
    column read as NULL. Scale note: footer merging reads every file's
    metadata up front — at 100 TB-scale file counts, keep it off (default)
    for hot paths and evolve readers via an explicit contract instead;
    this entry point is for exploration and backfill over mixed vintages.
    """
    fmt = (fmt or "parquet").lower()
    if fmt == "parquet":
        return spark.read.option("mergeSchema", True).parquet(str(path))
    if fmt == "orc":
        return spark.read.option("mergeSchema", True).orc(str(path))
    raise ValueError(f"schema merge unsupported for format: {fmt}")


def write_any(
    df: DataFrame,
    path: str | Path,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[str] = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    p = str(path)
    if fmt in ("jsonl", "ndjson"):
        fmt = "json"  # same aliases as read_any (one line per record)
    if fmt == "parquet":
        w.parquet(p)
    elif fmt == "orc":
        w.orc(p)
    elif fmt == "csv":
        w.options(**CSV_DIALECT).csv(p)
    elif fmt == "json":
        w.json(p)
    else:
        raise ValueError(f"unsupported format: {fmt}")
