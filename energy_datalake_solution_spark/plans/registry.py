"""Named-query registry — the engine's query surface.

The reference drives its analytics through a name -> SQL-file registry
executed in a loop (reference: scripts/main_analytics.py:26-43). Here the
same idea is a decorator registry mapping a query name to:

  * ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation
    (DataFrame API, Catalyst-optimized), and
  * ``oracle`` — an equivalent ANSI-SQL string runnable by DuckDB over the
    same parquet tables, used as an independent correctness oracle.

Queries with no SQL-expressible equivalent (approximate LSH joins, seeded
ML models) register ``oracle=None`` and get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None  # ANSI SQL for DuckDB; None => rows-only check
    headline: bool = False        # include in bench.py timing loop
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: add a query to the engine's registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def _load_all() -> None:
    """Import operator modules for their registration side effects."""
    from ..operators import (  # noqa: F401
        corpus,
        dedup,
        events,
        multimodal,
        relational,
        relational_ext,
        similarity,
        skew,
        temporal,
        text,
        tpch,
    )


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def get_headliners() -> dict[str, QuerySpec]:
    _load_all()
    return {name: spec for name, spec in QUERIES.items() if spec.headline}
