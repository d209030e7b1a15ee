"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in the package registry
(energy_datalake_solution_spark/plans/registry.py); operator modules
register themselves on import. This file is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from energy_datalake_solution_spark.plans.registry import get_oracles, get_queries
from energy_datalake_solution_spark.plans.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-10 customers by net revenue for one year over the
    lineitem x orders x customer star join (the richest reference-query
    shape: SUM + year filter + ORDER BY DESC LIMIT, reference:
    athena_queries/total_cost_per_customer.sql:1-12).
    """
    tune_session(spark)
    return get_queries()["top_customers_by_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    fns = get_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in fns.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return get_oracles()
