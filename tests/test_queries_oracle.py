"""t2 mirror: every registry query vs its DuckDB oracle at small scale."""

from __future__ import annotations

import pytest

from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection

get_queries()  # populate registry
ALL = sorted(QUERIES)
WITH_ORACLE = [n for n in ALL if QUERIES[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if QUERIES[n].oracle is None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    spark_df = spec.fn(spark, SF_ORACLE)
    duck_df = duck.execute(spec.oracle).fetchdf()
    problems = compare(spark_df, duck_df, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"customer_id", "customer_name", "total_revenue"} == set(df.columns)


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10


def test_surface_orders_name_registered_queries():
    """Every name in the gate-ordering tuples must be a registered query —
    a rename that orphans an entry would silently shrink the driver's
    checked window."""
    from energy_datalake_solution_spark.plans.registry import (
        SURFACE_ORDER,
        SURFACE_ORDER_NEXT,
    )

    for name in SURFACE_ORDER + SURFACE_ORDER_NEXT:
        assert name in QUERIES, name
    assert len(set(SURFACE_ORDER)) == len(SURFACE_ORDER)
    assert len(set(SURFACE_ORDER_NEXT)) == len(SURFACE_ORDER_NEXT)
