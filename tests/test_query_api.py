"""EP3 read-path tests: named .sql registry -> typed DataFrames."""

from __future__ import annotations

from energy_datalake_solution_spark.plans.query_api import (
    list_queries,
    load_query_text,
    run_all,
    run_query,
)

from .conftest import SF_ORACLE


def test_list_and_load():
    names = list_queries()
    assert {"count_customers", "top_suppliers_by_nation", "total_revenue_per_customer"} <= set(
        names
    )
    assert "SELECT" in load_query_text("count_customers").upper()


def test_run_query_typed_result(spark):
    df = run_query(spark, "total_revenue_per_customer", SF_ORACLE)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    # types survive end-to-end (the reference stringifies everything at the
    # result edge, athena_querier.py:80-82; we keep Spark types)
    dtypes = dict(df.dtypes)
    assert dtypes["customer_id"] == "bigint"
    assert dtypes["total_revenue"] == "double"
    # top-k ordering
    revs = [r["total_revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_run_all_error_isolation(spark, tmp_path):
    (tmp_path / "good.sql").write_text("SELECT count(*) AS n FROM customer")
    (tmp_path / "bad.sql").write_text("SELECT FROM nowhere SUCH syntax")
    results = {r.name: r for r in run_all(spark, SF_ORACLE, tmp_path)}
    assert results["good.sql".removesuffix(".sql")].ok
    assert results["good"].dataframe.collect()[0]["n"] > 0
    assert not results["bad"].ok and results["bad"].error
