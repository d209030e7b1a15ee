"""EP3 — the analytical read path: named SQL queries -> typed DataFrames.

Re-expresses the reference's client stack (scripts/main_analytics.py +
scripts/athena_querier.py + athena_queries/*.sql) without a remote engine:

  * SQL text lives in .sql files under sql_queries/ (reference keeps them in
    athena_queries/, loaded at scripts/athena_querier.py:14-23)
  * a name -> file registry executed in a loop with per-query error
    isolation (reference: scripts/main_analytics.py:26-43)
  * execution is spark.sql over registered temp views — synchronous, so the
    reference's submit/poll/paginate state machine (athena_querier.py:49-84)
    collapses to one call
  * results stay TYPED DataFrames end-to-end; the reference coerces every
    cell to string at the result edge (athena_querier.py:80-82) and loses
    types — .toPandas() here happens only on demand at the client edge
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import register_views

SQL_DIR = Path(__file__).resolve().parent.parent / "sql_queries"


def load_query_text(name: str, sql_dir: str | Path = SQL_DIR) -> str:
    """SQL text source (reference: athena_querier.py:14-23)."""
    path = Path(sql_dir) / f"{name}.sql"
    return path.read_text()


def list_queries(sql_dir: str | Path = SQL_DIR) -> list[str]:
    return sorted(p.stem for p in Path(sql_dir).glob("*.sql"))


def run_query(
    spark: SparkSession, name: str, sf_dir: str, sql_dir: str | Path = SQL_DIR
) -> DataFrame:
    """Execute one named SQL query against the lake's registered views.
    View registration is memoized per session: clients issuing many calls
    must not re-read every table's parquet schema per query."""
    _register_views_once(spark, sf_dir)
    return spark.sql(load_query_text(name, sql_dir))


# The memo lives IN the session's runtime conf, not a process-global dict:
# the view names are session-global, so the only safe memo key is "which
# sf_dir do this session's views currently point at". A conf entry dies
# with its session (no stale id()-reuse hits) and flips atomically when a
# caller switches lakes, re-registering instead of silently serving the
# previous lake's tables — the wrong-lake bug a (id(spark), sf_dir)-keyed
# set had, where each lake's key stayed "registered" after the views were
# re-pointed elsewhere.
_VIEWS_CONF_KEY = "spark.sql.session.graft.registeredSfDir"


def _register_views_once(spark: SparkSession, sf_dir: str) -> None:
    if spark.conf.get(_VIEWS_CONF_KEY, None) == str(sf_dir):
        return
    register_views(spark, sf_dir)
    spark.conf.set(_VIEWS_CONF_KEY, str(sf_dir))


@dataclass
class QueryRunResult:
    name: str
    ok: bool
    dataframe: DataFrame | None = None
    error: str = ""


def run_all(
    spark: SparkSession, sf_dir: str, sql_dir: str | Path = SQL_DIR
) -> list[QueryRunResult]:
    """Run every registered .sql query with per-query error isolation
    (reference: main_analytics.py:35-43 catches and logs per query)."""
    _register_views_once(spark, sf_dir)
    results: list[QueryRunResult] = []
    for name in list_queries(sql_dir):
        try:
            # spark.sql analyzes eagerly — a missing table or bad column
            # raises right here, giving the per-query isolation below
            df = spark.sql(load_query_text(name, sql_dir))
            results.append(QueryRunResult(name, True, df))
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            results.append(QueryRunResult(name, False, None, str(exc)))
    return results
