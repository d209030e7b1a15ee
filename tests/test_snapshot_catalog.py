"""SQL catalog surface over snapshot tables: the reference's .sql files
(sql_queries/*.sql, the re-targeted athena_queries analogs) run VERBATIM
via SnapshotCatalog.sql() against snapshot-BACKED curated tables, with
results equal to the same SQL over the raw parquet lake."""

from __future__ import annotations

import pytest

from energy_datalake_solution_spark.plans.query_api import (
    list_queries,
    load_query_text,
)
from energy_datalake_solution_spark.sources.catalog import load_table
from energy_datalake_solution_spark.sources.snapshot_catalog import (
    SnapshotCatalog,
)
from energy_datalake_solution_spark.sources.snapshots import (
    snapshot_append,
    snapshot_write,
)

from .conftest import SF_ORACLE

_TABLES = ("customer", "supplier", "nation", "orders", "lineitem")


@pytest.fixture(scope="module")
def snap_catalog(spark, tmp_path_factory):
    """A curated lake: each TPC-H table the reference queries touch,
    committed as a snapshot table and registered through the DDL form."""
    root = tmp_path_factory.mktemp("snap_lake")
    cat = SnapshotCatalog(spark)
    for t in _TABLES:
        snapshot_write(load_table(spark, SF_ORACLE, t), root / t)
        cat.sql(
            f"CREATE TABLE {t} USING snapshot OPTIONS (path '{root / t}')"
        )
    return cat, root


def test_reference_sql_files_run_verbatim(spark, snap_catalog):
    """Every sql_queries/*.sql file — the reference query surface — runs
    UNMODIFIED through the snapshot catalog and matches the same SQL over
    the raw parquet frames."""
    cat, _ = snap_catalog
    assert len(list_queries()) >= 3
    for name in list_queries():
        text = load_query_text(name)
        got = cat.sql(text)
        for t in _TABLES:  # same SQL over the raw lake as the oracle
            load_table(spark, SF_ORACLE, t).createOrReplaceTempView(f"raw_{t}")
        raw_text = text
        for t in _TABLES:
            import re

            raw_text = re.sub(rf"\b{t}\b", f"raw_{t}", raw_text)
        want = spark.sql(raw_text)
        assert got.columns == want.columns, name
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), name


def test_catalog_views_stay_fresh_across_commits(spark, snap_catalog):
    """A snapshot table registered in the catalog reflects NEW commits on
    the next sql() call — the re-registration contract (a view pinned at
    CREATE time would silently serve stale data)."""
    cat, root = snap_catalog
    before = cat.sql("SELECT count(*) AS n FROM nation").first().n
    extra = spark.createDataFrame(
        [(900 + i, f"X{i}", 0, "synthetic") for i in range(3)],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    )
    snapshot_append(extra, root / "nation")
    after = cat.sql("SELECT count(*) AS n FROM nation").first().n
    assert after == before + 3


def test_catalog_version_pinning_and_drop(spark, snap_catalog, tmp_path):
    cat, _ = snap_catalog
    t = tmp_path / "pinned"
    snapshot_write(spark.range(4).selectExpr("id AS k"), t)
    snapshot_append(spark.range(4, 9).selectExpr("id AS k"), t)
    cat.sql(
        f"CREATE TABLE pinned USING snapshot LOCATION '{t}' VERSION AS OF 1"
    )
    assert cat.sql("SELECT count(*) AS n FROM pinned").first().n == 4
    cat.sql(
        f"CREATE OR REPLACE TABLE pinned USING snapshot LOCATION '{t}'"
    )
    assert cat.sql("SELECT count(*) AS n FROM pinned").first().n == 9
    cat.sql("DROP TABLE pinned")
    with pytest.raises(Exception):
        cat.sql("SELECT count(*) FROM pinned").collect()


def test_catalog_rejects_duplicates_and_missing_tables(spark, snap_catalog, tmp_path):
    cat, _ = snap_catalog
    with pytest.raises(ValueError, match="already registered"):
        cat.sql(f"CREATE TABLE customer USING snapshot LOCATION '{tmp_path}'")
    with pytest.raises(FileNotFoundError):
        cat.sql(
            f"CREATE TABLE nope USING snapshot LOCATION '{tmp_path / 'void'}'"
        )
