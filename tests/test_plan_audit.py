"""The plan-audit tool must report the plan facts the shape tests assert,
and the engine-wide policy (no cartesians) must hold for EVERY registered
headliner — a fleet-level gate, not a per-query one."""

from __future__ import annotations

from energy_datalake_solution_spark.plans.audit import audit_query
from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

from .conftest import SF_ORACLE

get_queries()


def test_audit_reads_q6_as_scan_bound(spark):
    a = audit_query(spark, "tpch_q6_forecast_revenue", SF_ORACLE)
    assert a.n_scans == 1
    assert a.shuffle_joins == 0 and a.n_broadcast_joins == 0
    assert a.n_cartesian == 0
    assert any("l_shipdate" in f for f in a.pushed_filters)
    # projection pruning: the scan reads only the 4 needed columns
    assert set(a.read_columns) == {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    }


def test_audit_reads_star_join_broadcasts(spark):
    a = audit_query(spark, "star_join_lineitem", SF_ORACLE)
    assert a.n_broadcast_joins >= 1
    assert a.n_sortmerge_joins == 0
    assert not a.violations()


def test_audit_counts_topk(spark):
    a = audit_query(spark, "top_customers_by_revenue", SF_ORACLE)
    assert a.has_topk


def test_headliners_hold_engine_policy(spark):
    """No headliner may contain a cartesian product; single-partition
    exchanges only where a global top-k/sort is the deliberate final step."""
    for name, spec in QUERIES.items():
        if not spec.headline:
            continue
        a = audit_query(spark, name, SF_ORACLE)
        assert a.n_cartesian == 0, f"{name}: cartesian product in plan"
