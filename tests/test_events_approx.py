"""Rank-error bound for the approx-percentile sketch vs the exact operator
(the rows-only registry gate proves it runs; this proves it's CLOSE)."""

from __future__ import annotations

from energy_datalake_solution_spark.operators.events import load_events
from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

from .conftest import SF_ORACLE

get_queries()

ACCURACY = 1000  # must match the operator's accuracy parameter


def test_approx_percentiles_within_rank_error(spark):
    approx = {r.event_type: r for r in
              QUERIES["events_value_approx_percentiles"].fn(spark, SF_ORACLE).collect()}
    values = {}
    for row in load_events(spark, SF_ORACLE).select("event_type", "value").collect():
        values.setdefault(row.event_type, []).append(row.value)
    assert set(approx) == set(values)
    for etype, r in approx.items():
        vs = sorted(values[etype])
        n = len(vs)
        assert r.n == n
        tol = max(1, n // ACCURACY + 1)  # GK guarantee: rank error <= n/accuracy
        for q, got in ((0.25, r.p25), (0.50, r.p50), (0.75, r.p75), (0.90, r.p90)):
            target = int(q * n)
            # rank window the returned value must fall inside
            lo = vs[max(0, target - tol)]
            hi = vs[min(n - 1, target + tol)]
            assert lo <= got <= hi, (etype, q, got, lo, hi)


def test_hll_distinct_within_relative_error(spark):
    """The HLL sketch (rsd 0.01) must land within 5x its configured
    relative standard deviation of the exact count it is emitted beside."""
    r = QUERIES["approx_distinct_parts"].fn(spark, SF_ORACLE).collect()[0]
    assert r.exact_n_parts > 0
    assert abs(r.approx_n_parts - r.exact_n_parts) / r.exact_n_parts <= 0.05
