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


def test_sharded_ffill_equals_single_window(spark):
    """The (type, day)-sharded two-pass forward-fill must reproduce the
    single-window form row-for-row on the standard tables."""
    from .conftest import SF_ORACLE

    a = (
        QUERIES["events_resample_hourly_ffill"].fn(spark, SF_ORACLE)
        .orderBy("event_type", "hour_start")
        .collect()
    )
    b = (
        QUERIES["events_resample_hourly_ffill_sharded"].fn(spark, SF_ORACLE)
        .orderBy("event_type", "hour_start")
        .collect()
    )
    assert a == b
    assert len(a) > 0


def test_sharded_ffill_carries_across_fully_empty_days(spark, tmp_path):
    """A multi-day gap (whole shards with zero observations) must carry the
    last value across EVERY empty shard — the case a naive per-shard fill
    (no second pass) silently nulls out."""
    import datetime as dt

    d = tmp_path / "gappy"
    d.mkdir()
    rows = [
        (1, dt.datetime(2025, 1, 1, 5), 7, "ping", 42.0, "{}"),
        (2, dt.datetime(2025, 1, 1, 9), 7, "ping", 17.0, "{}"),
        # days 2-4: nothing at all
        (3, dt.datetime(2025, 1, 5, 3), 7, "ping", 99.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    single = (
        QUERIES["events_resample_hourly_ffill"].fn(spark, str(d))
        .orderBy("event_type", "hour_start")
        .collect()
    )
    sharded = (
        QUERIES["events_resample_hourly_ffill_sharded"].fn(spark, str(d))
        .orderBy("event_type", "hour_start")
        .collect()
    )
    assert single == sharded
    by_hour = {r.hour_start: r for r in sharded}
    # a gap hour deep inside the empty-day stretch carries day 1's last value
    probe = dt.datetime(2025, 1, 3, 12)
    assert by_hour[probe].is_gap and by_hour[probe].filled_max == 17.0
    assert by_hour[dt.datetime(2025, 1, 5, 3)].filled_max == 99.0


def test_heavy_hitters_mg_guarantees(spark):
    """Misra-Gries bounds, pinned deterministically: (1) est_count never
    exceeds the true count and undercounts by at most n/(HH_K+1); (2)
    every user whose true count exceeds that bound appears in the sketch
    output; (3) a skew-planted corpus surfaces its dominant user first —
    all driven through the registered operator's own kernel."""
    from pyspark.sql import functions as F

    from energy_datalake_solution_spark.operators.events import (
        HH_K,
        events_user_heavy_hitters,
        load_events,
        mg_heavy_hitters,
    )

    from .conftest import SF_ORACLE

    e = load_events(spark, SF_ORACLE).where(F.col("user_id").isNotNull())
    n = e.count()
    true = {
        r.user_id: r.c
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    bound = n / (HH_K + 1)
    got = {
        r.user_id: r.est_count
        for r in events_user_heavy_hitters(spark, SF_ORACLE).collect()
    }
    assert got  # non-empty on a non-empty corpus
    for u, est in got.items():
        assert est <= true[u], f"overcount for {u}"
        assert true[u] - est <= bound, f"undercount beyond n/(k+1) for {u}"
    for u, c in true.items():
        if c > bound:
            assert u in got, f"true heavy hitter {u} (count {c}) missing"

    # skew-planted corpus: one user owns half the stream
    skew = spark.createDataFrame(
        [(7 if i % 2 == 0 else 1000 + i,) for i in range(4000)], "user_id long"
    )
    top = mg_heavy_hitters(skew).collect()
    assert top[0].user_id == 7
    assert top[0].est_count >= 2000 - 4000 // (HH_K + 1)
