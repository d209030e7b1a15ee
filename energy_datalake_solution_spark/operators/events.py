"""Event-stream analytics over the ``events`` table (batch twins of the
streaming pipeline in streaming/pipeline.py).

The reference is event-driven but not stream-processing (SURVEY §2.8) — the
S3-trigger -> Lambda -> Glue chain has no windows/watermarks. These operators
add the stream-analytics surface the north star requires, implemented so the
exact same expressions run under Structured Streaming with a watermark.

Timestamp precision: the parquet `ts` is nanosecond; Spark's TimestampType
is microsecond while DuckDB keeps nanos, so every emitted timestamp is
window-start / second-truncated — never a raw `ts` — keeping both engines
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

SESSION_GAP_MINUTES = 360  # 6 h gap closes a session


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load `events` with a proper TimestampType `ts`.

    The parquet stores TIMESTAMP(NANOS), which Spark's microsecond
    TimestampType rejects; with spark.sql.legacy.parquet.nanosAsLong (set
    once by plans.session.tune_session — every contract entry point runs
    it) the column arrives as int64 nanos and is floor-divided to micros
    here. If a future rewrite of the table uses micros, the passthrough
    branch applies.
    """
    from pyspark.sql import types as T

    # Idempotent safety net for sessions that skipped tune_session (e.g. a
    # registry function called directly on a bare SparkSession): without
    # this conf the TIMESTAMP(NANOS) parquet read throws. Setting it is a
    # cheap runtime-conf write; locked-host failures fall through to the
    # original (clear) Spark error.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    e = load_table(spark, sf_dir, "events")
    if isinstance(e.schema["ts"].dataType, T.LongType):
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return e


@register(
    "events_tumbling_hourly",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    headline=True,
    tags=("events", "window-agg"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: event counts and value sums per type.

    Uses Spark's `window()` (not date_trunc) so the identical expression
    works in Structured Streaming with `withWatermark` for late data.
    """
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_30m",
    oracle="""
        WITH g AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS tb, value FROM events
        )
        SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM (
            SELECT unnest([tb, tb - INTERVAL '30 minutes']) AS window_start, value
            FROM g
        )
        GROUP BY window_start
    """,
    tags=("events", "window-agg"),
)
def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour duration, 30-minute slide — every event lands
    in exactly two windows. Spark's window(duration, slide) expands rows
    internally; the oracle materializes the same two window-starts."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "events_sessionization",
    oracle=f"""
        WITH e AS (
            SELECT user_id, date_trunc('second', ts) AS ts_s, value FROM events
        ),
        flagged AS (
            SELECT user_id, ts_s, value,
                   CASE WHEN lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL
                             OR date_diff('second',
                                          lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s),
                                          ts_s) > {SESSION_GAP_MINUTES * 60}
                        THEN 1 ELSE 0 END AS new_session
            FROM e
        ),
        sessions AS (
            SELECT user_id, ts_s, value,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts_s) AS session_start, max(ts_s) AS session_end,
               round(sum(value), 2) AS session_value
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    tags=("events", "session"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (6 h inactivity closes a session): classic
    lag -> new-session flag -> cumulative-sum session id -> per-session agg.

    Batch twin of `session_window()` in the streaming pipeline. Timestamps
    are second-truncated so the gap comparison is precision-stable.
    """
    e = load_events(spark, sf_dir).select(
        "user_id", F.date_trunc("second", "ts").alias("ts_s"), "value"
    )
    w = W.partitionBy("user_id").orderBy("ts_s")
    gap_s = SESSION_GAP_MINUTES * 60
    prev = F.lag("ts_s").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(
            prev.isNull()
            | (F.unix_timestamp("ts_s") - F.unix_timestamp(prev) > gap_s),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_s").alias("session_start"),
        F.max("ts_s").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "events_json_props",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1
    """,
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract a JSON property and aggregate on it.
    `get_json_object` is JVM-side (Jackson) — no UDF."""
    e = load_events(spark, sf_dir)
    return (
        e.withColumn("prop_k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("prop_k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "events_daily_user_activity",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS activity_date,
               user_id,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_event_types
        FROM events
        GROUP BY 1, 2
    """,
    tags=("events", "agg"),
)
def events_daily_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily activity rollup — the partition-friendly shape for a
    100 TB event lake (aggregate within date partitions, no cross-date
    shuffle when the lake is date-partitioned)."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("activity_date"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
    )


@register(
    "events_value_outliers",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   avg(value) AS mean_value,
                   stddev_samp(value) AS sd_value
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE e.value > s.mean_value + 3 * s.sd_value
    """,
    tags=("events", "stats"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly detection: events whose value exceeds the
    type's mean + 3 sigma. The per-type stats are a tiny aggregate joined
    back as a broadcast — two scans, no per-row window state, which is the
    shape that survives a 100 TB event table (a global window over the fact
    would sort it). The 3-sigma cut is a strict inequality on continuous
    doubles, so the ~1e-12 cross-engine difference in the float aggregates
    cannot flip a row in practice."""
    e = load_events(spark, sf_dir)
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mean_value"),
        F.stddev_samp("value").alias("sd_value"),
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.col("value") > F.col("mean_value") + 3 * F.col("sd_value"))
        .select("event_id", "event_type", "value")
    )


# --------------------------------------------------------------------------
# Exact per-type value percentiles
# --------------------------------------------------------------------------
@register(
    "events_value_percentiles",
    oracle="""
        SELECT event_type,
               CAST(count(value) AS BIGINT) AS n,
               round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.50), 6) AS p50,
               round(quantile_cont(value, 0.75), 6) AS p75,
               round(quantile_cont(value, 0.90), 6) AS p90
        FROM events GROUP BY event_type
    """,
    tags=("events", "agg", "stats"),
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles of `value` per event type —
    the latency/size distribution profile a pipeline SLO report needs.

    Spark's `percentile` and DuckDB's `quantile_cont` both interpolate at
    position (n-1)*q over the sorted group, so round(6) agrees exactly.
    Exact percentile buffers each group's values on the reducer — fine
    while per-type cardinality fits an executor (the grouping key is
    event_type, ~10 values); at 100 TB with heavy groups, swap in
    `approx_percentile(value, q, accuracy)` — same plan shape, bounded
    state, and the oracle gate is then rows-only since the sketch is
    engine-specific.
    """
    e = load_events(spark, sf_dir)
    pct = F.expr("percentile(value, array(0.25, 0.50, 0.75, 0.90))")
    return (
        e.groupBy("event_type")
        .agg(F.count("value").alias("n"), pct.alias("p"))
        .select(
            "event_type",
            "n",
            F.round(F.col("p")[0], 6).alias("p25"),
            F.round(F.col("p")[1], 6).alias("p50"),
            F.round(F.col("p")[2], 6).alias("p75"),
            F.round(F.col("p")[3], 6).alias("p90"),
        )
    )


@register(
    "events_value_approx_percentiles",
    oracle=None,  # sketch results are engine-specific -> rows-only gate;
    # the rank-error bound vs the exact operator is pinned in
    # tests/test_events_approx.py
    tags=("events", "agg", "stats", "approx"),
)
def events_value_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-state form of events_value_percentiles: Spark's
    approx_percentile (Greenwald-Khanna style sketch, accuracy=1000 ->
    rank error <= n/1000 per group) replaces the exact buffer. Same plan
    shape, same output schema; this is the variant the exact operator's
    docstring promises for heavy groups at 100 TB, registered first-class
    so the swap is a one-name change for callers. The sketch merges
    map-side like any partial aggregate, so per-group state is O(accuracy)
    regardless of group size."""
    e = load_events(spark, sf_dir)
    pct = F.expr("approx_percentile(value, array(0.25, 0.50, 0.75, 0.90), 1000)")
    return (
        e.groupBy("event_type")
        .agg(F.count("value").alias("n"), pct.alias("p"))
        .select(
            "event_type",
            "n",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p75"),
            F.col("p")[3].alias("p90"),
        )
    )


# --------------------------------------------------------------------------
# Ordered funnel analysis
# --------------------------------------------------------------------------
@register(
    "events_funnel_view_click_purchase",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT 'view>click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL
        SELECT 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p
    """,
    tags=("events", "funnel", "agg"),
)
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view -> click -> purchase): users count
    toward a stage only if it happened strictly AFTER their entry into the
    previous stage — the sequential-pattern rollup every product-analytics
    warehouse runs.

    Plan shape: ONE scan + ONE user_id shuffle (the oracle's three
    self-joins each re-shuffle the event stream). Each user's click and
    purchase timestamps are collected and the stage chain resolves with
    array filters — the ClickHouse windowFunnel strategy. Per-user state
    is that user's own click/purchase timestamps (spillable, bounded by
    per-user activity, never corpus-sized); if a pathological user has
    millions of events, the alternative is the oracle's shape — three
    aggregations joined on the SAME user_id key so the exchanges reuse —
    at the cost of extra passes.
    """
    e = load_events(spark, sf_dir)
    # min event ts per (user, type) — one shuffle, 5 rows max per user
    m = (
        e.where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            # collect_list drops the nulls the when() leaves on other types
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
            ).alias("clicks"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
            ).alias("purchases"),
        )
    )
    # earliest click strictly after the first view, then earliest purchase
    # strictly after that click — array filter over per-user sorted minima
    # try_element_at: a user with a view but no qualifying click has an
    # EMPTY filtered array — plain element_at throws under ANSI mode
    # (caught by tests/test_properties.py::test_funnel_matches_reference)
    t_click = F.try_element_at(
        F.filter(F.col("clicks"), lambda t: t > F.col("t_view")), F.lit(1)
    )
    t_purchase = F.try_element_at(
        F.filter(F.col("purchases"), lambda t: t > F.col("t_click")), F.lit(1)
    )
    staged = (
        m.where(F.col("t_view").isNotNull())
        .withColumn("t_click", t_click)
        .withColumn("t_purchase", t_purchase)
    )
    return staged.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    ).selectExpr(
        "stack(3, 'view', n_view, 'view>click', n_click, "
        "'view>click>purchase', n_purchase) AS (stage, n_users)"
    )


# --------------------------------------------------------------------------
# Cohort retention
# --------------------------------------------------------------------------
@register(
    "events_weekly_cohort_retention",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week
            FROM events
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT)
                   AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM activity a JOIN first_seen f USING (user_id)
        GROUP BY 1, 2
    """,
    tags=("events", "cohort", "agg"),
)
def events_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-seen week,
    counted in every subsequent week they were active — the
    product-analytics staple next to the funnel.

    Both aggregations and the join key on user_id, so the first-seen
    exchange and the activity exchange hash-partition identically and the
    join adds no extra corpus shuffle; the final rollup groups the
    user-week table (bounded by users x active weeks) down to the
    cohort-x-offset matrix, which is tiny. Week offsets divide exactly
    because both endpoints are week-truncated."""
    e = load_events(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_value_histogram",
    oracle="""
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
               round(CAST(floor(value / 25.0) AS BIGINT) * 25.0, 6) AS bucket_low,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1
    """,
    tags=("events", "histogram", "agg"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (width 25) — the profiling
    companion to the exact percentiles: one groupBy on the derived bucket
    key (bounded cardinality = value_range / width), map-side combine does
    nearly all the work, output is dashboard-sized."""
    e = load_events(spark, sf_dir)
    bucket = F.floor(F.col("value") / 25.0).cast("long")
    return (
        e.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "bucket",
            F.round(F.col("bucket") * 25.0, 6).alias("bucket_low"),
            "n_events",
            "total_value",
        )
    )


# shared by the single-window and sharded-two-pass resample forms: they
# implement identical semantics, so one oracle gates both (any divergence
# between the two implementations fails one of the two hash rows)
_RESAMPLE_FFILL_ORACLE = """
        WITH obs AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*)::BIGINT AS n_events, max(value) AS observed_max
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY 1
        ),
        grid AS (
            SELECT b.event_type,
                   UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
            FROM bounds b
        )
        SELECT g.event_type, g.h AS hour_start,
               COALESCE(o.n_events, 0) AS n_events,
               o.observed_max AS observed_max,
               last_value(o.observed_max IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_max,
               (o.n_events IS NULL) AS is_gap
        FROM grid g
        LEFT JOIN obs o ON o.event_type = g.event_type AND o.h = g.h
    """


def _hourly_obs_bounds(e: DataFrame):
    """Shared first stage of both resample+ffill forms: per-(type, hour)
    observation aggregates and each type's [h0, h1] hour range. ONE
    definition — the two operators are gated by one oracle on the premise
    their semantics are identical, so their shared prefix must be shared
    code, not a textual copy that can drift."""
    obs = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("observed_max"),
    )
    bounds = obs.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    return obs, bounds


@register(
    "events_resample_hourly_ffill",
    oracle=_RESAMPLE_FFILL_ORACLE,
    tags=("events", "timeseries", "window"),
)
def events_resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: project each event type onto a
    regular hourly grid spanning its observed range, mark the empty hours,
    and forward-fill the last observed per-hour maximum across gaps — the
    regularization step every downstream forecasting/joining consumer of an
    irregular event stream needs. The per-hour aggregate is max() (order
    independent, engine-exact); the fill is last(ignorenulls) over the
    per-type hour order.

    Scale: the grid explodes from a per-type [min, max] bound (time-bounded,
    never corpus-sized), the grid-to-observation join is an equi-join on
    (type, hour), and the fill window partitions by type. For an unbounded
    multi-year series, use events_resample_hourly_ffill_sharded below: the
    same semantics with the window sharded into (type, day) partitions and
    the last value carried across shard boundaries by a second,
    1-row-per-shard pass — same two-pass prefix trick as the sequence
    packer (equality with this form pinned by the shared oracle and
    tests/test_events_approx.py)."""
    obs, bounds = _hourly_obs_bounds(load_events(spark, sf_dir))
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    joined = grid.join(obs, ["event_type", "h"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        F.col("h").alias("hour_start"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "observed_max",
        F.last("observed_max", ignorenulls=True).over(w).alias("filled_max"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@register(
    "events_resample_hourly_ffill_sharded",
    oracle=_RESAMPLE_FFILL_ORACLE,
    tags=("events", "timeseries", "window"),
)
def events_resample_hourly_ffill_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbounded-series form of the hourly resample+ffill: identical
    semantics (same oracle gates both), but the fill window is SHARDED
    into (event_type, day) partitions so no single window task ever holds
    more than 24 grid rows of state — a multi-year series per type stops
    being one giant ordered partition.

    Two-pass prefix trick (same as the sequence packer's running offsets):

      pass 1 — fill WITHIN each (type, day) shard: last(observed_max
               ignorenulls) over the day-local hour order;
      shard summary — ONE row per shard: the last filled value the shard
               ends with (max_by over 24 rows);
      pass 2 — a window over the per-shard table (1 row per type-day,
               model-sized) computes each shard's carry-in: the latest
               non-null shard-ending value among all EARLIER days;
      final — filled = coalesce(day-local fill, carry-in).

    The result is provably shard-count-independent: for any grid hour, the
    last non-null observation is either inside its own day (pass 1 finds
    it) or in some earlier day, in which case it is that day's last
    non-null value, which pass 2 carries. tests/test_events_approx.py pins
    equality against the single-window form row-for-row."""
    obs, bounds = _hourly_obs_bounds(load_events(spark, sf_dir))
    # TWO-STAGE grid generation: explode days first, then 24 hours per
    # day — the single sequence(h0, h1, 1 HOUR) builds the type's ENTIRE
    # hourly range as one in-row array (a 50-year series is ~438k
    # elements in one task, and sequence() caps out), which is exactly
    # the unbounded-per-type state this variant exists to remove. The
    # day array is 24x smaller; for truly extreme ranges the same
    # pattern nests again (months -> days -> hours) without changing
    # anything downstream.
    days = bounds.select(
        "event_type",
        "h0",
        "h1",
        F.explode(
            F.sequence(F.to_date("h0"), F.to_date("h1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    grid = days.select(
        "event_type",
        "h0",
        "h1",
        F.explode(
            F.expr(
                "transform(sequence(0, 23), k ->"
                " timestampadd(HOUR, k, CAST(day AS TIMESTAMP)))"
            )
        ).alias("h"),
    ).where(
        (F.col("h") >= F.col("h0")) & (F.col("h") <= F.col("h1"))
    ).select("event_type", "h")
    joined = grid.join(obs, ["event_type", "h"], "left").withColumn(
        "day", F.to_date("h")
    )
    # pass 1: day-local fill — bounded state per window task
    w_day = (
        W.partitionBy("event_type", "day")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = joined.withColumn(
        "local_fill", F.last("observed_max", ignorenulls=True).over(w_day)
    )
    # shard summary: the value each (type, day) shard ends with
    shard_last = local.groupBy("event_type", "day").agg(
        F.max_by("local_fill", "h").alias("shard_end_fill")
    )
    # pass 2: carry-in per shard = latest non-null shard-ending value among
    # earlier days (model-sized window: one row per type-day)
    w_carry = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = shard_last.withColumn(
        "carry_in", F.last("shard_end_fill", ignorenulls=True).over(w_carry)
    ).select("event_type", "day", "carry_in")
    return (
        local.join(F.broadcast(carry), ["event_type", "day"])
        .select(
            "event_type",
            F.col("h").alias("hour_start"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "observed_max",
            F.coalesce("local_fill", "carry_in").alias("filled_max"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


# --------------------------------------------------------------------------
# Heavy hitters: distributed Misra-Gries sketch
# --------------------------------------------------------------------------

HH_K = 16  # counter budget per partition summary (error <= n / (HH_K+1))


@register(
    "events_user_heavy_hitters",
    oracle=None,  # summary contents depend on partition arrival order ->
    # rows-only gate; the deterministic MG guarantees (coverage of every
    # true heavy hitter, bounded undercount) are pinned in
    # tests/test_events_approx.py
    tags=("events", "agg", "approx", "sketch"),
)
def events_user_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-producing users via a distributed Misra-Gries sketch
    (Misra & Gries 1982; merge analysis: Agarwal et al., "Mergeable
    Summaries", PODS 2012): each partition folds its event stream into at
    most HH_K counters (decrement-all on overflow), the model-sized
    summaries merge by key, and the top HH_K estimates emerge with a
    deterministic guarantee — est_count is an UNDERCOUNT of the true
    count by at most n/(HH_K+1), so every user with true frequency above
    that bound is guaranteed present. This is the bounded-state answer to
    "who dominates the stream" when exact per-key counting's state (one
    counter per distinct user — fine here, unbounded at 100 TB of
    high-cardinality keys) is the thing being avoided.

    Plan: one mapInPandas scan emitting <= HH_K rows per partition
    (sketch state is O(HH_K) regardless of partition size), a
    summary-sized groupBy merge, and a TakeOrdered top-k. The corpus is
    never shuffled — only the per-partition summaries move, the same
    state-vs-stream separation as the LM/DSIR tiers. Estimates are
    order-dependent (a different partitioning shifts them within the
    bound), hence rows-only at the gate with the bound pinned in pytest."""
    e = load_events(spark, sf_dir).select("user_id").where(
        F.col("user_id").isNotNull()
    )
    return mg_heavy_hitters(e)


def mg_heavy_hitters(keyed: DataFrame, k: int = HH_K) -> DataFrame:
    """The sketch pipeline over any single-column ``user_id`` frame —
    exposed so the strength tests drive planted-skew corpora through the
    EXACT registered kernel, not a copy."""

    def mg_partition(batches):
        import pandas as pd

        # WEIGHTED Misra-Gries (Berinde et al., "Space-optimal heavy
        # hitters with strong error bounds", PODS 2009): pre-aggregate
        # each Arrow batch with value_counts() so the Python loop runs
        # over the batch's DISTINCT keys, then fold each (key, weight)
        # in with the weighted update — on overflow subtract the minimum
        # counter from ALL k+1 counters and drop zeros. Each overflow
        # removes (k+1)*m mass for a total decrement of m, so the
        # undercount bound est <= true <= est + n/(k+1) is the same as
        # the unit-update kernel's; only the loop length changes (by the
        # batch's key-duplication factor).
        counters: dict[int, int] = {}
        for pdf in batches:
            for u, w in pdf["user_id"].value_counts().items():
                u, w = int(u), int(w)
                if u in counters:
                    counters[u] += w
                elif len(counters) < k:
                    counters[u] = w
                else:
                    m = min(w, min(counters.values()))
                    dead = []
                    for kk in counters:
                        counters[kk] -= m
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
                    if w > m:
                        counters[u] = w - m
        yield pd.DataFrame(
            {"user_id": list(counters), "est_count": list(counters.values())}
        )

    summaries = keyed.mapInPandas(mg_partition, "user_id long, est_count long")
    merged = summaries.groupBy("user_id").agg(
        F.sum("est_count").cast("long").alias("est_count")
    )
    # Pin ONE evaluation of the merged summary (<= partitions * k rows):
    # the (k+1)-th-count cut below is collected in one action and the
    # returned frame re-executes the lineage in another — without the
    # checkpoint a different mapInPandas partitioning between the two
    # runs could make the subtracted cut inconsistent with the recomputed
    # estimates (more than k survivors, or a bound violation).
    merged = merged.localCheckpoint(eager=True)
    # Reduce back to <= k keys with the MERGEABLE-SUMMARIES rule (Agarwal
    # et al., PODS 2012): subtract the (k+1)-th largest merged count from
    # every counter and keep the positive — NOT a plain top-k cut, which
    # would break the coverage guarantee (a true heavy hitter whose
    # estimate carries the maximal undercount could rank below k lighter
    # keys with no undercount and be dropped; the subtraction shrinks
    # every survivor's estimate by the same bounded amount instead, so
    # est <= true and the total undercount stays <= n/(k+1)).
    head = merged.orderBy(F.col("est_count").desc(), "user_id").limit(k + 1).collect()
    cut = head[k].est_count if len(head) > k else 0
    return (
        merged.select(
            "user_id", (F.col("est_count") - F.lit(cut)).alias("est_count")
        )
        .where(F.col("est_count") > 0)
        .orderBy(F.col("est_count").desc(), "user_id")
        .select("user_id", "est_count")
    )
