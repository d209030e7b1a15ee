"""Temporal join operators over ``events`` — as-of and range joins.

Spark has no native ASOF JOIN (DuckDB does — which makes a perfect oracle);
the scalable Spark expression is the union-merge trick:

  tag both streams, union them, sort within user by (time, tag), and carry
  the right side's last values forward with last(..., ignorenulls) over an
  unbounded-preceding window; rows of the left tag then hold their as-of
  match. One shuffle on the join key, no range explosion, no skew beyond
  the key's own distribution — this is how you as-of-join 100 TB.

The range join buckets time and joins on (key, bucket +/- 1) then refines
the exact predicate — turning an inequality join (O(n*m) nested loop in
naive engines) into an equi-join Catalyst can hash-partition.

All timestamps are second-truncated on both sides (events.parquet carries
nanosecond timestamps; Spark is micros — see operators/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from .events import load_events

RANGE_WINDOW_S = 300  # 5 minutes


@register(
    "events_asof_error_to_click",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id AS error_id, date_trunc('second', ts) AS error_ts
            FROM events WHERE event_type = 'error'
        ),
        c AS (
            SELECT user_id, date_trunc('second', ts) AS click_ts,
                   max(event_id) AS click_id
            FROM events WHERE event_type = 'click'
            GROUP BY 1, 2
        )
        SELECT e.user_id, e.error_id, e.error_ts, c.click_id, c.click_ts
        FROM e ASOF LEFT JOIN c
          ON e.user_id = c.user_id AND e.error_ts >= c.click_ts
    """,
    headline=True,
    tags=("temporal", "asof"),
)
def events_asof_error_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every error event, the user's most recent click at or
    before it (error attribution).

    The right side is pre-aggregated to one row per (user, second) — max
    event_id wins — so the as-of match is deterministic. The oracle uses
    DuckDB's native ASOF LEFT JOIN; Spark runs the union-merge plan
    described in the module docstring.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.date_trunc("second", "ts").alias("ts_s"), "event_type"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_s").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("click_id_in"),
    )
    clicks = (
        # SQL equality never matches NULL = NULL: a NULL-user click must
        # not carry into NULL-user error rows (the window's NULL partition
        # would otherwise match them, diverging from the ASOF oracle)
        ev.where((F.col("event_type") == "click") & F.col("user_id").isNotNull())
        .groupBy("user_id", F.col("ts_s").alias("t"))
        .agg(F.max("event_id").alias("click_id_in"))
        .select(
            "user_id",
            "t",
            F.lit(0).alias("kind"),
            "click_id_in",
            F.lit(None).cast("bigint").alias("error_id"),
        )
    )
    merged = errors.select("user_id", "t", "kind", "click_id_in", "error_id").unionByName(
        clicks.select("user_id", "t", "kind", "click_id_in", "error_id")
    )
    # clicks (kind=0) sort before errors (kind=1) at the same second, so an
    # equal-timestamp click is visible to the error — matching ASOF's >=.
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.select(
        "user_id",
        "t",
        "kind",
        "error_id",
        F.last("click_id_in", ignorenulls=True).over(w).alias("click_id"),
        F.last(F.when(F.col("kind") == 0, F.col("t")), ignorenulls=True).over(w).alias("click_ts"),
    )
    return carried.where(F.col("kind") == 1).select(
        "user_id",
        "error_id",
        F.col("t").alias("error_ts"),
        "click_id",
        "click_ts",
    )


@register(
    "events_range_join_error_click_pairs",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id AS error_id, date_trunc('second', ts) AS error_ts
            FROM events WHERE event_type = 'error'
        ),
        c AS (
            SELECT user_id, event_id AS click_id, date_trunc('second', ts) AS click_ts
            FROM events WHERE event_type = 'click'
        )
        SELECT e.user_id, e.error_id, c.click_id,
               date_diff('second', c.click_ts, e.error_ts) AS delta_s
        FROM e JOIN c
          ON e.user_id = c.user_id
         AND abs(date_diff('second', c.click_ts, e.error_ts)) <= {RANGE_WINDOW_S}
    """,
    tags=("temporal", "range-join"),
)
def events_range_join_error_click_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: (error, click) pairs of the same user within 5 minutes.

    Naive form is an inequality join (quadratic); the scalable form buckets
    time into RANGE_WINDOW_S-wide buckets, explodes each error into its
    bucket and the two neighbors, equi-joins on (user, bucket), and refines
    the exact |delta| predicate. The oracle states the naive inequality
    join — same result set.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.date_trunc("second", "ts").alias("ts_s"), "event_type"
    ).withColumn("epoch_s", F.unix_timestamp("ts_s"))
    errors = (
        ev.where(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("event_id").alias("error_id"),
            F.col("epoch_s").alias("error_epoch"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (F.col("error_epoch") / RANGE_WINDOW_S).cast("long") - 1,
                    (F.col("error_epoch") / RANGE_WINDOW_S).cast("long"),
                    (F.col("error_epoch") / RANGE_WINDOW_S).cast("long") + 1,
                )
            ),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("epoch_s").alias("click_epoch"),
        (F.col("epoch_s") / RANGE_WINDOW_S).cast("long").alias("bucket"),
    )
    delta = F.col("error_epoch") - F.col("click_epoch")
    # no distinct needed: a click has exactly ONE bucket and the error's
    # three exploded buckets are distinct values, so each (error, click)
    # pair can meet at most once — the old .distinct() re-shuffled the
    # entire pair output for no semantic effect
    return (
        errors.join(clicks, ["user_id", "bucket"])
        .where(F.abs(delta) <= RANGE_WINDOW_S)
        .select("user_id", "error_id", "click_id", delta.alias("delta_s"))
    )
