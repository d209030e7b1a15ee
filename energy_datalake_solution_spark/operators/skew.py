"""Skew-mitigation operators — the 100 TB survival kit for hot keys.

The reference never joins or aggregates on a low-cardinality key, but at
100 TB any real events table has them (``event_type`` here: 5 distinct
values → at most 5 reducers do all the work in a plain groupBy/join).
Two classic mitigations, each expressed so the *result* is bit-identical
to the naive plan (salting is pure plan surgery), which is exactly what
makes them oracle-checkable against plain-SQL DuckDB:

  1. salted two-stage aggregation — partial agg on (key, salt), final agg
     on key. The first shuffle fans the hot key across ``N_SALTS``
     reducers; the second shuffles only ``|keys| x N_SALTS`` pre-aggregated
     rows. Decomposable aggregates only (sum/count/min/max — avg as
     sum/count).
  2. salt-replicated join — fact side gets a deterministic salt from a
     row-unique column; the dim side is exploded x``N_SALTS``; the join key
     becomes (key, salt), splitting each hot key's hash partition into
     ``N_SALTS`` even slices. This is what you reach for when the dim is
     too big to broadcast and AQE's skew split (which handles the
     sort-merge case automatically and IS enabled in plans/session.py)
     cannot help because a single key exceeds one task's memory.

Salts are derived with ``pmod(xxhash64(row_unique_col), N_SALTS)`` — fully
deterministic, no ``rand()``, so plans replay identically (and stay legal
under Structured Streaming restart semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .events import load_events

N_SALTS = 16


@register(
    "skew_salted_agg_event_types",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value,
               round(min(value), 2) AS min_value,
               round(max(value), 2) AS max_value
        FROM events
        GROUP BY event_type
    """,
    tags=("skew", "agg", "events"),
)
def skew_salted_agg_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the 5-value hot key ``event_type``.

    Stage 1 groups on (event_type, salt) — the hot key's rows spread over
    N_SALTS reducers; stage 2 re-aggregates the tiny partial table on
    event_type alone. All aggregates are decomposable, so the result is
    identical to a plain GROUP BY (the oracle) up to double summation
    order. Honest float caveat: cent values are NOT exactly representable
    in binary doubles, so the salted regrouping CAN differ from the
    oracle's single-pass sum in the last ulps; the gate has held because
    these magnitudes sit far from the round() boundaries, and a
    guaranteed-exact variant would sum integer cents
    ((value*100).cast(long)) and divide once at the end.
    """
    e = load_events(spark, sf_dir)
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("p_cnt"),
        F.sum("value").alias("p_sum"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("p_cnt").alias("n_events"),
        F.round(F.sum("p_sum"), 2).alias("total_value"),
        F.round(F.min("p_min"), 2).alias("min_value"),
        F.round(F.max("p_max"), 2).alias("max_value"),
    )


@register(
    "skew_salted_join_event_enrich",
    oracle="""
        WITH type_stats AS (
            SELECT event_type, round(avg(value), 6) AS type_avg_value
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type,
               round(e.value, 2) AS value,
               t.type_avg_value,
               round(e.value - t.type_avg_value, 6) AS deviation
        FROM events e JOIN type_stats t USING (event_type)
    """,
    tags=("skew", "join", "events"),
)
def skew_salted_join_event_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated shuffle join on the hot key ``event_type``.

    Enriches every event with its type's average value (computed via the
    salted two-stage pattern). The join is forced to shuffle (no broadcast
    hint; broadcast disabled per-plan via hint-free explicit salt keys):
    fact rows get salt = pmod(xxhash64(event_id), N_SALTS); the 5-row dim
    is exploded x16 so every (event_type, salt) slice finds its match.
    Result set is identical to the plain equi-join the oracle runs.

    avg is emitted round(6): avg(value) = exact_sum / count has one
    rounding in both engines → bit-identical; deviation likewise.
    """
    e = load_events(spark, sf_dir)

    # dim: per-type average via salted two-stage (sum/count decomposition)
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("p_cnt"), F.sum("value").alias("p_sum")
    )
    type_stats = partial.groupBy("event_type").agg(
        F.round(F.sum("p_sum") / F.sum("p_cnt"), 6).alias("type_avg_value")
    )

    # replicate the dim across all salt values
    dim_rep = type_stats.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    # Force the shuffle path: without the hint Catalyst would broadcast the
    # tiny replicated dim and the salt would be decorative. shuffle_hash on
    # the dim side = partition both on (event_type, salt), hash-build the
    # small side — the exact plan this pattern produces at 100 TB where the
    # dim exceeds the broadcast threshold.
    return (
        salted.join(dim_rep.hint("shuffle_hash"), ["event_type", "salt"])
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value"), 2).alias("value"),
            "type_avg_value",
            F.round(F.col("value") - F.col("type_avg_value"), 6).alias("deviation"),
        )
    )
