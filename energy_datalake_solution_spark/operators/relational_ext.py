"""Extended relational surface: subqueries, grouping sets, scalar-function
suites, lateral explode — rounding out the warehouse query vocabulary.

Cross-engine exactness notes are per-query; the global policy (README) holds:
only bit-identical expressions or decimal-exact roundings are emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table, register_views


@register(
    "correlated_subquery_above_avg_size",
    oracle="""
        SELECT p_partkey AS part_id, p_type AS part_type, p_size AS part_size
        FROM part p
        WHERE p_size > (SELECT avg(p_size) FROM part q WHERE q.p_type = p.p_type)
    """,
    tags=("subquery",),
)
def correlated_subquery_above_avg_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery: parts larger than their type's average size.

    Spark plans this as an aggregate + self-join (the scalable decorrelated
    form). Exactness: avg of ints is sum/count with both terms exact in
    double, so the comparison is bit-identical across engines.
    """
    p = load_table(spark, sf_dir, "part")
    avg_by_type = p.groupBy(F.col("p_type").alias("t")).agg(F.avg("p_size").alias("avg_size"))
    return (
        p.join(F.broadcast(avg_by_type), p.p_type == avg_by_type.t)
        .where(F.col("p_size") > F.col("avg_size"))
        .select(
            F.col("p_partkey").alias("part_id"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").alias("part_size"),
        )
    )


@register(
    "scalar_subquery_max_order",
    oracle="""
        SELECT o_orderkey AS order_id, o_totalprice AS total_price
        FROM orders
        WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders)
    """,
    tags=("subquery",),
)
def scalar_subquery_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: the order(s) with the global maximum price. max() of
    raw doubles is an exact selection — engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_totalprice").alias("mx"))
    return (
        o.join(F.broadcast(mx), o.o_totalprice == mx.mx)
        .select(F.col("o_orderkey").alias("order_id"), F.col("o_totalprice").alias("total_price"))
    )


@register(
    "grouping_sets_revenue",
    oracle="""
        SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by flag, by status, grand total) — expressed
    through Spark SQL over a registered view (same Catalyst plan as the
    DataFrame form; SQL is the clearer notation here)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "string_function_suite",
    oracle="""
        SELECT c_custkey AS customer_id,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS segment_lower,
               substr(c_name, 1, 8) AS name_prefix,
               length(c_name) AS name_len,
               concat(c_mktsegment, ':', c_name) AS tagged,
               replace(c_name, 'Customer', 'Cust') AS name_short,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_id,
               reverse(c_mktsegment) AS segment_rev,
               split_part(c_name, '#', 2) AS name_number
        FROM customer
    """,
    tags=("scalar", "string"),
)
def string_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-function vocabulary in one projection (all JVM built-ins)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.col("c_mktsegment")).alias("segment_rev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_number"),
    )


@register(
    "date_function_suite",
    oracle="""
        SELECT o_orderkey AS order_id,
               CAST(o_orderdate AS DATE) AS order_date,
               year(o_orderdate) AS order_year,
               quarter(o_orderdate) AS order_quarter,
               month(o_orderdate) AS order_month,
               dayofmonth(o_orderdate) AS order_day,
               dayofweek(o_orderdate) + 1 AS order_dow,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS review_date
        FROM orders
    """,
    tags=("scalar", "date"),
)
def date_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The date-function vocabulary in one projection.

    Cross-engine note: DuckDB's dayofweek is 0=Sunday while Spark's is
    1=Sunday — the oracle adds 1. due_date: DuckDB DATE + INTERVAL DAY
    yields DATE; Spark date_add matches.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        d.alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
    )


@register(
    "lateral_explode_tokens",
    oracle="""
        SELECT doc_id, i - 1 AS pos, w[i] AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             UNNEST(range(1, len(w) + 1)) AS t(i)
    """,
    tags=("lateral", "text"),
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral flatten: one row per (doc, position, token) via posexplode —
    the table-function/UDTF shape (generator expression, no UDF)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@register(
    "conditional_agg_filter_clause",
    oracle="""
        SELECT o_custkey AS customer_id,
               count(*) AS n_orders,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_large,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
                   AS finished_spend
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("agg", "filter-clause"),
)
def conditional_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (conditional aggregation) — one pass over the
    fact computing several filtered aggregates simultaneously."""
    o = load_table(spark, sf_dir, "orders")
    finished = F.col("o_orderstatus") == "F"
    return o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(finished, 1)).alias("n_finished"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_large"),
        F.round(F.sum(F.when(finished, F.col("o_totalprice"))), 2).alias("finished_spend"),
    )


# --------------------------------------------------------------------------
# Classic multi-join analytics (TPC-H Q3/Q5 shapes) — exercise the join
# planner on 3-way and 6-way star/snowflake joins.
# --------------------------------------------------------------------------
@register(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey AS order_id,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate AS order_date,
               o.o_orderpriority AS order_priority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, order_id
        LIMIT 10
    """,
    headline=True,
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by market segment.

    3-way join with selective filters on both fact inputs. customer is the
    small side after the segment filter -> broadcast; both date predicates
    are range predicates that push to the parquet scans; ORDER BY + LIMIT
    compiles to TakeOrderedAndProject (no global sort). (Extends the
    reference's single-fact star schema — SURVEY.md §2.3 J2.)
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("order_id", "revenue", "order_date", "order_priority")
        .orderBy(F.col("revenue").desc(), F.col("order_id"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name AS nation_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation_name
    """,
    headline=True,
    tags=("join", "agg", "tpch"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where customer and supplier share a nation,
    restricted to one region and one year.

    6-way snowflake join. lineitem x orders is the only big-big join
    (shuffle on orderkey); customer/supplier/nation/region are dims ->
    broadcast, so the local-supplier equi-predicate (c_nationkey =
    s_nationkey) evaluates map-side. Year filter is a pushed range predicate.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("nation_name"))
    )


# --------------------------------------------------------------------------
# UNPIVOT / melt — the inverse of the pivot operator
# --------------------------------------------------------------------------
@register(
    "unpivot_nation_balances",
    oracle="""
        WITH cb AS (
            SELECT c_nationkey AS nk, round(sum(c_acctbal), 2) AS bal
            FROM customer GROUP BY c_nationkey
        ),
        sb AS (
            SELECT s_nationkey AS nk, round(sum(s_acctbal), 2) AS bal
            FROM supplier GROUP BY s_nationkey
        )
        SELECT n_name AS nation_name, 'customer' AS entity, cb.bal AS total_acctbal
        FROM nation JOIN cb ON cb.nk = n_nationkey
        UNION ALL
        SELECT n_name AS nation_name, 'supplier' AS entity, sb.bal AS total_acctbal
        FROM nation JOIN sb ON sb.nk = n_nationkey
    """,
    tags=("relational", "setop"),
)
def unpivot_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (melt): per-nation customer/supplier balance
    totals computed as a wide 2-column aggregate, then melted to
    (nation, entity, total) rows — the inverse of pivot_quantity_by_status.
    ``DataFrame.unpivot`` is a zero-shuffle row-local expansion; the only
    shuffles are the two upstream aggregations, and the nation dim
    broadcasts. The oracle is the UNION ALL formulation, so the gate
    cross-checks unpivot semantics against the classical rewrite."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cb = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("customer"))
    )
    sb = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supplier"))
    )
    # full outer: a nation with customers but no suppliers still gets its
    # customer row (the UNION ALL branches of the oracle are independent);
    # the null-valued melted rows are filtered after the unpivot
    wide = cb.join(sb, "nk", "full_outer").join(
        F.broadcast(n), F.col("nk") == n.n_nationkey
    ).select(F.col("n_name").alias("nation_name"), "customer", "supplier")
    return (
        wide.unpivot(
            ids=["nation_name"],
            values=["customer", "supplier"],
            variableColumnName="entity",
            valueColumnName="total_acctbal",
        )
        .where(F.col("total_acctbal").isNotNull())
    )


# --------------------------------------------------------------------------
# Column profiling / statistics
# --------------------------------------------------------------------------
@register(
    "profile_lineitem_numeric",
    oracle="""
        WITH s AS (
            SELECT
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(l_quantity) AS BIGINT) AS nn_qty,
              CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
              round(min(l_quantity), 6) AS min_qty,
              round(max(l_quantity), 6) AS max_qty,
              CAST(count(l_extendedprice) AS BIGINT) AS nn_price,
              CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS nd_price,
              round(min(l_extendedprice), 6) AS min_price,
              round(max(l_extendedprice), 6) AS max_price,
              CAST(count(l_discount) AS BIGINT) AS nn_disc,
              CAST(count(DISTINCT l_discount) AS BIGINT) AS nd_disc,
              round(min(l_discount), 6) AS min_disc,
              round(max(l_discount), 6) AS max_disc
            FROM lineitem
        )
        SELECT 'l_quantity' AS column_name, n_rows, nn_qty AS n_non_null,
               nd_qty AS n_distinct, min_qty AS min_value, max_qty AS max_value
        FROM s
        UNION ALL
        SELECT 'l_extendedprice', n_rows, nn_price, nd_price, min_price, max_price FROM s
        UNION ALL
        SELECT 'l_discount', n_rows, nn_disc, nd_disc, min_disc, max_disc FROM s
    """,
    tags=("profile", "agg"),
)
def profile_lineitem_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile table (row count, non-null count, exact distinct,
    min/max) for lineitem's money/quantity columns — the ANALYZE-style
    statistics pass a lakehouse runs for NDV-based planning and
    data-quality monitors.

    ONE pass over the fact table computes every per-column aggregate in a
    single ungrouped aggregation (partial aggregation collapses map-side;
    exact count_distinct rewrites to an expand + two-phase agg), then a
    stack() pivots the single stats row to one row per column — no
    per-column re-scans. At petabyte NDV scale, swap approx_count_distinct
    (HLL) in — same shape, rows-only gate."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.count_distinct(c).alias(f"nd_{c}"),
            F.round(F.min(c), 6).alias(f"min_{c}"),
            F.round(F.max(c), 6).alias(f"max_{c}"),
        ]
    s = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, min_{c}, max_{c}" for c in cols
    )
    return s.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_non_null, n_distinct, min_value, max_value)",
    ).select("column_name", "n_rows", "n_non_null", "n_distinct", "min_value", "max_value")


# --------------------------------------------------------------------------
# Full outer join (reconciliation)
# --------------------------------------------------------------------------
@register(
    "full_outer_spend_activity_reconciliation",
    oracle="""
        WITH spend AS (
            SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey
        ),
        activity AS (
            SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_events
            FROM events WHERE user_id % 2 = 0 GROUP BY user_id
        )
        SELECT coalesce(s.key, a.key) AS entity_id,
               coalesce(s.n_orders, 0) AS n_orders,
               coalesce(a.n_events, 0) AS n_events,
               CASE WHEN s.key IS NULL THEN 'activity_only'
                    WHEN a.key IS NULL THEN 'spend_only'
                    ELSE 'both' END AS presence
        FROM spend s FULL OUTER JOIN activity a ON s.key = a.key
    """,
    tags=("join", "outer"),
)
def full_outer_spend_activity_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two keyed aggregates (order spend vs
    event activity, deterministically disjoint-ish key subsets so both
    unmatched sides are non-empty) — the audit join that finds entities
    present in one system but not the other.

    Both inputs pre-aggregate to one row per key BEFORE the join, so the
    full-outer shuffle moves entity-sized tables, not fact streams, and
    all three exchanges hash the same key."""
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.where(F.col("o_custkey") % 3 == 0)
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    from .events import load_events

    activity = (
        load_events(spark, sf_dir)
        .where(F.col("user_id") % 2 == 0)
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    s, a = spend.alias("s"), activity.alias("a")
    return s.join(a, F.col("s.key") == F.col("a.key"), "full_outer").select(
        F.coalesce("s.key", "a.key").alias("entity_id"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("s.key").isNull(), "activity_only")
        .when(F.col("a.key").isNull(), "spend_only")
        .otherwise("both")
        .alias("presence"),
    )


# --------------------------------------------------------------------------
# Range-frame window: rolling 7-day spend
# --------------------------------------------------------------------------
@register(
    "window_rolling_7day_customer_spend",
    oracle="""
        SELECT o_custkey AS customer_id, o_orderkey AS order_id,
               o_orderdate::DATE AS order_date,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate::DATE
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ), 2) AS spend_7d
        FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_rolling_7day_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 7-day spend — a RANGE-frame window (value-based
    bounds over the order DATE, not row counts): every order sums the
    customer's orders dated within the trailing week, including same-day
    peers regardless of row order. Spark expresses the interval bound as
    an epoch-day range frame; DuckDB as INTERVAL PRECEDING — identical
    semantics, both include all ties of the current date.

    Money sums round(2): o_totalprice is cent-valued, so the window sum is
    exact at 2 decimals in both engines. Per-customer frame state is
    bounded by orders-per-customer-week — no global sort, one shuffle on
    the partition key."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, 0)
    )
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_7d"),
    )


# --------------------------------------------------------------------------
# Market-basket co-occurrence
# --------------------------------------------------------------------------
@register(
    "basket_part_pairs",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
        )
        SELECT part_a, part_b, n_orders,
               CAST(row_number() OVER (
                   ORDER BY n_orders DESC, part_a, part_b) AS BIGINT) AS rank
        FROM pairs
        QUALIFY rank <= 20
    """,
    tags=("basket", "join", "agg"),
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often bought in
    the same order — the support-counting core of association-rule mining
    (Apriori's first pass).

    The self-join keys on l_orderkey, so per-key fan-out is
    items-per-order squared (~4^2 here, bounded by basket size — the same
    bounded-fan-out argument as the span DF_CAP; a pathological
    mega-basket would need a basket-size cap, noted not needed on order
    data). Pair support aggregates with map-side combine; the rank window
    runs on the aggregated pair table only."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # take the top 20 FIRST (TakeOrderedAndProject — no single-partition
    # sort of the full pair table, which is bounded by distinct co-bought
    # pairs and can be huge), then rank the 20 survivors with the same
    # total order: identical output, scale-safe plan
    order = [F.col("n_orders").desc(), F.col("part_a"), F.col("part_b")]
    top = pairs.orderBy(*order).limit(20)
    w = W.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# --------------------------------------------------------------------------
# Time-series growth + RFM segmentation
# --------------------------------------------------------------------------
@register(
    "orders_monthly_growth",
    oracle="""
        WITH m AS (
            SELECT date_trunc('month', o_orderdate)::DATE AS month,
                   round(sum(o_totalprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT month, revenue, n_orders,
               round(revenue - lag(revenue) OVER (ORDER BY month), 2)
                   AS revenue_delta,
               round((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month), 6) AS mom_growth
        FROM m
    """,
    tags=("window", "timeseries", "agg"),
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly rollup + lag deltas — the
    KPI time series every revenue dashboard leads with. The lag window is
    UNPARTITIONED but its input is the month-level aggregate (tens of
    rows), never the order stream; the month rollup itself partial-
    aggregates map-side. Deltas on cent-valued sums round(2), the growth
    ratio round(6)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        "n_orders",
        F.round(F.col("revenue") - prev, 2).alias("revenue_delta"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
        WITH rfm AS (
            SELECT o_custkey AS customer_id,
                   max(o_orderdate)::DATE AS last_order_date,
                   CAST(count(*) AS BIGINT) AS frequency,
                   round(sum(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT *,
                   ntile(4) OVER (ORDER BY last_order_date DESC, customer_id) AS r,
                   ntile(4) OVER (ORDER BY frequency DESC, customer_id) AS f,
                   ntile(4) OVER (ORDER BY monetary DESC, customer_id) AS m
            FROM rfm
        )
        SELECT customer_id, last_order_date, frequency, monetary,
               r AS r_quartile, f AS f_quartile, m AS m_quartile,
               r || '-' || f || '-' || m AS segment
        FROM scored
    """,
    tags=("window", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quartiles per
    customer (1 = best) and the combined segment label — the classic
    marketing cut of a customer base.

    One customer-keyed aggregation of the order stream, then three ntile
    windows over the CUSTOMER-level table. The windows are unpartitioned
    by construction (quartiles are global); their input is one row per
    customer — at true scale the same cut comes from approx_percentile
    boundaries, the documented tradeoff as docs_lm_quality_buckets.
    Ties break on customer_id so both engines assign identical
    quartiles."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    r = F.ntile(4).over(W.orderBy(F.col("last_order_date").desc(), "customer_id"))
    f = F.ntile(4).over(W.orderBy(F.col("frequency").desc(), "customer_id"))
    m = F.ntile(4).over(W.orderBy(F.col("monetary").desc(), "customer_id"))
    return rfm.select(
        "customer_id",
        "last_order_date",
        "frequency",
        "monetary",
        r.alias("r_quartile"),
        f.alias("f_quartile"),
        m.alias("m_quartile"),
        F.concat_ws("-", r, f, m).alias("segment"),
    )


@register(
    "scd2_customer_dim",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
               TIMESTAMP '2025-01-01 00:00:00' AS valid_from,
               TIMESTAMP '2025-06-01 00:00:00' AS valid_to,
               false AS is_current
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT CAST(c_custkey AS BIGINT), 'MOVED',
               TIMESTAMP '2025-06-01 00:00:00',
               CAST(NULL AS TIMESTAMP), true
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT CAST(c_custkey AS BIGINT), c_mktsegment,
               TIMESTAMP '2025-01-01 00:00:00',
               CAST(NULL AS TIMESTAMP), true
        FROM customer WHERE c_custkey % 7 <> 0
        UNION ALL
        SELECT CAST(c_custkey + 1000000 AS BIGINT), 'NEW',
               TIMESTAMP '2025-06-01 00:00:00',
               CAST(NULL AS TIMESTAMP), true
        FROM customer WHERE c_custkey % 7 = 5
    """,
    tags=("merge", "scd2", "dimension"),
)
def scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 versioning under the value gate: seed the customer
    dimension as of 2025-01-01, then apply one update batch
    (segment change for custkey%7==0 -> history row closes + new current
    opens; no-op update for %7==3 -> row untouched; brand-new keys
    +1,000,000 for %7==5 -> inserted current) through
    sources/merge.py::scd2_apply. The oracle states the expected
    versioned dimension directly, so the full-outer-join CASE logic —
    close, carry, open, insert — is value-checked row for row, not just
    pytest-scenario-checked (tests/test_properties.py holds the
    any-input invariants).
    """
    from ..sources.merge import scd2_apply

    ts0, ts1 = "2025-01-01 00:00:00", "2025-06-01 00:00:00"
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_mktsegment",
        F.lit(ts0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    k7 = F.pmod("c_custkey", F.lit(7))
    eff = F.lit(ts1).cast("timestamp").alias("effective_ts")
    updates = (
        c.where(k7 == 0)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.lit("MOVED").alias("c_mktsegment"),
            eff,
        )
        .unionByName(
            c.where(k7 == 3).select(
                F.col("c_custkey").cast("long").alias("c_custkey"),
                "c_mktsegment",
                eff,
            )
        )
        .unionByName(
            c.where(k7 == 5).select(
                (F.col("c_custkey") + 1_000_000).cast("long").alias("c_custkey"),
                F.lit("NEW").alias("c_mktsegment"),
                eff,
            )
        )
    )
    return scd2_apply(base, updates, "c_custkey", ["c_mktsegment"], "effective_ts")


@register(
    "orders_scd2_temporal_join",
    oracle="""
        WITH dim AS (
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
                   TIMESTAMP '1996-01-01 00:00:00' AS valid_from,
                   TIMESTAMP '1997-01-01 00:00:00' AS valid_to
            FROM customer WHERE c_custkey % 7 = 0
            UNION ALL
            SELECT CAST(c_custkey AS BIGINT), 'MOVED',
                   TIMESTAMP '1997-01-01 00:00:00', CAST(NULL AS TIMESTAMP)
            FROM customer WHERE c_custkey % 7 = 0
            UNION ALL
            SELECT CAST(c_custkey AS BIGINT), c_mktsegment,
                   TIMESTAMP '1996-01-01 00:00:00', CAST(NULL AS TIMESTAMP)
            FROM customer WHERE c_custkey % 7 <> 0
        )
        SELECT o.o_orderkey AS order_id,
               CAST(o.o_orderdate AS DATE) AS order_date,
               o.o_custkey AS customer_id,
               d.c_mktsegment AS segment_at_order,
               (d.c_custkey IS NOT NULL AND d.valid_to IS NULL) AS version_is_current
        FROM orders o
        LEFT JOIN dim d
          ON d.c_custkey = o.o_custkey
         AND o.o_orderdate >= d.valid_from
         AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    """,
    tags=("join", "scd2", "temporal"),
)
def orders_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (as-of) join of the orders fact to the SCD2-versioned
    customer dimension: each order picks the dimension VERSION whose
    [valid_from, valid_to) interval contains the order date — the lookup
    every point-in-time-correct report needs once a dimension is
    versioned. The dim is built through the same sources/merge.py
    scd2_apply operator the versioning query uses (seeded 1996-01-01,
    segment change effective 1997-01-01, so order dates really disperse
    across versions: pre-1996 orders match nothing, 1996 orders the
    original segment, 1997+ orders the MOVED version for every 7th
    customer).

    Plan: equality on the customer key carries the join (the interval
    predicate rides along as a join condition), the versioned dim
    broadcasts — the fact never shuffles; the version intervals partition
    time per key, so at most one version matches and row count equals the
    fact. At 100 TB with a dim too large to broadcast, the same join runs
    sort-merge on the key — the interval filter stays a non-equi join
    condition either way."""
    from ..sources.merge import scd2_apply

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_mktsegment",
        F.lit("1996-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    moved = c.where(F.pmod("c_custkey", F.lit(7)) == 0).select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.lit("MOVED").alias("c_mktsegment"),
        F.lit("1997-01-01 00:00:00").cast("timestamp").alias("effective_ts"),
    )
    dim = scd2_apply(base, moved, "c_custkey", ["c_mktsegment"], "effective_ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey"
    )
    cond = (
        (dim.c_custkey == o.o_custkey)
        & (o.o_orderdate >= dim.valid_from)
        & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to))
    )
    return o.join(F.broadcast(dim), cond, "left").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("segment_at_order"),
        (dim.c_custkey.isNotNull() & F.col("valid_to").isNull()).alias(
            "version_is_current"
        ),
    )


@register(
    "window_function_suite",
    oracle="""
        SELECT o_orderkey AS order_id,
               o_custkey AS customer_id,
               round(percent_rank() OVER w, 9) AS pct_rank,
               round(cume_dist() OVER w, 9) AS cume_dist,
               first_value(o_orderkey) OVER w_full AS first_order,
               last_value(o_orderkey) OVER w_full AS last_order,
               nth_value(o_orderkey, 2) OVER w_full AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "relational"),
)
def window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window functions in one
    oracle-gated sweep: percent_rank, cume_dist (ratios of integer ranks —
    engine-exact doubles, rounded only for display), and
    first/last/nth_value over the full-partition frame. One shuffle on the
    partition key; the deterministic (date, key) ordering makes every
    output reproducible. Completes the §2.6 window surface beyond the
    running/rank/lag forms already gated."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume_dist"),
        F.first("o_orderkey").over(w_full).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )
