"""TPC-H-style analytic suite over the driver's star schema.

The reference ships only three analytic queries (athena_queries/*.sql) but
its star schema (fact + dims, FKs at glue_jobs/dynamic-data-processor.py:112-113)
exists precisely so a warehouse user can run this class of query. This module
is the full decision-support surface those three queries imply, adapted to
the driver tables (no partsupp / l_shipmode / l_commitdate columns exist, so
Q2/Q12/Q20/Q21 appear as faithful analogs on the columns that do).

Every query is written plan-first for 100 TB:

* dims (nation, supplier, customer, part, filtered subaggregates) are
  broadcast — the lineitem fact side never shuffles for a dim join;
* date predicates are explicit range literals (not ``year() ==``) so they
  push down to the parquet scan's row-group min/max stats;
* ORDER BY + LIMIT shapes compile to TakeOrderedAndProject (true top-k);
* group-by sums ride on partial (map-side) aggregation.

Float determinism vs the DuckDB oracle: money sums are rounded at or above
the true decimal precision of the addends (extendedprice has 2 decimals,
disc_price 4, charge 6), never below — see tests/oracle_harness notes.
Quantity sums/averages are exact (integral doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

def _disc_price():
    # built lazily: Column construction needs an active SparkContext, and
    # this module is imported for registry side effects before any session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS -> left-semi join)
# --------------------------------------------------------------------------
@register(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority AS order_priority,
               count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: orders per priority in one quarter having at least one line shipped
    after the order date (l_commitdate doesn't exist; shipped-late-vs-orderdate
    is the analog). EXISTS compiles to a left-semi hash join — no row
    multiplication, probe side short-circuits on first match."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01")) & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan + filter + ungrouped agg)
# --------------------------------------------------------------------------
@register(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    headline=True,
    tags=("tpch", "agg", "filter"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: the canonical selective-scan benchmark — every predicate pushes to
    the parquet scan (PushedFilters on shipdate/discount/quantity), then a
    single map-side-combined ungrouped sum. Zero shuffle beyond the final
    1-row exchange; the shape that must stay scan-bound at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------
@register(
    "tpch_q7_volume_shipping",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume by year between two nations. supplier,
    customer, and both nation aliases broadcast; orders x lineitem is the
    only shuffled join. The nation filter is applied before the broadcast so
    the hash tables carry only the two relevant nations' rows."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .select("c_custkey", "cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(_disc_price()), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q10 — returned item reporting (top-20 by lost revenue)
# --------------------------------------------------------------------------
@register(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               c.c_acctbal AS account_balance, n.n_name AS nation_name
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, customer_id
        LIMIT 20
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: customers who returned the most revenue in a quarter. Both the
    returnflag filter (fact side) and the orderdate filter (orders side) are
    applied pre-join; customer+nation broadcast; final top-20 is
    TakeOrderedAndProject."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    n = load_table(spark, sf_dir, "nation")
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_acctbal").alias("account_balance"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.round(F.sum(_disc_price()), 4).alias("revenue"))
        .select("customer_id", "customer_name", "revenue", "account_balance", "nation_name")
        .orderBy(F.col("revenue").desc(), F.col("customer_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q12 analog — shipping priority classes (no l_shipmode column; the
# high/low-priority conditional count is the point of the query)
# --------------------------------------------------------------------------
@register(
    "tpch_q12_priority_classes",
    oracle="""
        SELECT l.l_returnflag AS return_flag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_returnflag
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog: high- vs low-priority line counts per return flag for one
    ship year (l_shipmode doesn't exist; l_returnflag takes its grouping
    role). The CASE counts are a single pass — no second join or union."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (double aggregation)
# --------------------------------------------------------------------------
@register(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT n_orders, count(*) AS n_customers
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                              AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        )
        GROUP BY n_orders
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of per-customer order counts (excluding low-priority
    orders), customers with zero orders included via the left join. Two
    chained aggregations; the second one's input is one row per customer, so
    its shuffle is tiny regardless of fact size."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Q14 — promotion effect (conditional agg ratio)
# --------------------------------------------------------------------------
@register(
    "tpch_q14_promo_revenue",
    oracle="""
        SELECT round(100.0 * round(sum(CASE WHEN p.p_type = 'PROMO'
                                   THEN l.l_extendedprice * (1 - l.l_discount)
                                   ELSE 0 END), 4)
                     / round(sum(l.l_extendedprice * (1 - l.l_discount)), 4),
                     6) AS promo_revenue_pct
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: share of one month's revenue from PROMO parts. part broadcasts;
    numerator and denominator come out of ONE aggregation pass. Both sums are
    rounded at the addends' true precision (4 decimals) before dividing so
    the ratio is bit-identical across engines."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-09-01")) & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(F.sum(promo), 4).alias("_promo"),
            F.round(F.sum(_disc_price()), 4).alias("_total"),
        )
        .select(F.round(100.0 * F.col("_promo") / F.col("_total"), 6).alias("promo_revenue_pct"))
    )


# --------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (agg + scalar-max self reference)
# --------------------------------------------------------------------------
@register(
    "tpch_q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name,
               r.total_revenue AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) achieving the maximum quarterly revenue. The scalar
    max is a 1-row aggregate of the revenue subtree, broadcast back as a
    join filter. The revenue view is localCheckpoint'ed: it is one row per
    active supplier (tiny at any scale) and feeds BOTH the max aggregate
    and the equality join — materializing it collapses the plan to a
    single lineitem scan (pinned by test_tpch_q15_single_lineitem_scan).
    Revenue is rounded at addend precision so the equality join on a
    double is exact."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_disc_price()), 4).alias("total_revenue"))
        .localCheckpoint()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
            "total_revenue",
        )
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg per part)
# --------------------------------------------------------------------------
@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice), 2) AS total_price_small_qty,
               round(round(sum(l.l_extendedprice), 2) / 7.0, 4) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty
              FROM lineitem GROUP BY l_partkey) a
          ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
          AND l.l_quantity < 0.2 * a.avg_qty
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost if small-quantity orders (below 20% of the part's
    average order size) for one brand+type stopped. The per-part average is a
    grouped subaggregate joined back to the fact — computed only for the 19
    filtered parts by semi-filtering the aggregate input on the part dim
    first (at 100 TB this turns a full-fact re-aggregation into a sliver).
    avg(l_quantity) is exact (integral doubles), so the 0.2x threshold
    comparison is engine-identical."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    # restrict BOTH the fact rows and the avg-subquery input to the ~19 parts
    l_f = l.join(F.broadcast(part_f), l.l_partkey == part_f.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_per_part = l_f.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    total = F.round(F.sum("l_extendedprice"), 2)
    return (
        l_f.join(F.broadcast(avg_per_part), F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            total.alias("total_price_small_qty"),
            F.round(total / 7.0, 4).alias("avg_yearly"),
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (grouped HAVING + top-k)
# --------------------------------------------------------------------------
@register(
    "tpch_q18_large_orders",
    oracle="""
        SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
               o.o_orderkey AS order_id, CAST(o.o_orderdate AS DATE) AS order_date,
               o.o_totalprice AS total_price, big.order_qty AS order_qty
        FROM (
            SELECT l_orderkey, sum(l_quantity) AS order_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        ) big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY total_price DESC, order_id
        LIMIT 100
    """,
    headline=True,
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: the 100 largest orders above a total-quantity threshold. The
    HAVING aggregate runs on lineitem's join key, so the subsequent join with
    orders reuses the same hash partitioning (no extra fact shuffle);
    customer broadcasts; the final ORDER+LIMIT is a top-k. Quantity sums are
    exact integral doubles — the >250 cut is engine-identical."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("order_qty"))
        .where(F.col("order_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            F.col("order_qty"),
        )
        .orderBy(F.col("total_price").desc(), F.col("order_id"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive brand/size/quantity predicates
# --------------------------------------------------------------------------
@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "join", "filter", "agg"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue under three OR'd (brand, size, quantity) clause groups —
    the classic disjunctive-predicate join. Catalyst extracts the common
    part-side conjuncts (brand IN ..., size <= 15) below the join, and a
    derived quantity range (1..30) prunes the fact scan; the residual
    disjunction evaluates post-join inside codegen."""
    part_pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15))
    )
    p = load_table(spark, sf_dir, "part").where(part_pred).select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity").between(1, 30))
    full = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(full)
        .agg(F.round(F.sum(_disc_price()), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q22 analog — dormant high-balance customers per segment
# --------------------------------------------------------------------------
@register(
    "tpch_q22_dormant_customers",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_customers,
               round(sum(c.c_acctbal), 2) AS total_acctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c.c_mktsegment
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog: above-average-balance customers who never ordered, by
    segment (no c_phone column, so country-code slicing becomes the segment
    grouping; "never ordered" becomes "no order since 1999" — the driver's
    corpus has every customer ordering at least once). The scalar average
    broadcasts as a 1-row join; NOT EXISTS is a left-anti join against the
    date-filtered orders key column."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )
