"""TPC-H-style analytic suite over the driver's star schema.

The reference ships only three analytic queries (athena_queries/*.sql) but
its star schema (fact + dims, FKs at glue_jobs/dynamic-data-processor.py:112-113)
exists precisely so a warehouse user can run this class of query. This module
is the full decision-support surface those three queries imply, adapted to
the driver tables: all 22 TPC-H queries run here (no partsupp /
l_shipmode / l_commitdate / comment columns exist, so Q4/Q12/Q16/Q20/Q21
are faithful analogs on the columns that do, and Q2/Q9/Q11 — whose core
semantics ARE partsupp — derive their part-supplier economics from
lineitem instead: ``min(l_extendedprice / l_quantity)`` per (part,
supplier) stands in for ps_supplycost. MIN of a deterministic IEEE
division is order-independent and engine-exact, so the correlated
min-cost equality in Q2 and the cost terms in Q9/Q11 compare
bit-identically against the DuckDB oracle without rounding tricks).

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


# --------------------------------------------------------------------------
# Q8 — national market share (faithful: all needed columns exist)
# --------------------------------------------------------------------------
@register(
    "tpch_q8_market_share",
    oracle="""
        WITH vols AS (
          SELECT year(o.o_orderdate) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n1.n_regionkey
          JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
          WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
            AND o.o_orderdate >= TIMESTAMP '1995-01-01'
            AND o.o_orderdate < TIMESTAMP '1997-01-01'
        )
        SELECT o_year,
               round(round(sum(CASE WHEN supp_nation = 'NATION_7'
                                    THEN volume ELSE 0 END), 4)
                     / round(sum(volume), 4), 6) AS mkt_share
        FROM vols GROUP BY o_year ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_7's share of ECONOMY-part volume sold into AMERICA, by
    order year. Seven-table star: part filters the fact FIRST (broadcast
    semi-reduction before the big orders join), supplier/nation/region
    broadcast, the only big shuffle is lineitem x orders on orderkey.
    Both sums ride one aggregation (conditional numerator); share =
    round(num,4)/round(den,4) rounded to 6, matching the oracle's
    evaluation exactly."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1995-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA").select("r_regionkey")
    cust_america = c.join(
        F.broadcast(n1.join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)),
        c.c_nationkey == n1.n_nationkey,
    ).select("c_custkey")
    vols = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        # broadcast like every other dim side here: past the auto-broadcast
        # threshold a plain semi join would re-shuffle the part-pruned fact
        # stream on o_custkey — a second fact-sized exchange the module's
        # single-big-shuffle contract forbids
        .join(F.broadcast(cust_america), o.o_custkey == cust_america.c_custkey, "left_semi")
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    num = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0)), 4
    )
    den = F.round(F.sum("volume"), 4)
    return (
        vols.groupBy("o_year")
        .agg(F.round(num / den, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q16 — supplier-part relationship counts (partsupp analog via shipments)
# --------------------------------------------------------------------------
@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
        SELECT p_brand AS brand, p_type AS type, p_size AS size,
               count(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = ps.l_partkey
        WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1,5,9,15,19,23,36,49)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "agg", "distinct"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog: distinct suppliers per (brand, type, size) slice. No
    partsupp table exists, so the supplier-part relation is the DISTINCT
    (l_partkey, l_suppkey) projection of shipments (and no s_comment, so
    the complaints exclusion is dropped). Two shuffles total: the pair
    distinct (map-side combine collapses the fact fan-in) and the
    count-distinct aggregation; part filters broadcast."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 5, 9, 15, 19, 23, 36, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 — heavy-shipping suppliers of a part class (partsupp analog)
# --------------------------------------------------------------------------
@register(
    "tpch_q20_heavy_red_part_suppliers",
    oracle="""
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3' AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'red%'
            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING sum(l.l_quantity) > 20)
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q20_heavy_red_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: NATION_3 suppliers who shipped >20 units of some red
    part in 1997 (ps_availqty doesn't exist; shipped volume per
    (supplier, part) is the availability analog). The IN-subquery is a
    grouped HAVING aggregate reduced to a bare key column, then a
    left-semi join — the nation-filtered supplier dim never multiplies."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    red = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith("red")
    ).select("p_partkey")
    heavy = (
        l.join(F.broadcast(red), l.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 20)
        .select("l_suppkey")
        .distinct()
    )
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi"
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select(
            F.col("s_suppkey").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
        )
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (sole-late-supplier pattern)
# --------------------------------------------------------------------------
@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
        SELECT s.s_name AS supplier_name, count(*) AS numwait
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_5'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 100
    """,
    tags=("tpch", "join", "agg", "subquery", "window"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 analog: suppliers in NATION_5 who were the SOLE late supplier on
    a finished multi-supplier order ("late" = shipped >60 days after the
    order date; l_receiptdate/l_commitdate don't exist). The correlated
    EXISTS / NOT EXISTS pair is one per-order aggregate instead of two
    extra fact joins: n_suppliers >= 2 (someone else exists) and
    n_late_suppliers == 1 (nobody else late, since l1 itself is late) —
    the oracle keeps the textbook double-subquery form, so the gate also
    cross-checks the rewrite's equivalence. One orderkey shuffle for the
    join + one for the stats aggregate; supplier/nation broadcast."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lo = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .withColumn(
            "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
    )
    stats = lo.groupBy(F.col("l_orderkey").alias("so_key")).agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_suppliers"),
    )
    sole_late = lo.where(F.col("late")).join(
        stats.where((F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1)),
        F.col("l_orderkey") == F.col("so_key"),
    )
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "supplier_name")
        .limit(100)
    )

# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated MIN subquery over a derived
#      part-supplier cost table)
# --------------------------------------------------------------------------
@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS supply_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ),
        eu AS (
            SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT eu.s_acctbal AS account_balance, eu.s_name AS supplier_name,
               eu.n_name AS nation_name, p.p_partkey AS part_id,
               p.p_name AS part_name, round(ps.supply_cost, 4) AS supply_cost
        FROM ps
        JOIN eu ON eu.s_suppkey = ps.l_suppkey
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_type = 'SMALL' AND p.p_size <= 10
          AND ps.supply_cost = (
              SELECT min(ps2.supply_cost)
              FROM ps ps2 JOIN eu eu2 ON eu2.s_suppkey = ps2.l_suppkey
              WHERE ps2.l_partkey = ps.l_partkey)
        ORDER BY account_balance DESC, nation_name, supplier_name, part_id
        LIMIT 100
    """,
    tags=("tpch", "join", "agg", "subquery", "topk"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog: for every small part, the EUROPE supplier offering it at
    the minimum unit cost (no partsupp table exists, so supply cost is the
    best observed unit sale price ``min(l_extendedprice / l_quantity)`` per
    (part, supplier) — MIN of an IEEE division is order-independent, so the
    correlated-min equality is exact across engines, no rounding epsilon).

    Plan shape for 100 TB: the fact is scanned ONCE after a broadcast
    left-semi prune to the ~60 qualifying parts and the EUROPE suppliers —
    the derived ps table is then tiny (parts x suppliers sliver). The
    correlated ``= (SELECT min ...)`` becomes a groupBy-min on the same
    pruned table joined back on partkey; supplier/nation/region/part dims
    all broadcast. The oracle keeps the textbook correlated-subquery form
    so the gate cross-checks the decorrelation. Final ORDER+LIMIT compiles
    to TakeOrderedAndProject."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_type") == "SMALL") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation_name"))
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # prune the fact to qualifying parts AND region suppliers BEFORE aggregating
    ps = (
        l.join(F.broadcast(part_f.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(eu.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
        .localCheckpoint()
    )
    min_cost = ps.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        ps.join(
            F.broadcast(min_cost),
            (ps.l_partkey == F.col("m_partkey")) & (ps.supply_cost == F.col("min_cost")),
        )
        .join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .join(F.broadcast(part_f), ps.l_partkey == part_f.p_partkey)
        .select(
            F.col("s_acctbal").alias("account_balance"),
            F.col("s_name").alias("supplier_name"),
            "nation_name",
            F.col("p_partkey").alias("part_id"),
            F.col("p_name").alias("part_name"),
            F.round("supply_cost", 4).alias("supply_cost"),
        )
        .orderBy(
            F.col("account_balance").desc(), "nation_name", "supplier_name", "part_id"
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------
@register(
    "tpch_q9_product_type_profit",
    oracle="""
        SELECT n.n_name AS nation_name, year(o.o_orderdate) AS o_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity), 4) AS profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%bolt%'
        GROUP BY n.n_name, year(o.o_orderdate)
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog: profit on 'bolt' parts by supplier nation and order year.
    Without ps_supplycost, unit cost is modeled as 10% of the part's retail
    price, so profit = disc_price - 0.1 * p_retailprice * l_quantity (addends
    are 4-decimal money, summed then rounded at that precision per the module
    convention).

    Plan: the part LIKE-filter broadcasts and prunes the fact FIRST (an
    inner broadcast join drops ~5/6 of lineitem before anything shuffles);
    supplier+nation broadcast; orders x pruned-lineitem is the only
    shuffled join; the groupBy rides partial aggregation."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation_name"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _disc_price() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("nation_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


# --------------------------------------------------------------------------
# Q11 — important part stock (grouped agg vs global scalar threshold)
# --------------------------------------------------------------------------
@register(
    "tpch_q11_important_part_stock",
    oracle="""
        WITH pv AS (
            SELECT l.l_partkey AS part_id,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS stock_value
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name IN ('NATION_7', 'NATION_12')
            GROUP BY l.l_partkey
        )
        SELECT part_id, stock_value
        FROM pv
        WHERE stock_value > (SELECT round(sum(stock_value) * 0.001, 2) FROM pv)
        ORDER BY stock_value DESC, part_id
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q11_important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analog: parts whose traded value through two nations' suppliers
    exceeds 0.1% of the total such value (partsupp availqty*supplycost is
    replaced by discounted lineitem revenue as the 'stock value').

    The distinctive Q11 shape — a grouped aggregate filtered against a
    global scalar aggregate of ITSELF — is kept: the per-part table is
    localCheckpoint'ed (one row per part, tiny at any scale), feeds both
    the 1-row total and the threshold filter, so lineitem is scanned once
    (q15 pattern). Per-part values are rounded at addend precision (4) and
    the threshold at cents, so both engines compare the same doubles; the
    covering pytest asserts every part clears or misses the cut by a wide
    margin relative to fp error."""
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_7", "NATION_12")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("part_id"))
        .agg(F.round(F.sum(_disc_price()), 4).alias("stock_value"))
        .localCheckpoint()
    )
    thresh = pv.agg(F.round(F.sum("stock_value") * 0.001, 2).alias("cut"))
    return (
        pv.join(F.broadcast(thresh), pv.stock_value > F.col("cut"))
        .select("part_id", "stock_value")
        .orderBy(F.col("stock_value").desc(), "part_id")
    )
