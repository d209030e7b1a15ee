"""Lake integrity operators: referential-integrity audit and snapshot CDC diff.

The reference trusts its Glue crawler + Redshift FKs to keep the star
schema coherent (reference: glue_jobs/dynamic-data-processor.py:112-113
declares the FK edges); a lake engine has no enforcing database, so
integrity is a QUERY you run — these are those queries.

100 TB posture: every dim-side orphan check is a broadcast left-anti join
(the fact never shuffles); the one fact-to-fact edge (lineitem → orders)
shuffles on the join key exactly once. The CDC diff is a single full-outer
join on the snapshot key comparing md5 row digests — co-partition both
snapshots by the key at write time (bucketing) and the diff runs
exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

# (edge name, fact table, fact key, dim table, dim key, dim is broadcastable)
FK_EDGES = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey", True),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey", True),
)


@register(
    "star_integrity_audit",
    oracle="""
        SELECT 'lineitem->orders' AS fk_edge,
               (SELECT count(*) FROM lineitem)::BIGINT AS fact_rows,
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))::BIGINT AS orphan_rows
        UNION ALL
        SELECT 'lineitem->part', (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'lineitem->supplier', (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'orders->customer', (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer->nation', (SELECT count(*) FROM customer),
               (SELECT count(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        UNION ALL
        SELECT 'supplier->nation', (SELECT count(*) FROM supplier),
               (SELECT count(*) FROM supplier s
                WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
        UNION ALL
        SELECT 'nation->region', (SELECT count(*) FROM nation),
               (SELECT count(*) FROM nation n
                WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
    """,
    tags=("integrity", "join", "agg"),
)
def star_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row counts for every FK edge of the star schema — the
    referential-integrity report a lake needs because nothing enforces the
    keys at write time. Each edge is a left-anti join against the
    referenced key set (NULL keys count as orphans, matching NOT EXISTS
    semantics); dim sides broadcast, only lineitem->orders shuffles."""
    out = None
    for edge, fact, fkey, dim, dkey, small in FK_EDGES:
        f = load_table(spark, sf_dir, fact)
        d = load_table(spark, sf_dir, dim).select(dkey)
        d = F.broadcast(d) if small else d
        orphans = f.join(d, f[fkey] == d[dkey], "left_anti")
        row = (
            f.agg(F.count(F.lit(1)).alias("fact_rows"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("orphan_rows")))
            .select(F.lit(edge).alias("fk_edge"), "fact_rows", "orphan_rows")
        )
        out = row if out is None else out.unionByName(row)
    return out


# Deterministic "previous snapshot" derivation: deletions, updates, and the
# current snapshot's inserts are all arithmetic in o_orderkey, so the oracle
# can rebuild the identical old snapshot without any stored state.
_CDC_OLD_SQL = """
        WITH old_snap AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 13 = 0
                        THEN round(o_totalprice + 1.5, 2)
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders
            WHERE o_orderkey % 17 <> 3      -- rows inserted since the old snapshot
        ),
        new_snap AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders
            WHERE o_orderkey % 19 <> 5      -- rows deleted since the old snapshot
        )
"""


@register(
    "orders_cdc_snapshot_diff",
    oracle=_CDC_OLD_SQL
    + """
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS order_id,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type
        FROM old_snap o
        FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_totalprice <> n.o_totalprice
           OR o.o_orderstatus <> n.o_orderstatus
    """,
    tags=("integrity", "cdc", "join"),
)
def orders_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-level change-data-capture: diff two versions of the orders
    table into insert/delete/update rows via one full-outer join on the
    business key (the old snapshot is derived deterministically — keyed
    deletions, inserts, and price updates — so the oracle reconstructs the
    identical pair of snapshots). The column comparison is explicit
    per-field; at 100 TB both snapshots are bucket-written on the key and
    the diff runs without an exchange."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.where(F.col("o_orderkey") % 17 != 3).select(
        F.col("o_orderkey").alias("old_key"),
        F.when(F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1.5, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("old_price"),
        F.col("o_orderstatus").alias("old_status"),
    )
    new = o.where(F.col("o_orderkey") % 19 != 5).select(
        F.col("o_orderkey").alias("new_key"),
        F.col("o_totalprice").alias("new_price"),
        F.col("o_orderstatus").alias("new_status"),
    )
    joined = old.join(new, old.old_key == new.new_key, "full_outer")
    changed = (
        F.col("old_key").isNull()
        | F.col("new_key").isNull()
        | (F.col("old_price") != F.col("new_price"))
        | (F.col("old_status") != F.col("new_status"))
    )
    return joined.where(changed).select(
        F.coalesce("old_key", "new_key").alias("order_id"),
        F.when(F.col("old_key").isNull(), "insert")
        .when(F.col("new_key").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
    )
