"""Semantic properties of the integrity tier: the CDC diff must actually
transform the old snapshot into the new one, and the orphan audit must
see through injected corruption (the oracle gate pins clean-data values;
these pin MEANING)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries
from energy_datalake_solution_spark.sources.catalog import load_table

from .conftest import SF_ORACLE

get_queries()


def _snapshots(spark):
    o = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.where(F.col("o_orderkey") % 17 != 3).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1.5, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    new = o.where(F.col("o_orderkey") % 19 != 5)
    return old, new


def test_cdc_diff_reconstructs_new_snapshot(spark):
    """old snapshot + diff == new snapshot, row for row: deletes removed,
    inserts taken from new, updates replaced by the new row."""
    old, new = _snapshots(spark)
    diff = QUERIES["orders_cdc_snapshot_diff"].fn(spark, SF_ORACLE)
    deletes = diff.where("change_type = 'delete'").select(F.col("order_id"))
    upserts = diff.where("change_type IN ('insert', 'update')").select("order_id")
    rebuilt = (
        old.join(deletes, old.o_orderkey == deletes.order_id, "left_anti")
        .join(upserts, old.o_orderkey == upserts.order_id, "left_anti")
        .unionByName(new.join(upserts, new.o_orderkey == upserts.order_id, "left_semi"))
    )
    assert rebuilt.count() == new.count()
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_integrity_audit_detects_injected_orphans(spark, tmp_path):
    """Corrupt a copy of the lake (drop half the suppliers) and the audit
    must report exactly the lineitem rows that lost their supplier."""
    import shutil

    d = tmp_path / "lake"
    d.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        src = f"{SF_ORACLE}/{t}.parquet"
        if t == "supplier":
            load_table(spark, SF_ORACLE, t).where("s_suppkey % 2 = 0").write.parquet(
                str(d / f"{t}.parquet")
            )
        else:
            shutil.copyfile(src, str(d / f"{t}.parquet"))
    audit = {r.fk_edge: r for r in QUERIES["star_integrity_audit"].fn(spark, str(d)).collect()}
    li = load_table(spark, SF_ORACLE, "lineitem")
    expected = li.where("l_suppkey % 2 = 1").count()
    assert audit["lineitem->supplier"].orphan_rows == expected
    assert audit["lineitem->orders"].orphan_rows == 0
