"""Empty-lake sweep: EVERY registered query must execute on a lake whose
ten tables exist but hold zero rows — the empty-ingest-day case a
production pipeline hits on day one and after every outage. This class
caught two real crashes when first probed (add-k smoothing divided by a
zero vocabulary in the LM kernel; PageRank divided by a zero node count);
the sweep keeps the whole surface honest about it."""

from __future__ import annotations

import pytest

from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

get_queries()

SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    "supplier": "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    "part": "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    "orders": "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    "lineitem": "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    "events": "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    "documents": "doc_id long, text string, lang string, source string, n_chars long",
    "embeddings": "vec_id long, embedding array<float>, label int",
}

# queries that BUILD their own data (fixture lakes, snapshot tables) — an
# empty sf_dir is not their input contract
SKIP = {"fixtures_etl_curated", "snapshot_versioned_orders", "merge_upsert_orders"}

ALL = sorted(n for n in QUERIES if n not in SKIP)


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_lake")
    for t, sch in SCHEMAS.items():
        spark.createDataFrame([], sch).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ALL)
def test_query_executes_on_empty_lake(spark, empty_dir, name):
    df = QUERIES[name].fn(spark, empty_dir)
    assert df.count() >= 0
