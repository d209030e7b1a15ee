"""Round-trip tests for every supported source/sink format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_datalake_solution_spark.sources.formats import read_any, write_any

from .conftest import SF_ORACLE


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(spark, tmp_path, fmt):
    src = (
        spark.read.parquet(f"{SF_ORACLE}/supplier.parquet")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    )
    path = tmp_path / f"t_{fmt}"
    write_any(src, path, fmt=fmt)
    back = read_any(spark, path, fmt=fmt)
    a = {r["s_suppkey"]: r for r in src.collect()}
    b = {int(r["s_suppkey"]): r for r in back.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["s_name"] == b[k]["s_name"]
        assert float(a[k]["s_acctbal"]) == float(b[k]["s_acctbal"])


def test_partitioned_write_any(spark, tmp_path):
    src = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    write_any(src, tmp_path / "po", fmt="parquet", partition_by="status")
    assert (tmp_path / "po" / "status=F").exists()
    back = read_any(spark, tmp_path / "po")
    assert back.count() == src.count()


def test_extension_detection(spark, tmp_path):
    df = spark.range(5).withColumn("x", F.col("id") * 2)
    write_any(df, tmp_path / "d.json", fmt="json")
    back = read_any(spark, tmp_path / "d.json")  # fmt from extension
    assert back.count() == 5


def test_schema_evolution_merge_read(spark, tmp_path):
    """Files written under old and new schemas read back as one table:
    missing columns surface as NULLs, not errors."""
    from energy_datalake_solution_spark.sources.formats import read_evolved

    p = tmp_path / "evolving"
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.mode("append").parquet(
        str(p)
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.mode("append").parquet(str(p))

    out = read_evolved(spark, p)
    assert set(out.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_jsonl_adversarial_text_roundtrip(spark, tmp_path):
    """JSONL must round-trip newlines, tabs, quotes, backslashes,
    unicode, NULL and empty strings bit-exactly — the shapes a real
    document corpus carries at the ingest edge."""
    from pyspark.sql import types as T

    from energy_datalake_solution_spark.sources.formats import (
        read_any,
        write_any,
    )

    nasty = [
        (1, "line\nbreak\ttab"),
        (2, 'quote " and \\ backslash'),
        (3, "unicode 雪 ❄ émoji 🚀"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(nasty, "doc_id long, text string")
    p = tmp_path / "n.jsonl"
    write_any(df, p, fmt="jsonl")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    back = {r.doc_id: r.text for r in read_any(spark, p, schema=schema).collect()}
    assert back == dict(nasty)
