"""Capability-parity tests for the version-manifest table format
(sources/snapshots.py): the ACID-ish semantics Delta would provide, on
plain parquet + atomic pointer swaps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_datalake_solution_spark.sources.snapshots import (
    current_version,
    snapshot_append,
    snapshot_read,
    snapshot_rollback,
    snapshot_upsert,
    snapshot_vacuum,
    snapshot_write,
)


def _df(spark, lo, hi, val):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(val).alias("v")
    )


def test_write_read_roundtrip_and_versions(spark, tmp_path):
    t = tmp_path / "t"
    assert snapshot_write(_df(spark, 0, 10, "a"), t) == 1
    assert snapshot_write(_df(spark, 0, 5, "b"), t) == 2
    assert current_version(t) == 2
    assert snapshot_read(spark, t).count() == 5          # latest = full replace
    assert snapshot_read(spark, t, version=1).count() == 10  # time travel


def test_append_accumulates_without_rewrite(spark, tmp_path):
    t = tmp_path / "t"
    snapshot_write(_df(spark, 0, 10, "a"), t)
    snapshot_append(_df(spark, 10, 15, "a"), t)
    assert snapshot_read(spark, t).count() == 15
    assert snapshot_read(spark, t, version=1).count() == 10


def test_upsert_replaces_matched_keys_only(spark, tmp_path):
    t = tmp_path / "t"
    snapshot_write(_df(spark, 0, 10, "old"), t)
    snapshot_upsert(spark, _df(spark, 5, 12, "new"), t, ["k"])
    rows = {r.k: r.v for r in snapshot_read(spark, t).collect()}
    assert len(rows) == 12
    assert all(rows[k] == "old" for k in range(5))
    assert all(rows[k] == "new" for k in range(5, 12))


def test_reader_isolation_across_concurrent_commit(spark, tmp_path):
    """A reader that resolved version 1 keeps its snapshot even after a
    full-replace commit lands: the old files still exist and the old
    manifest still lists exactly them."""
    t = tmp_path / "t"
    snapshot_write(_df(spark, 0, 10, "a"), t)
    reader = snapshot_read(spark, t)      # resolves v1's file list NOW
    snapshot_write(_df(spark, 0, 3, "b"), t)  # concurrent full replace
    assert reader.count() == 10           # executed AFTER the new commit
    assert snapshot_read(spark, t).count() == 3


def test_rollback_is_metadata_only(spark, tmp_path):
    t = tmp_path / "t"
    snapshot_write(_df(spark, 0, 10, "a"), t)
    snapshot_write(_df(spark, 0, 3, "b"), t)
    snapshot_rollback(t, 1)
    assert current_version(t) == 1
    assert snapshot_read(spark, t).count() == 10
    with pytest.raises(FileNotFoundError):
        snapshot_rollback(t, 99)


def test_vacuum_keeps_referenced_files(spark, tmp_path):
    t = tmp_path / "t"
    snapshot_write(_df(spark, 0, 10, "a"), t)
    snapshot_write(_df(spark, 0, 3, "b"), t)
    snapshot_append(_df(spark, 3, 6, "b"), t)  # v3 references v2's files too
    deleted = snapshot_vacuum(t, keep_versions=2)
    assert deleted  # v1's files are unreferenced by v2/v3 -> removed
    # retained versions still fully readable
    assert snapshot_read(spark, t, version=2).count() == 3
    assert snapshot_read(spark, t).count() == 6
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, t, version=1)


def test_stream_sink_exactly_once_across_replay(spark, tmp_path):
    """Two micro-batches stream into the table as two versions; a replayed
    batch_id (the crash-between-commit-and-checkpoint case) must NOT
    create a third version or duplicate rows."""
    from energy_datalake_solution_spark.sources.snapshots import (
        last_txn,
        stream_snapshot_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    _df(spark, 0, 10, "a").coalesce(1).write.json(str(src / "b0"))
    _df(spark, 10, 15, "a").coalesce(1).write.json(str(src / "b1"))
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    t = tmp_path / "table"
    q = stream_snapshot_sink(stream, t, tmp_path / "ckpt")
    q.awaitTermination(120)
    assert current_version(t) == 2
    assert snapshot_read(spark, t).count() == 15
    committed = last_txn(t)
    assert committed >= 0
    from energy_datalake_solution_spark.sources.snapshots import snapshot_append_once

    # post-crash replay: the SAME batch_id runs through the sink's real
    # commit path and must be a no-op
    before = current_version(t)
    snapshot_append_once(_df(spark, 10, 15, "a"), t, txn=committed)
    assert current_version(t) == before
    assert snapshot_read(spark, t).count() == 15
    # a genuinely NEW batch id still commits
    snapshot_append_once(_df(spark, 15, 16, "a"), t, txn=committed + 1)
    assert snapshot_read(spark, t).count() == 16
