"""PySpark Python DataSource over the snapshot table format: the format
plugs into Spark's own reader surface —

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("snapshot").option("path", t).load()
    spark.readStream.format("snapshot").option("path", t).load()

so a snapshot table is consumed like any Spark source (joins, SQL views,
Structured Streaming triggers, checkpointed exactly-once progress — all
free from the engine), instead of only through this package's Python API.

Batch read: one InputPartition PER DATA FILE, planned from ONE resolved
manifest — a consistent snapshot no matter what writers do during the
scan, with the file's deletion-vector positions shipped inside the
partition (each task drops its own dead rows; no join stage). Column
mapping applies physical->logical per batch. At 100 TB the planning cost
is the manifest resolution (O(change) amortized via the delta-manifest
cache); tasks read only their own file via pyarrow and stream Arrow
record batches to Spark — no Python row loop.

Streaming read: offsets are TABLE VERSIONS (the same contract as
snapshot_tail_changes, but surfaced through Spark's offset log — the
engine's checkpoint carries {"version": N}, so exactly-once restart
semantics come from Structured Streaming itself). Each micro-batch is the
rows of files ADDED in the version window with the end version's
deletion vectors applied: the append-feed contract of
snapshot_read_incremental. Windows containing rewrites (upserts,
compactions) re-emit carried rows by that contract — consumers needing
NET row changes use snapshot_tail_changes / snapshot_change_feed.

Reference parity: the reference has no streaming source at all (its
ingest is S3-event Lambda, lambda/ingestion_to_raw.py:16-17); this is
north-star surface following Delta's streaming-source design
(startingVersion offsets over the transaction log).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .snapshots import (
    _dv_key,
    _read_manifest,
    _unpack_positions,
    current_version,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, positions: list | None, rename: list | None):
        self.path = path
        self.positions = positions  # packed DV entry for THIS file, or None
        self.rename = rename  # [(physical, logical, type_ddl)] or None


def _arrow_batches(part: _FilePartition):
    """Read one parquet file as Arrow batches, dropping DV positions and
    applying the column mapping — pure Arrow, no Python row loop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(part.path)
    if part.positions:
        dead = np.asarray(_unpack_positions(part.positions), dtype=np.int64)
        keep = np.ones(table.num_rows, dtype=bool)
        keep[dead[dead < table.num_rows]] = False
        table = table.filter(pa.array(keep))
    if part.rename is not None:
        cols, names = [], []
        for physical, logical, _t in part.rename:
            names.append(logical)
            if physical in table.column_names:
                cols.append(table.column(physical))
            else:
                cols.append(pa.nulls(table.num_rows))
        table = pa.table(dict(zip(names, cols)))
    yield from table.to_batches()


def _mapping_renames(schema_meta: dict | None):
    if not schema_meta:
        return None
    return [(c["physical"], c["name"], c["type"]) for c in schema_meta["cols"]]


def _spark_schema_for(table_path: Path, version: int):
    """Merged Spark schema of a version's files (logical names when the
    table is column-mapped), via pyarrow footers — no JVM needed at
    datasource-schema time."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    m = _read_manifest(table_path, version)
    sch = None
    for rel in m["files"]:
        s = pq.read_schema(str(table_path / rel))
        sch = s if sch is None else pa_unify(sch, s)
    if sch is None:
        raise ValueError(f"version {version} of {table_path} lists no files")
    mapping = m.get("schema")
    spark_schema = from_arrow_schema(sch)
    if not mapping:
        return spark_schema
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    by_physical = {f.name: f for f in spark_schema.fields}
    out = []
    for c in mapping["cols"]:
        f = by_physical.get(c["physical"])
        dtype = f.dataType if f is not None else _parse_datatype_string(c["type"])
        out.append(StructField(c["name"], dtype, True))
    return StructType(out)


def pa_unify(a, b):
    """Union two Arrow schemas by field name (later files may add columns
    — additive evolution); first-seen type wins, matching the read side's
    mergeSchema behavior at the fidelity the tests exercise."""
    import pyarrow as pa

    fields = list(a)
    names = {f.name for f in a}
    for f in b:
        if f.name not in names:
            fields.append(f)
    return pa.schema(fields)


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, table_path: str, version: int | None):
        self.table_path = Path(table_path)
        self.version = (
            current_version(self.table_path) if version is None else version
        )

    def partitions(self):
        m = _read_manifest(self.table_path, self.version)
        dv = m.get("dv", {}) or {}
        rename = _mapping_renames(m.get("schema"))
        # dv dicts are suffix-keyed via _dv_key; a shallow clone's inherited
        # ABSOLUTE refs only match through it (raw dv.get(rel) would silently
        # drop the vector and resurrect MOR-deleted rows).
        return [
            _FilePartition(str(self.table_path / rel), dv.get(_dv_key(rel)), rename)
            for rel in m["files"]
        ]

    def read(self, partition: _FilePartition):
        yield from _arrow_batches(partition)


class _SnapshotStreamReader(DataSourceStreamReader):
    """Version-offset streaming source: each micro-batch covers the files
    ADDED between the start and end versions, with the END version's
    deletion vectors applied (rows already dead at planning time are
    never emitted). Offsets live in Spark's checkpoint, so restart
    resumes exactly where the engine recorded — the source itself is
    stateless."""

    def __init__(self, table_path: str, starting_version: int):
        self.table_path = Path(table_path)
        self.starting_version = starting_version

    def initialOffset(self):
        return {"version": self.starting_version}

    def latestOffset(self):
        return {"version": current_version(self.table_path)}

    def partitions(self, start: dict, end: dict):
        v_from, v_to = int(start["version"]), int(end["version"])
        if v_to <= v_from:
            return []
        m_to = _read_manifest(self.table_path, v_to)
        old = (
            set(_read_manifest(self.table_path, v_from)["files"])
            if v_from
            else set()
        )
        added = sorted(set(m_to["files"]) - old)
        dv = m_to.get("dv", {}) or {}
        rename = _mapping_renames(m_to.get("schema"))
        # suffix-keyed DV lookup (see _SnapshotBatchReader.partitions)
        return [
            _FilePartition(str(self.table_path / rel), dv.get(_dv_key(rel)), rename)
            for rel in added
        ]

    def read(self, partition: _FilePartition):
        yield from _arrow_batches(partition)

    def commit(self, end: dict) -> None:
        pass  # progress lives in Spark's checkpoint offset log


class SnapshotDataSource(DataSource):
    """``spark.read.format("snapshot")`` / ``spark.readStream.format(
    "snapshot")`` over a snapshot table. Options: ``path`` (table root,
    required), ``version`` (batch time travel), ``startingVersion``
    (stream catch-up start; default 0 = from the table's beginning)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("snapshot datasource requires .option('path', ...)")
        return p

    def schema(self):
        v_opt = self.options.get("version")
        p = Path(self._path())
        v = int(v_opt) if v_opt is not None else current_version(p)
        return _spark_schema_for(p, v)

    def reader(self, schema) -> DataSourceReader:
        v = self.options.get("version")
        return _SnapshotBatchReader(
            self._path(), int(v) if v is not None else None
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _SnapshotStreamReader(
            self._path(), int(self.options.get("startingVersion", 0))
        )
