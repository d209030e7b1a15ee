"""SQL catalog surface over snapshot tables: CREATE TABLE ... USING
snapshot, then plain ``spark.sql`` text — the layer that lets the
reference's ``.sql`` files (athena_queries/*.sql analogs, re-targeted in
sql_queries/) run VERBATIM against snapshot-backed curated tables.

Why not Spark's own ``CREATE TABLE ... USING snapshot``? The statement
parses and resolves the schema through the registered Python DataSource,
but in this Spark build the catalog does not propagate the table's
options to the SCAN-side DataSource instance (reader() sees an empty
options dict), so the first SELECT fails. This module provides the same
contract one level up:

  * ``SnapshotCatalog.sql(text)`` accepts the DDL forms
        CREATE [OR REPLACE] TABLE <name> USING snapshot
            (OPTIONS (path '<p>') | LOCATION '<p>') [VERSION AS OF <n>]
        DROP TABLE [IF EXISTS] <name>
    and passes every other statement to ``spark.sql`` after re-pointing
    the registered snapshot views at their tables' CURRENT versions.
  * Registration materializes a temp view over
    ``spark.read.format("snapshot")`` — the DataSource plans one
    InputPartition per data file from ONE resolved manifest, so each
    query reads a consistent snapshot; re-registration per ``sql()``
    call is O(manifest metadata) and gives catalog-table freshness
    (a view pinned at CREATE time would go stale after appends).

At 100 TB the per-query cost is the manifest resolution (O(change)
amortized through the delta-manifest cache) — never a file listing.

Reference parity: the reference's tables are Glue-catalog entries over
S3 parquet queried by name from Athena SQL (athena_queries/*.sql,
scripts/athena_querier.py); here the same name->SQL flow runs against
transactional snapshot tables. Version pinning (VERSION AS OF) has no
reference analog — Delta-style time travel surfaced through DDL.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?TABLE\s+(?P<name>[A-Za-z_][\w]*)\s+"
    r"USING\s+snapshot\s+"
    r"(?:OPTIONS\s*\(\s*path\s+'(?P<opath>[^']+)'\s*\)|LOCATION\s+'(?P<lpath>[^']+)')"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<version>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<ifex>IF\s+EXISTS\s+)?(?P<name>[A-Za-z_][\w]*)\s*;?\s*$",
    re.IGNORECASE,
)


class SnapshotCatalog:
    """Session-scoped snapshot-table catalog: name -> (path, version).

    ``sql()`` is the single entry point — DDL mutates the registry,
    anything else re-registers every live table at its current version
    and delegates to ``spark.sql``. The underlying DataSource must be
    registered once per session (done lazily here)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, tuple[str, int | None]] = {}
        from .snapshot_datasource import SnapshotDataSource

        try:
            spark.dataSource.register(SnapshotDataSource)
        except Exception:
            pass  # already registered in this session

    # -- DDL ---------------------------------------------------------------
    def create_table(
        self, name: str, path: str, version: int | None = None
    ) -> None:
        if not (Path(path) / "_latest").exists():
            raise FileNotFoundError(f"no snapshot table at {path}")
        self._tables[name] = (str(path), version)
        self._register(name)

    def drop_table(self, name: str, if_exists: bool = False) -> None:
        if name not in self._tables:
            if if_exists:
                return
            raise KeyError(f"no snapshot table registered as {name!r}")
        del self._tables[name]
        self.spark.catalog.dropTempView(name)

    # -- query -------------------------------------------------------------
    def sql(self, text: str) -> DataFrame | None:
        m = _CREATE_RE.match(text)
        if m:
            if m.group("name") in self._tables and not m.group("replace"):
                raise ValueError(
                    f"table {m.group('name')!r} already registered "
                    "(use CREATE OR REPLACE TABLE)"
                )
            v = m.group("version")
            self.create_table(
                m.group("name"),
                m.group("opath") or m.group("lpath"),
                int(v) if v is not None else None,
            )
            return None
        m = _DROP_RE.match(text)
        if m and m.group("name") in self._tables:
            self.drop_table(m.group("name"))
            return None
        # plain SQL: re-point every registered view at the CURRENT version
        # (O(manifest) each — catalog freshness without staleness bugs)
        for name in self._tables:
            self._register(name)
        return self.spark.sql(text)

    def _register(self, name: str) -> None:
        path, version = self._tables[name]
        reader = self.spark.read.format("snapshot").option("path", path)
        if version is not None:
            reader = reader.option("version", str(version))
        reader.load().createOrReplaceTempView(name)
