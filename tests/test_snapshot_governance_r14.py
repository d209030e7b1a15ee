"""Round-14 governance fixes, pinned.

1. Identity-assignment guards are case-insensitive (UPDATE/MERGE
   ``SET ID = ...`` on identity column ``id`` refuses — Spark resolves
   identifiers case-insensitively and _normalize_assign_keys re-keys
   the map, so a case-sensitive guard was a silent bypass).
2. CHECK constraints referencing identity columns enforce AFTER
   allocation (Delta enforces CHECKs after identity generation): a
   pre-allocation-only pass deferred them forever.
3. Identifier scans strip string literals (a column name inside
   literal TEXT is not a reference) and skip function names.
4. CREATE TABLE column clauses parse in any order
   (``DEFAULT 1 NOT NULL`` == ``NOT NULL DEFAULT 1``).
5. Expression-valued DEFAULTs (``current_date()``-class): the raw
   expression is the write default (re-evaluated per batch), its
   DDL-time fold is the birth default for pre-existing rows;
   nondeterministic expressions (``rand()``) refuse.
6. ``snapshot_write`` into an identity table routes to the allocating
   full-replace (Delta's overwrite-into-identity-table) instead of
   refusing.
"""
import datetime

import pytest

from energy_datalake_solution_spark.sources.snapshot_catalog import (
    SnapshotCatalog,
)
from energy_datalake_solution_spark.sources.snapshots import (
    SnapshotConstraintViolation,
    snapshot_merge,
    snapshot_read,
    snapshot_write,
)


def test_identity_guard_case_insensitive_merge(spark, tmp_path):
    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    cat.sql(
        f"CREATE TABLE mcase (id bigint GENERATED ALWAYS AS IDENTITY, "
        f"v string) USING snapshot LOCATION '{t}'"
    )
    cat.sql("INSERT INTO mcase (v) VALUES ('a'), ('b')")
    # matched_update keyed by a different case must refuse, not
    # silently overwrite the identity column
    with pytest.raises(ValueError, match="IDENTITY"):
        snapshot_merge(
            spark,
            spark.createDataFrame([("a",)], "v string"),
            t, ["v"],
            matched_update={"ID": "99"},
            not_matched_insert=False,
        )
    # mixed-case explicit insert column refuses too
    with pytest.raises(ValueError, match="IDENTITY"):
        snapshot_merge(
            spark,
            spark.createDataFrame([(7, "z")], "ID long, v string"),
            t, ["v"],
        )
    # values untouched by the refused merges
    got = {r.v: r.id for r in snapshot_read(spark, t).collect()}
    assert got == {"a": 1, "b": 2}


def test_check_constraint_on_identity_enforced_post_allocation(
    spark, tmp_path
):
    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    cat.sql(
        f"CREATE TABLE capt (id bigint GENERATED ALWAYS AS IDENTITY, "
        f"v string) USING snapshot LOCATION '{t}'"
    )
    cat.sql("INSERT INTO capt (v) VALUES ('a'), ('b')")  # ids 1, 2
    cat.sql("ALTER TABLE capt ADD CONSTRAINT id_small CHECK (id < 4)")
    cat.sql("INSERT INTO capt (v) VALUES ('c')")  # id 3: fine
    # the next allocation (id 4) violates — must refuse, not land
    with pytest.raises(SnapshotConstraintViolation, match="id_small"):
        cat.sql("INSERT INTO capt (v) VALUES ('d')")
    got = sorted(r.id for r in snapshot_read(spark, t).collect())
    assert got == [1, 2, 3]
    # INSERT OVERWRITE (replace-where) allocates CONTINUING the
    # high-water mark — past 4, so the same constraint bites there too
    with pytest.raises(SnapshotConstraintViolation, match="id_small"):
        cat.sql("INSERT OVERWRITE capt SELECT 'x' AS v")
    got2 = sorted(r.id for r in snapshot_read(spark, t).collect())
    assert got2 == [1, 2, 3]  # refused overwrite left the table alone
    # MERGE insert arms allocate too; same gate
    with pytest.raises(SnapshotConstraintViolation, match="id_small"):
        snapshot_merge(
            spark,
            spark.createDataFrame([("e",)], "v string"),
            t, ["v"],
        )


def test_identity_name_inside_string_literal_not_a_reference(
    spark, tmp_path
):
    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    cat.sql(
        f"CREATE TABLE slit (id bigint GENERATED ALWAYS AS IDENTITY, "
        f"v string) USING snapshot LOCATION '{t}'"
    )
    # 'id' appears only inside a string literal: NOT a reference to
    # the identity column, so the constraint enforces pre-allocation
    # like any other (and either way a violating batch must refuse)
    cat.sql("ALTER TABLE slit ADD CONSTRAINT no_id CHECK (v <> 'id')")
    cat.sql("INSERT INTO slit (v) VALUES ('ok')")
    with pytest.raises(SnapshotConstraintViolation, match="no_id"):
        cat.sql("INSERT INTO slit (v) VALUES ('id')")
    assert [r.v for r in snapshot_read(spark, t).collect()] == ["ok"]


def test_create_table_clause_order_free(spark, tmp_path):
    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    cat.sql(
        f"CREATE TABLE ord14 ("
        f"a bigint DEFAULT 1 NOT NULL, "
        f"b string COMMENT 'b col' NOT NULL, "
        f"c bigint NOT NULL GENERATED ALWAYS AS IDENTITY "
        f"(START WITH 10 INCREMENT BY 1)"
        f") USING snapshot LOCATION '{t}'"
    )
    cat.sql("INSERT INTO ord14 (b) VALUES ('x')")
    row = snapshot_read(spark, t).collect()[0]
    assert (row.a, row.b, row.c) == (1, "x", 10)
    # NOT NULL parsed even though it FOLLOWED the DEFAULT clause
    with pytest.raises(SnapshotConstraintViolation):
        cat.sql("INSERT INTO ord14 (a, b) VALUES (NULL, 'y')")
    # duplicate clauses refuse loudly
    t2 = tmp_path / "t2"
    with pytest.raises(ValueError, match="column spec"):
        cat.sql(
            f"CREATE TABLE dup14 (a bigint NOT NULL NOT NULL) "
            f"USING snapshot LOCATION '{t2}'"
        )


def test_expression_default_write_and_birth(spark, tmp_path):
    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    today = datetime.date.today()
    cat.sql(
        f"CREATE TABLE expd (k bigint, d date DEFAULT current_date()) "
        f"USING snapshot LOCATION '{t}'"
    )
    # narrow write: the WRITE default re-evaluates at insert time
    cat.sql("INSERT INTO expd (k) VALUES (1)")
    got = snapshot_read(spark, t).collect()
    assert got[0].d == today
    # ADD COLUMN with an expression default: pre-existing rows read the
    # DDL-time fold (the birth default), narrow writes the live one
    cat.sql(
        "ALTER TABLE expd ADD COLUMN seen date DEFAULT current_date()"
    )
    assert {r.seen for r in cat.sql("SELECT seen FROM expd").collect()} \
        == {today}
    cat.sql("INSERT INTO expd (k) VALUES (2)")
    assert {r.seen for r in cat.sql("SELECT seen FROM expd").collect()} \
        == {today}
    # nondeterministic expressions refuse at DDL time
    t2 = tmp_path / "t2"
    with pytest.raises(ValueError, match="nondeterministic"):
        cat.sql(
            f"CREATE TABLE badd (x double DEFAULT rand()) "
            f"USING snapshot LOCATION '{t2}'"
        )
    with pytest.raises(ValueError, match="nondeterministic"):
        cat.sql("ALTER TABLE expd ALTER COLUMN d SET DEFAULT rand()")
    # column references are not constants
    with pytest.raises(ValueError, match="constant"):
        cat.sql("ALTER TABLE expd ALTER COLUMN d SET DEFAULT k + 1")
    # a deterministic EXPRESSION write default via SET DEFAULT works
    cat.sql(
        "ALTER TABLE expd ALTER COLUMN d SET DEFAULT "
        "date_add(current_date(), 7)"
    )
    cat.sql("INSERT INTO expd (k) VALUES (3)")
    by_k = {r.k: r.d for r in cat.sql("SELECT k, d FROM expd").collect()}
    assert by_k[3] == today + datetime.timedelta(days=7)
    assert by_k[1] == today  # materialized at ITS write time


def test_snapshot_write_identity_routes_to_allocating_replace(
    spark, tmp_path
):
    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    cat.sql(
        f"CREATE TABLE wri (id bigint GENERATED ALWAYS AS IDENTITY, "
        f"v string) USING snapshot LOCATION '{t}'"
    )
    cat.sql("INSERT INTO wri (v) VALUES ('a'), ('b'), ('c')")  # 1..3
    snapshot_write(spark.createDataFrame([("z",), ("w",)], "v string"), t)
    got = {r.v: r.id for r in snapshot_read(spark, t).collect()}
    # full replace, with fresh ids continuing the high-water mark
    # (never re-used — Delta's identity contract survives overwrite)
    assert set(got) == {"z", "w"} and min(got.values()) >= 4
    # explicit identity supply still refuses through this route
    with pytest.raises(ValueError, match="IDENTITY"):
        snapshot_write(
            spark.createDataFrame([(1, "q")], "id long, v string"), t
        )


def test_create_table_inline_partitioned_by(spark, tmp_path):
    """PARTITIONED BY inline in CREATE TABLE (both positions: between
    USING and LOCATION — Spark's order — and after LOCATION); unknown
    partition columns refuse at DDL time."""
    cat = SnapshotCatalog(spark)
    from energy_datalake_solution_spark.sources.snapshots import (
        _read_manifest,
        current_version,
    )

    t1, t2 = tmp_path / "a", tmp_path / "b"
    cat.sql(
        f"CREATE TABLE ipa (k bigint, y int) USING snapshot "
        f"PARTITIONED BY (y) LOCATION '{t1}'"
    )
    cat.sql(
        f"CREATE TABLE ipb (k bigint, y int) USING snapshot "
        f"LOCATION '{t2}' PARTITIONED BY (y)"
    )
    for t in (t1, t2):
        m = _read_manifest(t, current_version(t))
        assert m["partitioning"] == {"cols": ["y"]}
    cat.sql("INSERT INTO ipa VALUES (1, 2020), (2, 2021)")
    assert sorted(
        r.y for r in cat.sql("SHOW PARTITIONS ipa").collect()
    ) == [2020, 2021]
    with pytest.raises(ValueError, match="undeclared"):
        cat.sql(
            f"CREATE TABLE ipc (k bigint) USING snapshot "
            f"PARTITIONED BY (nope) LOCATION '{tmp_path / 'c'}'"
        )


def test_add_column_full_spec(spark, tmp_path):
    """ADD COLUMN with the full CREATE TABLE clause grammar: COMMENT and
    NOT NULL (only with a DEFAULT), expression defaults, multi-column
    ADD COLUMNS, and the GENERATED/IDENTITY refusals."""
    import datetime

    cat = SnapshotCatalog(spark)
    t = tmp_path / "t"
    cat.sql(
        f"CREATE TABLE acf (k bigint) USING snapshot LOCATION '{t}'"
    )
    cat.sql("INSERT INTO acf VALUES (1), (2)")
    cat.sql(
        "ALTER TABLE acf ADD COLUMN note string "
        "COMMENT 'a note' DEFAULT 'n/a' NOT NULL"
    )
    desc = {
        r.col_name: (r.info, r.comment)
        for r in cat.sql("DESCRIBE TABLE acf").collect()
    }
    assert desc["note"] == ("NOT NULL DEFAULT 'n/a'", "a note")
    # pre-existing rows read the default (and so satisfy NOT NULL)
    assert {r.note for r in snapshot_read(spark, t).collect()} == {"n/a"}
    with pytest.raises(SnapshotConstraintViolation):
        cat.sql("INSERT INTO acf (k, note) VALUES (9, NULL)")
    # multi-column ADD COLUMNS with an expression default
    cat.sql(
        "ALTER TABLE acf ADD COLUMNS "
        "(seen date DEFAULT current_date(), tag string)"
    )
    row = cat.sql("SELECT seen, tag FROM acf").first()
    assert row.seen == datetime.date.today() and row.tag is None
    # refusals
    with pytest.raises(ValueError, match="GENERATED"):
        cat.sql("ALTER TABLE acf ADD COLUMN g bigint "
                "GENERATED ALWAYS AS (k + 1)")
    with pytest.raises(ValueError, match="GENERATED"):
        cat.sql("ALTER TABLE acf ADD COLUMN i bigint "
                "GENERATED ALWAYS AS IDENTITY")
    with pytest.raises(ValueError, match="DEFAULT"):
        cat.sql("ALTER TABLE acf ADD COLUMN nn bigint NOT NULL")


def test_snapshot_write_materializes_write_defaults(spark, tmp_path):
    """snapshot_write is a row-creating write: a narrow batch omitting a
    write-defaulted column must materialize the WRITE default (same as
    appends), not leave the column to resolve the stale birth default."""
    from energy_datalake_solution_spark.sources.snapshots import (
        snapshot_enable_column_mapping,
        snapshot_set_column_default,
    )

    t = tmp_path / "t"
    snapshot_write(
        spark.createDataFrame([(1, "old")], "k long, v string"), t
    )
    snapshot_enable_column_mapping(spark, t)
    snapshot_set_column_default(t, "v", "'bulk'")
    snapshot_write(spark.createDataFrame([(2,)], "k long"), t)
    assert {(r.k, r.v) for r in snapshot_read(spark, t).collect()} \
        == {(2, "bulk")}
    # DROP DEFAULT: later narrow full-replaces materialize NULL
    snapshot_set_column_default(t, "v", None)
    snapshot_write(spark.createDataFrame([(3,)], "k long"), t)
    assert {(r.k, r.v) for r in snapshot_read(spark, t).collect()} \
        == {(3, None)}


def test_append_explicit_identity_case_insensitive(spark, tmp_path):
    """A batch carrying 'ID' against identity column 'id' is an explicit
    write (Spark resolves identifiers case-insensitively) — the append
    and replace-where guards must refuse it, not add a second column."""
    from energy_datalake_solution_spark.sources.snapshots import (
        snapshot_append,
        snapshot_replace_where,
    )

    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    cat.sql(
        f"CREATE TABLE ci14 (id bigint GENERATED ALWAYS AS IDENTITY, "
        f"v string) USING snapshot LOCATION '{t}'"
    )
    bad = spark.createDataFrame([(9, "x")], "ID long, v string")
    with pytest.raises(ValueError, match="IDENTITY"):
        snapshot_append(bad, t)
    with pytest.raises(ValueError, match="IDENTITY"):
        snapshot_replace_where(spark, t, None, bad)


def test_add_columns_statement_is_pre_validated(spark, tmp_path):
    """A multi-column ADD COLUMNS whose LATER spec is invalid must
    refuse before ANY column commits — no half-applied DDL."""
    from energy_datalake_solution_spark.sources.snapshots import (
        _read_manifest,
        current_version,
    )

    t = tmp_path / "t"
    cat = SnapshotCatalog(spark)
    cat.sql(f"CREATE TABLE pv14 (k bigint) USING snapshot LOCATION '{t}'")
    v_before = current_version(t)
    with pytest.raises(ValueError, match="GENERATED"):
        cat.sql(
            "ALTER TABLE pv14 ADD COLUMNS "
            "(a bigint, b bigint GENERATED ALWAYS AS (a))"
        )
    with pytest.raises(ValueError, match="non-NULL DEFAULT"):
        cat.sql(
            "ALTER TABLE pv14 ADD COLUMNS "
            "(c bigint, d string DEFAULT NULL NOT NULL)"
        )
    assert current_version(t) == v_before  # zero commits landed
    m = _read_manifest(t, v_before)
    assert [c["name"] for c in m["schema"]["cols"]] == ["k"]


def test_bpe_oracles_survive_merge_exhaustion(spark, tmp_path):
    """A corpus with fewer learnable merges than N_BPE_MERGES: the Spark
    trainer breaks early; the DuckDB oracle's exhaustion sentinel must
    degrade the remaining stages to no-ops (not collapse the vocabulary
    to zero rows), keeping both queries hash-equal."""
    import duckdb
    import pandas as pd

    from energy_datalake_solution_spark.plans.registry import (
        get_oracles,
        get_queries,
    )
    from tests.oracle_harness import compare

    qs, orc = get_queries(), get_oracles()
    for tdf in (
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c", "a a", ""]}),
        pd.DataFrame({"doc_id": [1, 2], "text": ["ab ab ab", "ab c"]}),
    ):
        spark.createDataFrame(tdf).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        con = duckdb.connect()
        con.register("documents", tdf)
        for name in ("corpus_bpe_merges", "docs_bpe_encode"):
            probs = compare(
                qs[name](spark, str(tmp_path)),
                con.execute(orc[name]).fetchdf(),
                name,
            )
            assert not probs, probs
