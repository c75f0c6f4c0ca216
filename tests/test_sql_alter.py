"""SQL DDL evolution: CREATE TABLE AS SELECT and the ALTER TABLE family
(ADD/RENAME/DROP/widen COLUMN, constraints, CLUSTER BY, RENAME TO) —
every action an O(metadata) commit surfaced through ``execute_sql``.

Reference parity note: the reference mutates BigQuery schemas through
console DDL (no code path); this is the rebuild's equivalent contract
on the snapshot format.
"""
from __future__ import annotations

import pytest

from wopen_spark.catalog import Catalog
from wopen_spark.snapshot_table import ConstraintViolationError, SnapshotTable
from wopen_spark.sql_dml import execute_sql


def _mk(spark, path, rows=((1, "a", 1.0), (2, "b", 2.0))):
    t = SnapshotTable(spark, str(path))
    t.create(
        spark.createDataFrame(list(rows), "id long, name string, val double")
        .coalesce(1)
    )
    return t


def test_ctas_creates_table_with_data(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    src.read().createOrReplaceTempView("ctas_src")
    cat = Catalog(str(tmp_path / "cat"))
    rep = execute_sql(
        spark,
        "CREATE TABLE crm.big CLUSTER BY (id) AS "
        "SELECT id, val * 10 AS v10 FROM ctas_src WHERE id > 1",
        catalog=cat,
    )
    assert rep["created"] is True
    t = cat.handle(spark, "crm.big")
    assert [(r.id, r.v10) for r in t.read().collect()] == [(2, 20.0)]
    assert t._state()["cluster_by"] == ["id"]
    # IF NOT EXISTS no-op; plain re-create refuses
    rep2 = execute_sql(
        spark, "CREATE TABLE IF NOT EXISTS crm.big AS SELECT 1 AS x",
        catalog=cat,
    )
    assert rep2["created"] is False
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(spark, "CREATE TABLE crm.big AS SELECT 1 AS x", catalog=cat)


def test_ctas_location_and_both_forms_refused(spark, tmp_path):
    loc = str(tmp_path / "ctas_loc")
    execute_sql(
        spark, f"CREATE TABLE adhoc LOCATION '{loc}' AS SELECT 7 AS id"
    )
    assert SnapshotTable(spark, loc).read().collect()[0].id == 7
    with pytest.raises(ValueError, match="not both"):
        execute_sql(
            spark,
            f"CREATE TABLE x (id INT) LOCATION '{loc}2' AS SELECT 1 AS id",
        )
    with pytest.raises(ValueError, match="AS SELECT"):
        execute_sql(spark, f"CREATE TABLE x LOCATION '{loc}3' AS DELETE FROM y")


def test_alter_add_columns_null_fill_and_write(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    rep = execute_sql(
        spark,
        "ALTER TABLE t ADD COLUMNS (score DOUBLE, tag STRING)",
        tables={"t": t},
    )
    assert rep["version"] == 2
    got = {r.id: (r.score, r.tag) for r in t.read().collect()}
    assert got == {1: (None, None), 2: (None, None)}
    # new writes carry the columns; old rows still read NULL
    t.append(
        spark.createDataFrame(
            [(3, "c", 3.0, 9.5, "hot")],
            "id long, name string, val double, score double, tag string",
        )
    )
    got = {r.id: r.score for r in t.read().collect()}
    assert got == {1: None, 2: None, 3: 9.5}
    # single unparenthesized form
    execute_sql(spark, "ALTER TABLE t ADD COLUMN rank INT", tables={"t": t})
    assert "rank" in t.read().columns
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(spark, "ALTER TABLE t ADD COLUMN rank INT", tables={"t": t})


def test_alter_add_after_drop_never_resurrects(spark, tmp_path):
    """Re-adding a dropped column name mints a fresh physical: old
    files' bytes for the dropped column must NOT reappear."""
    t = _mk(spark, tmp_path / "t")
    execute_sql(spark, "ALTER TABLE t DROP COLUMN val", tables={"t": t})
    assert t.read().columns == ["id", "name"]
    execute_sql(spark, "ALTER TABLE t ADD COLUMN val DOUBLE", tables={"t": t})
    assert {r.val for r in t.read().collect()} == {None}
    # and the remint is recorded as a mapping (physical != logical)
    assert t._state()["column_mapping"]["val"] != "val"


def test_alter_rename_and_widen(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    execute_sql(spark, "ALTER TABLE t RENAME COLUMN name TO label", tables={"t": t})
    assert t.read().columns == ["id", "label", "val"]
    execute_sql(spark, "ALTER TABLE t ALTER COLUMN id TYPE BIGINT", tables={"t": t})
    # id was already long: no-op, version unchanged
    assert t._state()["version"] == 2
    t2 = SnapshotTable(spark, str(tmp_path / "n"))
    t2.create(spark.createDataFrame([(1, 1.5)], "k int, v float").coalesce(1))
    execute_sql(spark, "ALTER TABLE n ALTER COLUMN k TYPE BIGINT", tables={"n": t2})
    execute_sql(spark, "ALTER TABLE n ALTER COLUMN v TYPE DOUBLE", tables={"n": t2})
    assert dict(t2.read().dtypes) == {"k": "bigint", "v": "double"}
    assert [(r.k, r.v) for r in t2.read().collect()] == [(1, 1.5)]
    with pytest.raises(TypeError, match="lossless"):
        execute_sql(spark, "ALTER TABLE n ALTER COLUMN k TYPE INT", tables={"n": t2})
    with pytest.raises(TypeError, match="lossless"):
        execute_sql(
            spark, "ALTER TABLE n ALTER COLUMN v TYPE STRING", tables={"n": t2}
        )


def test_alter_constraints_and_cluster_by(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    execute_sql(
        spark,
        "ALTER TABLE t ADD CONSTRAINT val_pos CHECK (val > 0)",
        tables={"t": t},
    )
    assert t.constraints() == {"val_pos": "val > 0"}
    with pytest.raises(ConstraintViolationError, match="val_pos"):
        t.append(spark.createDataFrame([(9, "x", -1.0)], t.read().schema))
    execute_sql(spark, "ALTER TABLE t DROP CONSTRAINT val_pos", tables={"t": t})
    assert t.constraints() == {}
    execute_sql(spark, "ALTER TABLE t CLUSTER BY (val, id)", tables={"t": t})
    assert t._state()["cluster_by"] == ["val", "id"]
    execute_sql(spark, "ALTER TABLE t CLUSTER BY NONE", tables={"t": t})
    assert t._state()["cluster_by"] == []


def test_alter_rename_to_catalog(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    t = _mk(spark, tmp_path / "t")
    cat.register("crm.old", t.path)
    execute_sql(spark, "ALTER TABLE crm.old RENAME TO crm.new", catalog=cat)
    assert cat.tables() == ["crm.new"]
    assert sorted(r.id for r in cat.handle(spark, "crm.new").read().collect()) == [1, 2]
    with pytest.raises(ValueError, match="catalog"):
        execute_sql(spark, "ALTER TABLE a RENAME TO b", tables={"a": t})


def test_alter_parse_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for bad in (
        "ALTER TABLE t FROBNICATE",
        "ALTER TABLE t ADD COLUMN 1bad INT",
        "ALTER TABLE t ADD COLUMNS (a INT) trailing",
        "ALTER TABLE t CLUSTER BY (val + 1)",
    ):
        with pytest.raises(ValueError):
            execute_sql(spark, bad, tables={"t": t})


def test_alter_time_travel_sees_old_schema(spark, tmp_path):
    """Schema evolution is versioned like data: time travel before the
    ALTER reads the old shape."""
    t = _mk(spark, tmp_path / "t")
    execute_sql(spark, "ALTER TABLE t ADD COLUMN extra INT", tables={"t": t})
    execute_sql(spark, "ALTER TABLE t RENAME COLUMN val TO amount", tables={"t": t})
    assert t.read(version=1).columns == ["id", "name", "val"]
    assert t.read(version=2).columns == ["id", "name", "val", "extra"]
    assert t.read().columns == ["id", "name", "amount", "extra"]
