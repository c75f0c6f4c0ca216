"""Named-table catalog: register/resolve/rename/unregister semantics,
commit-race linearization, and the three by-name consumer routes —
execute_sql, the wopen_snapshot datasource (wopen:// and .option
("table")), and sql_frontdoor.register_catalog_views."""

from __future__ import annotations

import json
import os

import pytest

from wopen_spark.catalog import Catalog
from wopen_spark.snapshot_table import SnapshotTable


def _mk_table(spark, path, rows=((1, "a", 10.0), (2, "b", 20.0))):
    t = SnapshotTable(spark, path)
    t.create(
        spark.createDataFrame(
            list(rows), "id long, name string, val double"
        ).coalesce(1)
    )
    return t


# ---------------------------------------------------------------- registry


def test_register_resolve_roundtrip(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    assert cat.tables() == []
    v = cat.register("crm.events", "/tables/events")
    assert v == 1
    assert cat.tables() == ["crm.events"]
    e = cat.resolve("crm.events")
    assert e == {"path": "/tables/events", "options": {}}


def test_resolve_missing_raises_keyerror(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    with pytest.raises(KeyError):
        cat.resolve("nope")


def test_register_duplicate_refused_identical_idempotent(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("t", "/a")
    # identical re-register is an idempotent no-op-ish commit, never an error
    cat.register("t", "/a")
    with pytest.raises(ValueError, match="already registered"):
        cat.register("t", "/b")
    cat.register("t", "/b", replace=True)
    assert cat.resolve("t")["path"] == "/b"


def test_rename_atomic_and_unregister(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("crm.old", "/x", options={"s3_endpoint": "http://e"})
    cat.rename("crm.old", "crm.new")
    assert cat.tables() == ["crm.new"]
    assert cat.resolve("crm.new")["options"] == {"s3_endpoint": "http://e"}
    with pytest.raises(KeyError):
        cat.rename("crm.old", "crm.other")
    cat.register("other", "/y")
    with pytest.raises(ValueError, match="already exists"):
        cat.rename("crm.new", "other")
    cat.unregister("other")
    assert cat.tables() == ["crm.new"]
    with pytest.raises(KeyError):
        cat.unregister("other")


def test_bad_names_rejected(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    for bad in ("", "1abc", "a.", ".a", "a..b", "a b", "a.b.c.d", "a-b"):
        with pytest.raises(ValueError, match="bad table name"):
            cat.register(bad, "/p")


def test_commit_race_linearizes_two_handles(tmp_path):
    """Two Catalog handles on one root interleave mutations: versions are
    a gapless 1..N linear history and both registrations survive."""
    root = str(tmp_path / "cat")
    a, b = Catalog(root), Catalog(root)
    a.register("one", "/1")
    b.register("two", "/2")  # b's head-read must see a's commit
    a.register("three", "/3")
    assert a.tables() == b.tables() == ["one", "three", "two"]
    log = sorted(os.listdir(str(tmp_path / "cat" / "_catalog")))
    assert [int(f[:8]) for f in log] == [1, 2, 3]
    # every snapshot parses and carries the full map at that version
    final = json.loads(
        open(str(tmp_path / "cat" / "_catalog" / log[-1]), "rb").read()
    )
    assert set(final["tables"]) == {"one", "two", "three"}


def test_lost_race_reapplies_against_new_head(tmp_path, monkeypatch):
    """A put_if_absent conflict re-reads the head and re-applies — the
    loser's registration lands at the next version, and a genuinely
    conflicting duplicate surfaces instead of clobbering."""
    root = str(tmp_path / "cat")
    cat = Catalog(root)
    cat.register("seed", "/s")
    real = cat._store.put_if_absent
    raced = {"done": False}

    def inject(name, data):
        if not raced["done"]:
            raced["done"] = True
            Catalog(root).register("sniped", "/race")  # racer wins v2
        real(name, data)

    monkeypatch.setattr(cat._store, "put_if_absent", inject)
    v = cat.register("mine", "/m")
    assert v == 3 and cat.resolve("sniped")["path"] == "/race"
    raced["done"] = False
    with pytest.raises(ValueError, match="already registered"):
        cat.register("sniped", "/other")  # injected racer re-registers? no:
        # 'sniped' already present from above — duplicate surfaces


# --------------------------------------------------------- by-name consumers


def test_handle_reads_table_and_memoizes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("crm.t", path)
    h1 = cat.handle(spark, "crm.t")
    assert sorted(r.id for r in h1.read().collect()) == [1, 2]
    assert cat.handle(spark, "crm.t") is h1
    # repointing the name yields a fresh handle for the new entry
    path2 = str(tmp_path / "tbl2")
    _mk_table(spark, path2, rows=((9, "z", 1.0),))
    cat.register("crm.t", path2, replace=True)
    h2 = cat.handle(spark, "crm.t")
    assert h2 is not h1
    assert [r.id for r in h2.read().collect()] == [9]


def test_execute_sql_by_name(spark, tmp_path):
    from wopen_spark.sql_dml import execute_sql

    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("crm.t", path)
    execute_sql(
        spark, "UPDATE crm.t SET val = val + 1 WHERE id = 1", catalog=cat
    )
    execute_sql(
        spark, "INSERT INTO crm.t VALUES (3, 'c', 30.0)", catalog=cat
    )
    execute_sql(spark, "DELETE FROM crm.t WHERE id = 2", catalog=cat)
    got = sorted(
        (r.id, r.name, r.val)
        for r in cat.handle(spark, "crm.t").read().collect()
    )
    assert got == [(1, "a", 11.0), (3, "c", 30.0)]
    # explicit tables dict still wins over the catalog
    other = _mk_table(spark, str(tmp_path / "other"), rows=((7, "q", 0.0),))
    execute_sql(
        spark, "DELETE FROM crm.t WHERE id = 7",
        tables={"crm.t": other}, catalog=cat,
    )
    assert other.read().count() == 0
    assert cat.handle(spark, "crm.t").read().count() == 2


def test_execute_sql_unknown_name_lists_registry(spark, tmp_path):
    from wopen_spark.sql_dml import execute_sql

    cat = Catalog(str(tmp_path / "cat"))
    cat.register("known", str(tmp_path / "t"))
    with pytest.raises(ValueError, match=r"unknown delete target.*known"):
        execute_sql(spark, "DELETE FROM ghost", catalog=cat)


def test_datasource_wopen_uri_read(spark, tmp_path):
    from wopen_spark.datasource import register_snapshot_datasource

    register_snapshot_datasource(spark)
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("crm.t", path)
    df = (
        spark.read.format("wopen_snapshot")
        .option("catalogRoot", str(tmp_path / "cat"))
        .load("wopen://crm.t")
    )
    assert sorted(r.id for r in df.collect()) == [1, 2]


def test_datasource_table_option_write(spark, tmp_path):
    from wopen_spark.datasource import register_snapshot_datasource

    register_snapshot_datasource(spark)
    path = str(tmp_path / "tbl")
    t = _mk_table(spark, path)
    cat_root = str(tmp_path / "cat")
    Catalog(cat_root).register("crm.t", path)
    (
        spark.createDataFrame([(5, "e", 50.0)], "id long, name string, val double")
        .write.format("wopen_snapshot")
        .option("table", "crm.t")
        .option("catalogRoot", cat_root)
        .mode("append")
        .save()
    )
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 5]


def test_env_root_resolution_unit(tmp_path, monkeypatch):
    """WOPEN_CATALOG_ROOT fallback, exercised on the DataSource object
    directly: in a real deployment the variable must be set before the
    session starts (Python workers inherit the JVM's environment at
    launch), so the in-Spark route is covered by the option-based tests
    and this pins the env fallback in-process."""
    from wopen_spark.datasource import SnapshotTableDataSource

    cat_root = str(tmp_path / "cat")
    Catalog(cat_root).register("crm.t", "/the/real/path",
                               options={"s3_endpoint": "http://e"})
    monkeypatch.setenv("WOPEN_CATALOG_ROOT", cat_root)
    ds = SnapshotTableDataSource({"table": "crm.t"})
    assert ds.options["path"] == "/the/real/path"
    assert ds.options["s3_endpoint"] == "http://e"
    # caller options win over entry options
    ds2 = SnapshotTableDataSource(
        {"path": "wopen://crm.t", "s3_endpoint": "http://override"}
    )
    assert ds2.options["path"] == "/the/real/path"
    assert ds2.options["s3_endpoint"] == "http://override"


def test_datasource_name_without_root_or_entry_raises(spark, tmp_path):
    from wopen_spark.datasource import register_snapshot_datasource

    register_snapshot_datasource(spark)
    os.environ.pop("WOPEN_CATALOG_ROOT", None)
    with pytest.raises(Exception, match="catalog root"):
        spark.read.format("wopen_snapshot").load("wopen://no.where").collect()
    cat_root = str(tmp_path / "cat")
    Catalog(cat_root).register("real", str(tmp_path / "x"))
    with pytest.raises(Exception, match="not registered"):
        (
            spark.read.format("wopen_snapshot")
            .option("catalogRoot", cat_root)
            .load("wopen://no.where")
            .collect()
        )


def test_register_catalog_views(spark, tmp_path):
    from wopen_spark.sql_frontdoor import register_catalog_views

    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    _mk_table(spark, p1)
    _mk_table(spark, p2, rows=((3, "c", 30.0),))
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("crm.one", p1)
    cat.register("two", p2)
    views = register_catalog_views(spark, cat)
    assert views == {"crm.one": "crm__one", "two": "two"}
    got = spark.sql(
        "SELECT (SELECT count(*) FROM crm__one) AS a, "
        "(SELECT max(id) FROM two) AS b"
    ).collect()[0]
    assert (got.a, got.b) == (2, 3)


def test_show_tables_and_describe(spark, tmp_path):
    from wopen_spark.sql_dml import execute_sql

    path = str(tmp_path / "tbl")
    t = _mk_table(spark, path)
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("crm.t", path)
    other = _mk_table(spark, str(tmp_path / "o"), rows=((9, "z", 0.5),))

    shown = execute_sql(
        spark, "SHOW TABLES", tables={"adhoc": other}, catalog=cat
    ).collect()
    assert [(r.name, r.path) for r in shown] == [
        ("adhoc", other.path), ("crm.t", t.path)
    ]

    desc = execute_sql(spark, "DESCRIBE crm.t", catalog=cat).collect()
    assert [(r.col_name, r.data_type) for r in desc] == [
        ("id", "bigint"), ("name", "string"), ("val", "double")
    ]
    # DESCRIBE TABLE spelling + dict resolution
    desc2 = execute_sql(spark, "DESCRIBE TABLE adhoc", tables={"adhoc": other})
    assert desc2.count() == 3
    # DESCRIBE HISTORY still routes to the history surface
    hist = execute_sql(spark, "DESCRIBE HISTORY crm.t", catalog=cat)
    assert hist.columns[0] == "version"


def test_create_and_drop_table_sql(spark, tmp_path):
    """The SQL-only table lifecycle: CREATE TABLE registers an empty
    transactional table in the catalog (location derived from the root
    when omitted), INSERT/DESCRIBE work by name immediately, DROP TABLE
    unlinks the name but leaves the files (external semantics)."""
    from wopen_spark.sql_dml import execute_sql

    cat = Catalog(str(tmp_path / "cat"))
    rep = execute_sql(
        spark,
        "CREATE TABLE crm.orders (id BIGINT, status STRING, "
        "amount DECIMAL(10,2)) CLUSTER BY (id)",
        catalog=cat,
    )
    assert rep["created"] is True
    assert cat.tables() == ["crm.orders"]
    execute_sql(
        spark, "INSERT INTO crm.orders VALUES (1, 'OPEN', 10.50)", catalog=cat
    )
    got = cat.handle(spark, "crm.orders").read().collect()
    assert [(r.id, r.status, str(r.amount)) for r in got] == [(1, "OPEN", "10.50")]
    desc = execute_sql(spark, "DESCRIBE crm.orders", catalog=cat).collect()
    assert [(r.col_name, r.data_type) for r in desc] == [
        ("id", "bigint"), ("status", "string"), ("amount", "decimal(10,2)")
    ]
    # IF NOT EXISTS no-op; bare re-create refuses
    rep2 = execute_sql(
        spark, "CREATE TABLE IF NOT EXISTS crm.orders (x INT)", catalog=cat
    )
    assert rep2["created"] is False
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(spark, "CREATE TABLE crm.orders (x INT)", catalog=cat)

    path = rep["path"]
    execute_sql(spark, "DROP TABLE crm.orders", catalog=cat)
    assert cat.tables() == []
    assert os.path.isdir(path), "DROP must not delete files"
    assert execute_sql(
        spark, "DROP TABLE IF EXISTS crm.orders", catalog=cat
    ) == {"dropped": None}
    with pytest.raises(ValueError, match="unknown drop target"):
        execute_sql(spark, "DROP TABLE crm.orders", catalog=cat)


def test_create_table_location_and_no_catalog(spark, tmp_path):
    from wopen_spark.sql_dml import execute_sql

    loc = str(tmp_path / "explicit")
    rep = execute_sql(
        spark,
        f"CREATE TABLE adhoc (id BIGINT, v DOUBLE) LOCATION '{loc}'",
    )
    assert rep == {"created": True, "path": loc, "version": 1}
    # uncataloged IF NOT EXISTS against an existing location is a no-op
    rep2 = execute_sql(
        spark,
        f"CREATE TABLE IF NOT EXISTS adhoc (id BIGINT, v DOUBLE) "
        f"LOCATION '{loc}'",
    )
    assert rep2["created"] is False
    with pytest.raises(ValueError, match="LOCATION|catalog"):
        execute_sql(spark, "CREATE TABLE nowhere (id INT)")
