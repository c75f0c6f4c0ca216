"""Multi-statement SQL scripts, RESTORE TIMESTAMP AS OF, and the
datasource writer's clusterBy-on-create option."""
from __future__ import annotations

import time

import pytest

from wopen_spark.catalog import Catalog
from wopen_spark.snapshot_table import SnapshotTable
from wopen_spark.sql_dml import _split_statements, execute_sql, execute_sql_script


def test_split_statements_quotes_and_comments():
    script = """
    -- leading comment
    INSERT INTO t VALUES (1, 'a;b');  -- trailing comment with ; in it
    UPDATE t SET x = '--not a comment; still string' WHERE id = 1;
    SELECT * FROM t
    """
    parts = _split_statements(script)
    assert len(parts) == 3
    assert "a;b" in parts[0]
    assert "--not a comment; still string" in parts[1]
    assert parts[2].strip().startswith("SELECT")


def test_execute_sql_script_lifecycle(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    results = execute_sql_script(
        spark,
        """
        CREATE TABLE crm.t (id BIGINT, v DOUBLE) CLUSTER BY (id);
        INSERT INTO crm.t VALUES (1, 1.5);
        INSERT INTO crm.t VALUES (2, 2.5);
        UPDATE crm.t SET v = v * 2 WHERE id = 2;  -- becomes 5.0
        DESCRIBE HISTORY crm.t;
        """,
        catalog=cat,
    )
    assert results[0]["created"] is True
    assert results[4].count() == 4
    got = sorted(
        (r.id, r.v) for r in cat.handle(spark, "crm.t").read().collect()
    )
    assert got == [(1, 1.5), (2, 5.0)]


def test_restore_timestamp_as_of(spark, tmp_path):
    from datetime import datetime, timezone

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1,)], "id long"))
    time.sleep(0.05)
    mark = datetime.now(timezone.utc).isoformat()
    time.sleep(0.05)
    t.append(spark.createDataFrame([(2,)], "id long"))
    execute_sql(
        spark,
        f"RESTORE TABLE t TO TIMESTAMP AS OF '{mark}'",
        tables={"t": t},
    )
    assert [r.id for r in t.read().collect()] == [1]


def test_datasource_clusterby_on_create(spark, tmp_path):
    from pyspark.sql import functions as F

    from wopen_spark.datasource import register_snapshot_datasource

    register_snapshot_datasource(spark)
    path = str(tmp_path / "t")
    (
        spark.range(1000)
        .selectExpr("id", "CAST(id AS STRING) AS s")
        .repartitionByRange(4, F.col("id"))
        .write.format("wopen_snapshot")
        .option("clusterBy", "id")
        .mode("append")
        .save(path)
    )
    t = SnapshotTable(spark, path)
    state = t._state()
    assert state["cluster_by"] == ["id"]
    # pre-shaped ranges + declared key => point read prunes and the
    # leading-key blooms exist on the created shards
    df, rep = t.read_where({"id": (7, 7)})
    assert df.count() == 1
    assert rep["files_read"] == 1
    assert any("bloom" in m for m in state["files"].values())
    with pytest.raises(Exception, match="unknown column"):
        (
            spark.range(5).write.format("wopen_snapshot")
            .option("clusterBy", "nope")
            .mode("append")
            .save(str(tmp_path / "t2"))
        )


def test_show_create_table_roundtrip(spark, tmp_path):
    """SHOW CREATE TABLE emits a runnable script that recreates the
    table's shape at a new location, with identity resuming above the
    original's high-water mark."""
    cat = Catalog(str(tmp_path / "cat"))
    execute_sql(
        spark,
        "CREATE TABLE crm.src (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "name STRING, amount DECIMAL(10,2)) CLUSTER BY (name)",
        catalog=cat,
    )
    execute_sql(
        spark,
        "ALTER TABLE crm.src ADD CONSTRAINT amt_pos CHECK (amount >= 0)",
        catalog=cat,
    )
    execute_sql(
        spark, "INSERT INTO crm.src (name, amount) VALUES ('a', 5.00)",
        catalog=cat,
    )
    script = execute_sql(spark, "SHOW CREATE TABLE crm.src", catalog=cat)["script"]
    assert "GENERATED ALWAYS AS IDENTITY" in script
    assert "CLUSTER BY (name)" in script
    assert "ADD CONSTRAINT amt_pos" in script
    # re-point the location and the name, run it, verify the shape
    clone_loc = str(tmp_path / "clone")
    script2 = script.replace(f"LOCATION '{cat.resolve('crm.src')['path']}'",
                             f"LOCATION '{clone_loc}'").replace(
        "crm.src", "crm.clone"
    )
    execute_sql_script(spark, script2, catalog=cat)
    t2 = cat.handle(spark, "crm.clone")
    st = t2._state()
    assert st["cluster_by"] == ["name"]
    assert list(st["constraints"]) == ["amt_pos"]
    # identity resumes ABOVE the source's high-water
    execute_sql(
        spark, "INSERT INTO crm.clone (name, amount) VALUES ('b', 1.00)",
        catalog=cat,
    )
    src_ids = [r.id for r in cat.handle(spark, "crm.src").read().collect()]
    clone_ids = [r.id for r in t2.read().collect()]
    assert min(clone_ids) > max(src_ids)


def test_describe_detail(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
        .repartition(2),
        cluster_by=["id"],
    )
    t.delete_where("id = 1", mode="dv")
    row = execute_sql(spark, "DESCRIBE DETAIL t", tables={"t": t}).collect()[0]
    assert row.format == "wopen_snapshot"
    assert row.num_files == 2 and row.num_dv_masked_files == 1
    assert row.cluster_by == ["id"] and row.size_bytes > 0
    assert row.version == 2


def test_parser_property_roundtrips():
    """Property tests over the r10 parsers: CREATE TABLE defs with
    nested types and identity clauses, BETWEEN-range predicates, and
    script splitting with adversarial strings survive round trips."""
    from hypothesis import given, settings, strategies as st

    from wopen_spark.sql_dml import (
        _parse_between_ranges,
        _split_statements,
        _strip_identity_clauses,
        parse_create_table,
    )

    names = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True)
    types = st.sampled_from(
        ["INT", "BIGINT", "STRING", "DOUBLE", "DECIMAL(10,2)",
         "ARRAY<STRING>", "MAP<STRING,INT>", "DECIMAL(38,10)"]
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.tuples(names, types), min_size=1, max_size=6,
                 unique_by=lambda t: t[0])
    )
    def create_roundtrip(cols):
        ddl = ", ".join(f"{n} {t}" for n, t in cols)
        p = parse_create_table(f"CREATE TABLE t ({ddl}) LOCATION '/x'")
        assert p["ddl"] == ddl and p["location"] == "/x"

    create_roundtrip()

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                names,
                st.integers(-10**6, 10**6),
                st.integers(-10**6, 10**6),
            ),
            min_size=1, max_size=4, unique_by=lambda t: t[0],
        )
    )
    def between_roundtrip(terms):
        pred = " AND ".join(f"{n} BETWEEN {a} AND {b}" for n, a, b in terms)
        got = _parse_between_ranges(pred)
        assert got == {n: (a, b) for n, a, b in terms}

    between_roundtrip()

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_characters="';\"-", blacklist_categories=("Cs",)
                ),
                min_size=1, max_size=20,
            ).map(lambda s: s.replace("\n", " ").strip() or "x"),
            min_size=1, max_size=5,
        )
    )
    def split_roundtrip(payloads):
        stmts = [f"INSERT INTO t VALUES ('{p};--{p}')" for p in payloads]
        script = ";\n".join(stmts) + ";"
        parts = _split_statements(script)
        assert len(parts) == len(stmts)
        for p, s in zip(payloads, parts):
            assert f"'{p};--{p}'" in s

    split_roundtrip()

    @settings(max_examples=100, deadline=None)
    @given(names, st.integers(-100, 10**9), st.integers(1, 1000))
    def identity_strip(col, start, step):
        ddl = (
            f"{col} BIGINT GENERATED ALWAYS AS IDENTITY "
            f"(START WITH {start} INCREMENT BY {step}), v STRING"
        )
        clean, ident = _strip_identity_clauses(ddl)
        assert clean == f"{col} BIGINT, v STRING"
        assert ident == [(col, start, step)]

    identity_strip()
