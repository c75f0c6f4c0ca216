"""SQL MERGE INTO front-door: the parser's grammar coverage and the
end-to-end dispatch to SnapshotTable.merge_into."""

from __future__ import annotations

import pytest

from wopen_spark.snapshot_table import SnapshotTable
from wopen_spark.sql_dml import execute_merge, parse_merge


def test_parser_full_grammar():
    p = parse_merge(
        """
        MERGE INTO tgt AS trg
        USING (SELECT * FROM cdc) src
        ON trg.id = src.id AND trg.k2 = src.k2
        WHEN MATCHED AND src.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET val = src.val * 2, name = upper(trg.name)
        WHEN NOT MATCHED AND src.op = 'I' THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE;
        """
    )
    assert p["keys"] == ["id", "k2"]
    assert p["matched"][1]["set"] == {
        "val": "s.val * 2",
        "name": "upper(t.name)",
    }
    assert p["not_matched"] == [{"action": "insert", "cond": "s.op = 'I'"}]
    assert p["not_matched_by_source"] == [{"action": "delete", "cond": None}]
    assert not p["leftover"]


def test_parser_edge_cases():
    # top-level comma split respects parens and string literals
    p = parse_merge(
        "MERGE INTO a USING v s ON a.id = s.id WHEN MATCHED THEN "
        "UPDATE SET x = coalesce(s.x, 0, a.x), y = 's.lit, t.lit'"
    )
    assert p["matched"][0]["set"] == {
        "x": "coalesce(s.x, 0, t.x)",
        "y": "'s.lit, t.lit'",
    }
    # t.col on the SET left side is accepted
    p2 = parse_merge(
        "MERGE INTO a t USING v s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.x = s.x"
    )
    assert p2["matched"][0]["set"] == {"x": "s.x"}


@pytest.mark.parametrize(
    "bad,frag",
    [
        ("MERGE INTO a USING v s ON a.id = s.other WHEN MATCHED THEN DELETE", "SAME column"),
        ("MERGE INTO a USING v s ON a.id > s.id WHEN MATCHED THEN DELETE", "equi-terms"),
        ("MERGE INTO a USING v s ON a.id = s.id WHEN MATCHED THEN INSERT *", "cannot INSERT"),
        ("MERGE INTO a USING v s ON a.id = s.id WHEN NOT MATCHED THEN DELETE", "INSERT \\* only"),
        ("MERGE INTO a USING (SELECT 1) ON a.id = s.id WHEN MATCHED THEN DELETE", "alias"),
        ("SELECT 1", "unparseable"),
    ],
)
def test_parser_rejects(bad, frag):
    with pytest.raises(ValueError, match=frag):
        parse_merge(bad)


def test_execute_merge_end_to_end(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id int, name string, val double",
        ),
        cluster_by=["id"],
    )
    spark.createDataFrame(
        [(2, "B", 200.0, "U"), (3, None, None, "D"), (9, "i", 90.0, "I")],
        "id int, name string, val double, op string",
    ).createOrReplaceTempView("cdc_batch")

    rep = execute_merge(
        spark,
        """
        MERGE INTO tgt AS trg
        USING cdc_batch AS src
        ON trg.id = src.id
        WHEN MATCHED AND src.op = 'D' THEN DELETE
        WHEN MATCHED AND src.op = 'U' THEN UPDATE SET name = src.name, val = src.val
        WHEN NOT MATCHED AND src.op = 'I' THEN INSERT *
        """,
        tables={"tgt": t},
        mode="dv",
    )
    assert rep["files_rewritten"] == 0
    rows = sorted((r.id, r.name, r.val) for r in t.read().collect())
    assert rows == [(1, "a", 10.0), (2, "B", 200.0), (9, "i", 90.0)]

    # subquery source + by-source delete = full sync from SQL
    execute_merge(
        spark,
        """
        MERGE INTO tgt t USING (SELECT 1 AS id, 'z' AS name, 0.0 AS val) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET name = s.name
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """,
        tables={"tgt": t},
    )
    rows = sorted((r.id, r.name) for r in t.read().collect())
    assert rows == [(1, "z")]

    with pytest.raises(ValueError, match="unknown merge target"):
        execute_merge(
            spark,
            "MERGE INTO nope USING cdc_batch s ON nope.id = s.id "
            "WHEN MATCHED THEN DELETE",
            tables={"tgt": t},
        )


def test_case_when_in_set_survives_clause_split():
    """r8 review finding: a SET expression containing CASE WHEN .. END
    was truncated at the CASE's WHEN by the regex splitter. The scanner
    must keep it whole and still find the NEXT merge clause."""
    from wopen_spark.sql_dml import parse_update

    p = parse_merge(
        "MERGE INTO a t USING v s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET x = CASE WHEN s.x > 1 THEN s.x "
        "ELSE t.x END, y = s.y "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert p["matched"][0]["set"] == {
        "x": "CASE WHEN s.x > 1 THEN s.x ELSE t.x END",
        "y": "s.y",
    }
    assert p["not_matched"] == [{"action": "insert", "cond": None}]
    # and in an UPDATE statement's SET/WHERE too
    u = parse_update(
        "UPDATE tgt SET x = CASE WHEN y = 1 THEN 2 ELSE 3 END "
        "WHERE z IN (1, 2)"
    )
    assert u["set"] == {"x": "CASE WHEN y = 1 THEN 2 ELSE 3 END"}
    assert u["where"] == "z IN (1, 2)"


def test_deeply_nested_using_subquery_parses():
    """r8 review finding: the USING pattern tolerated one paren level;
    coalesce(nullif(a,b),c) in the subquery failed. Any nesting now."""
    p = parse_merge(
        "MERGE INTO a t USING (SELECT coalesce(nullif(x, (1+2)), abs(-(3))) "
        "AS id FROM v WHERE x IN (SELECT y FROM w)) s "
        "ON t.id = s.id WHEN MATCHED THEN DELETE"
    )
    assert p["source_sql"].startswith("(SELECT coalesce(nullif")
    assert p["keys"] == ["id"]


def test_explicit_column_insert_parses():
    p = parse_merge(
        "MERGE INTO a t USING v s ON t.id = s.id "
        "WHEN NOT MATCHED AND s.op = 'I' THEN "
        "INSERT (id, name, val) VALUES (s.id, upper(s.name), s.val * 2)"
    )
    assert p["not_matched"] == [
        {
            "action": "insert",
            "cond": "s.op = 'I'",
            "values": {
                "id": "s.id",
                "name": "upper(s.name)",
                "val": "s.val * 2",
            },
        }
    ]
    with pytest.raises(ValueError, match="count mismatch"):
        parse_merge(
            "MERGE INTO a t USING v s ON t.id = s.id "
            "WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id)"
        )
    with pytest.raises(ValueError, match="listed twice"):
        parse_merge(
            "MERGE INTO a t USING v s ON t.id = s.id "
            "WHEN NOT MATCHED THEN INSERT (id, id) VALUES (s.id, s.id)"
        )


def test_explicit_column_insert_end_to_end(spark, tmp_path):
    """INSERT (cols) VALUES (exprs): expressions evaluate against s.*,
    unmentioned columns land NULL; INSERT * clauses coexist with
    first-match-wins across the insert clause list."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10.0)], "id int, name string, val double"
        ),
        cluster_by=["id"],
    )
    spark.createDataFrame(
        [(5, "x", 50.0, "lo"), (6, "y", 60.0, "hi")],
        "id int, name string, val double, band string",
    ).createOrReplaceTempView("ins_src")
    execute_merge(
        spark,
        """
        MERGE INTO tgt t USING ins_src s ON t.id = s.id
        WHEN NOT MATCHED AND s.band = 'hi'
            THEN INSERT (id, name) VALUES (s.id, concat(s.name, '!'))
        WHEN NOT MATCHED THEN INSERT *
        """,
        tables={"tgt": t},
    )
    rows = sorted(
        (r.id, r.name, r.val) for r in t.read().collect()
    )
    # 5 fell through to INSERT * (full source image); 6 hit the explicit
    # clause first (val unmentioned -> NULL, name transformed)
    assert rows == [(1, "a", 10.0), (5, "x", 50.0), (6, "y!", None)]


def test_sql_update_and_delete_end_to_end(spark, tmp_path):
    from wopen_spark.sql_dml import execute_delete, execute_update

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(10)],
            "id int, name string, val double",
        ),
        cluster_by=["id"],
    )
    rep = execute_update(
        spark,
        "UPDATE tgt AS g SET val = g.val * 10, name = upper(g.name) "
        "WHERE g.id < 3",
        tables={"tgt": t},
    )
    assert rep["version"] == 2
    rows = {r.id: (r.name, r.val) for r in t.read().collect()}
    assert rows[0] == ("N0", 0.0) and rows[2] == ("N2", 20.0)
    assert rows[5] == ("n5", 5.0)

    rep = execute_delete(
        spark, "DELETE FROM tgt WHERE id % 2 = 1", tables={"tgt": t}, mode="dv"
    )
    assert rep["files_rewritten"] == 0  # dv mode masks, never rewrites
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 4, 6, 8]

    # WHERE-less forms hit every row (ANSI semantics)
    execute_update(
        spark, "UPDATE tgt SET val = 0", tables={"tgt": t}
    )
    assert {r.val for r in t.read().collect()} == {0.0}
    execute_delete(spark, "DELETE FROM tgt", tables={"tgt": t})
    assert t.read().count() == 0


@pytest.mark.parametrize(
    "bad,frag",
    [
        ("UPDATE tgt WHERE id = 1", "unparseable UPDATE"),
        ("UPDATE tgt SET WHERE id = 1", "at least one SET"),
        ("UPDATE tgt SET x = 1 WHERE", "empty WHERE"),
        ("DELETE tgt WHERE id = 1", "unparseable DELETE"),
        ("DELETE FROM tgt extra words here", "unparseable DELETE"),
    ],
)
def test_update_delete_parser_rejects(bad, frag):
    from wopen_spark.sql_dml import parse_delete, parse_update

    with pytest.raises(ValueError, match=frag):
        (parse_update if bad.startswith("UPDATE") else parse_delete)(bad)


def test_sql_insert_into_values_and_select(spark, tmp_path):
    from wopen_spark.sql_dml import execute_insert, parse_insert

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10.0)], "id int, name string, val double"
        ),
        cluster_by=["id"],
    )
    # full-arity VALUES (multi-row, literal commas in strings)
    execute_insert(
        spark,
        "INSERT INTO tgt VALUES (2, 'b,with comma', 20.0), (3, 'c', 30.0)",
        tables={"tgt": t},
    )
    # explicit-column VALUES: unlisted column lands NULL
    execute_insert(
        spark, "INSERT INTO tgt (id, name) VALUES (4, 'd')", tables={"tgt": t}
    )
    # SELECT form
    spark.createDataFrame([(5, "e", 50.0)], "id int, name string, val double")\
        .createOrReplaceTempView("ins_view")
    execute_insert(
        spark, "INSERT INTO tgt SELECT id, name, val FROM ins_view",
        tables={"tgt": t},
    )
    rows = sorted((r.id, r.name, r.val) for r in t.read().collect())
    assert rows == [
        (1, "a", 10.0), (2, "b,with comma", 20.0), (3, "c", 30.0),
        (4, "d", None), (5, "e", 50.0),
    ]

    with pytest.raises(ValueError, match="arity mismatch"):
        execute_insert(
            spark, "INSERT INTO tgt VALUES (9, 'x')", tables={"tgt": t}
        )
    with pytest.raises(ValueError, match="unknown column"):
        execute_insert(
            spark, "INSERT INTO tgt (nope) VALUES (1)", tables={"tgt": t}
        )
    # column list vs parenthesized SELECT disambiguation
    p = parse_insert("INSERT INTO tgt (SELECT 1, 'x', 2.0)")
    assert p["cols"] is None and p["select_sql"].startswith("(SELECT")


def test_sql_admin_statements_and_unified_dispatch(spark, tmp_path):
    """The admin surface a SQL-only consumer needs: DESCRIBE HISTORY,
    OPTIMIZE (bin-pack + ZORDER BY), RESTORE TO VERSION AS OF, VACUUM
    [RETAIN n VERSIONS] — plus execute_sql routing every statement kind
    through one entry point."""
    import os

    from wopen_spark.sql_dml import execute_admin, execute_sql

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(i, i % 5, float(i)) for i in range(50)],
            "id long, g int, val double",
        ).repartition(4),
        cluster_by=["id"],
    )
    # a few small appends -> bin-packable small files
    for k in range(2):
        execute_sql(
            spark,
            f"INSERT INTO tgt VALUES ({100 + k}, 0, 1.5)",
            tables={"tgt": t},
        )
    execute_sql(
        spark, "UPDATE tgt SET val = val + 1 WHERE id = 1", tables={"tgt": t}
    )

    hist = execute_admin(spark, "DESCRIBE HISTORY tgt", tables={"tgt": t})
    ops = [r.operation for r in hist.orderBy("version").collect()]
    assert ops[0] == "create" and "append" in ops and "update" in ops

    n_before = len(t._state()["files"])
    rep = execute_sql(spark, "OPTIMIZE tgt", tables={"tgt": t})
    assert rep.get("noop") or rep["files_after"] < rep["files_before"], rep
    assert len(t._state()["files"]) <= n_before

    rep = execute_admin(
        spark, "OPTIMIZE tgt ZORDER BY (id, g)", tables={"tgt": t}
    )
    assert rep, rep

    head = t.latest_version()
    execute_sql(
        spark, f"RESTORE tgt TO VERSION AS OF {head - 1}", tables={"tgt": t}
    )
    assert t.latest_version() == head + 1  # restore is a NEW commit

    rep = execute_sql(
        spark, "VACUUM tgt RETAIN 1 VERSIONS", tables={"tgt": t}
    )
    assert rep["removed"] >= 0
    assert t.read().count() == 52  # logical rows untouched throughout

    with pytest.raises(ValueError, match="unsupported statement"):
        execute_sql(spark, "SELECT 1", tables={})
    with pytest.raises(ValueError, match="unparseable admin"):
        execute_admin(spark, "VACUUM tgt RETAIN x", tables={"tgt": t})


def test_dotted_target_unaliased_strips_qualifier():
    """r9 verdict #6: a dotted target used WITHOUT a declared alias
    (``UPDATE db.tbl SET x = db.tbl.x + 1``) must strip the full
    multi-segment qualifier — the old word-scan matched only ``db`` and
    left an unresolvable ``db.tbl.x`` behind."""
    from wopen_spark.sql_dml import parse_delete, parse_merge, parse_update

    u = parse_update(
        "UPDATE db.tbl SET x = db.tbl.x + 1 WHERE db.tbl.y IN (1, 2)"
    )
    assert u == {
        "target": "db.tbl",
        "set": {"x": "x + 1"},
        "where": "y IN (1, 2)",
    }
    d = parse_delete("DELETE FROM crm.events WHERE crm.events.id = 7")
    assert d == {"target": "crm.events", "where": "id = 7"}
    # near-miss names never strip: db.tblx is NOT the db.tbl qualifier
    u2 = parse_update("UPDATE db.tbl SET x = db.tblx.x")
    assert u2["set"] == {"x": "db.tblx.x"}
    # MERGE: dotted unaliased target in ON and actions
    p = parse_merge(
        "MERGE INTO db.tbl USING src s ON db.tbl.id = s.id "
        "WHEN MATCHED THEN UPDATE SET x = db.tbl.x + s.x"
    )
    assert p["keys"] == ["id"]
    assert p["matched"][0]["set"] == {"x": "t.x + s.x"}


def test_dotted_alias_property_roundtrip():
    """Property test over dotted/undotted targets and alias presence:
    every qualified reference resolves to a bare (or t./s.) column,
    string literals containing 'alias.' are untouched."""
    from wopen_spark.sql_dml import _rewrite_aliases

    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.from_regex(r"[a-z_][a-z0-9_]{0,5}", fullmatch=True)

    @settings(max_examples=120, deadline=None)
    @given(segs=st.lists(seg, min_size=1, max_size=3), col=seg)
    def check(segs, col):
        alias = ".".join(segs)
        out = _rewrite_aliases(f"{alias}.{col} + '{alias}.{col}'", alias)
        assert out == f"{col} + '{alias}.{col}'"
        if alias != "s":  # t/s alias collision is ambiguous SQL
            out2 = _rewrite_aliases(f"{alias}.{col} + s.{col}", alias, "s")
            assert out2 == f"t.{col} + s.{col}"

    check()
