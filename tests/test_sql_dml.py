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
