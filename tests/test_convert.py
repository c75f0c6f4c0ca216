"""In-place parquet adoption (``convert_from_parquet`` / SQL ``CONVERT
TO SNAPSHOT``): zero-copy conversion of an existing directory, full
engine machinery on adopted files, and vacuum's ability to sweep
superseded adopted files that live outside the managed ``data/``
layout."""
from __future__ import annotations

import os

import pytest

from wopen_spark.snapshot_table import SnapshotTable


def _plain_parquet_dir(spark, path, n=100, parts=4):
    from pyspark.sql import functions as F

    spark.range(n).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 7 AS STRING) AS tag"
    ).repartitionByRange(parts, F.col("id")).write.mode("overwrite").parquet(
        str(path)
    )
    return str(path)


def test_convert_zero_copy_and_read(spark, tmp_path):
    root = _plain_parquet_dir(spark, tmp_path / "d")
    before = {
        n: os.stat(os.path.join(root, n)).st_mtime_ns
        for n in os.listdir(root) if n.endswith(".parquet")
    }
    t = SnapshotTable(spark, root)
    assert t.convert_from_parquet() == 1
    # zero-copy: the SAME files, untouched, are the manifest
    after = {
        n: os.stat(os.path.join(root, n)).st_mtime_ns
        for n in os.listdir(root) if n.endswith(".parquet")
    }
    assert before == after
    state = t._state()
    assert set(state["files"]) == set(before)
    assert sorted(r.id for r in t.read().collect()) == list(range(100))
    # footer stats arrived with adoption: a point read prunes files
    df, rep = t.read_where({"id": (3, 3)})
    assert df.count() == 1
    assert rep["files_skipped_by_stats"] == len(before) - 1


def test_convert_then_full_machinery(spark, tmp_path):
    root = _plain_parquet_dir(spark, tmp_path / "d")
    t = SnapshotTable(spark, root)
    t.convert_from_parquet(cluster_by=["id"])
    assert t._state()["cluster_by"] == ["id"]
    t.delete_where("id % 10 = 0", mode="dv")
    assert t.read().count() == 90
    t.append(
        spark.range(100, 110).selectExpr(
            "id", "id * 2 AS v", "CAST(id % 7 AS STRING) AS tag"
        )
    )
    assert t.read().count() == 100
    # time travel to the conversion commit
    assert t.read(version=1).count() == 100
    assert sorted(r.id for r in t.read(version=1).collect())[:3] == [0, 1, 2]


def test_convert_nested_and_distributed_metas(spark, tmp_path):
    """Nested (non-hive) subdirs adopt with their relative paths; the
    distributed footer scan (forced via the threshold) agrees with the
    driver loop."""
    root = tmp_path / "d"
    _plain_parquet_dir(spark, root / "2024" / "a", n=40, parts=2)
    _plain_parquet_dir(spark, root / "2024" / "b", n=60, parts=2)
    t = SnapshotTable(spark, str(root))
    old = SnapshotTable._CONVERT_DISTRIBUTE_MIN_FILES
    SnapshotTable._CONVERT_DISTRIBUTE_MIN_FILES = 1
    try:
        t.convert_from_parquet()
    finally:
        SnapshotTable._CONVERT_DISTRIBUTE_MIN_FILES = old
    state = t._state()
    assert all(r.startswith("2024/") for r in state["files"])
    assert t.read().count() == 100
    for meta in state["files"].values():
        assert meta["rows"] > 0 and "id" in meta["stats"]


def test_convert_refusals(spark, tmp_path):
    # hive-partitioned
    root = tmp_path / "hive"
    spark.range(10).selectExpr("id", "id % 2 AS p").write.partitionBy(
        "p"
    ).parquet(str(root))
    with pytest.raises(ValueError, match="Hive-partitioned"):
        SnapshotTable(spark, str(root)).convert_from_parquet()
    # empty dir
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no parquet"):
        SnapshotTable(spark, str(empty)).convert_from_parquet()
    # existing table
    root2 = _plain_parquet_dir(spark, tmp_path / "d2")
    t = SnapshotTable(spark, root2)
    t.convert_from_parquet()
    with pytest.raises(FileExistsError):
        SnapshotTable(spark, root2).convert_from_parquet()


def test_vacuum_sweeps_superseded_adopted_files(spark, tmp_path):
    """OPTIMIZE migrates adopted files into the managed layout; vacuum
    must then delete the originals even though they are outside data/
    — but never rmtree the user's directory."""
    root = _plain_parquet_dir(spark, tmp_path / "d")
    marker = os.path.join(root, "_SUCCESS")
    assert os.path.exists(marker), "spark writes a _SUCCESS marker"
    t = SnapshotTable(spark, root)
    t.convert_from_parquet(cluster_by=["id"])
    originals = sorted(t._state()["files"])
    t.compact(target_files=1)
    removed = t.vacuum(retain_last=1, orphan_grace_s=0.0)
    assert removed >= len(originals)
    for rel in originals:
        assert not os.path.exists(os.path.join(root, rel))
    assert os.path.exists(marker), "user files must survive the sweep"
    assert t.read().count() == 100


def test_sql_convert_statement(spark, tmp_path):
    from wopen_spark.catalog import Catalog
    from wopen_spark.sql_dml import execute_sql

    root = _plain_parquet_dir(spark, tmp_path / "d")
    cat = Catalog(str(tmp_path / "cat"))
    rep = execute_sql(
        spark,
        f"CONVERT TO SNAPSHOT '{root}' CLUSTER BY (id) AS lake.adopted",
        catalog=cat,
    )
    assert rep["version"] == 1 and rep["registered"] == "lake.adopted"
    assert cat.tables() == ["lake.adopted"]
    execute_sql(
        spark, "DELETE FROM lake.adopted WHERE id >= 50", catalog=cat
    )
    assert cat.handle(spark, "lake.adopted").read().count() == 50
    with pytest.raises(ValueError, match="needs a catalog"):
        execute_sql(spark, f"CONVERT TO SNAPSHOT '{root}x' AS a.b")


def test_cdf_over_convert_and_copy(spark, tmp_path):
    """The change feed treats adoption and COPY INTO like any data
    commit: adopted rows and copied rows arrive as inserts at their
    versions, so an incremental consumer of a converted table starts
    from a complete picture."""
    root = _plain_parquet_dir(spark, tmp_path / "d", n=20, parts=2)
    t = SnapshotTable(spark, root)
    t.convert_from_parquet()
    ch1 = t.read_changes(0, 1)
    assert ch1.count() == 20
    assert ch1.select("_change_type").distinct().collect() == [("insert",)]

    import pyarrow as pa
    import pyarrow.parquet as pq

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    pq.write_table(
        pa.table({"id": [100], "v": [200], "tag": ["z"]}),
        str(inbox / "a.parquet"),
    )
    t.copy_into(str(inbox))
    ch2 = t.read_changes(1, 2)
    assert [(r.id, r._change_type) for r in ch2.collect()] == [(100, "insert")]
