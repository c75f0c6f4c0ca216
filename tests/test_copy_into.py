"""COPY INTO — file-level exactly-once ingestion: re-runs skip
already-loaded files, modified files reload, the loaded-file set rides
commits and checkpoints, and concurrent copies of the same directory
never double-load."""
from __future__ import annotations

import os

import pytest

from wopen_spark.snapshot_table import SnapshotTable
from wopen_spark.sql_dml import execute_sql


def _write_file(spark, path, lo, hi):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table({"id": list(range(lo, hi)), "v": [i * 2 for i in range(lo, hi)]}),
        path,
    )


def test_copy_into_idempotent_rerun(spark, tmp_path):
    inbox = tmp_path / "inbox"
    _write_file(spark, str(inbox / "a.parquet"), 0, 10)
    _write_file(spark, str(inbox / "b.parquet"), 10, 20)
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([], "id long, v long"))

    rep = t.copy_into(str(inbox))
    assert (rep["files_loaded"], rep["files_skipped"]) == (2, 0)
    assert t.read().count() == 20
    # re-run: nothing new, no commit
    rep2 = t.copy_into(str(inbox))
    assert (rep2["files_loaded"], rep2["files_skipped"]) == (0, 2)
    assert rep2["version"] == rep["version"]
    # a third file arrives: only it loads
    _write_file(spark, str(inbox / "c.parquet"), 20, 25)
    rep3 = t.copy_into(str(inbox))
    assert (rep3["files_loaded"], rep3["files_skipped"]) == (1, 2)
    assert sorted(r.id for r in t.read().collect()) == list(range(25))


def test_copy_into_modified_file_reloads(spark, tmp_path):
    inbox = tmp_path / "inbox"
    p = str(inbox / "a.parquet")
    _write_file(spark, p, 0, 5)
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([], "id long, v long"))
    t.copy_into(str(inbox))
    assert t.read().count() == 5
    # rewrite the file with different contents (new bytes = new identity)
    _write_file(spark, p, 100, 103)
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on fast writes
    rep = t.copy_into(str(inbox))
    assert rep["files_loaded"] == 1
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4, 100, 101, 102]


def test_copy_into_csv_with_options_and_pattern(spark, tmp_path):
    inbox = tmp_path / "inbox"
    os.makedirs(inbox)
    (inbox / "x.csv").write_text("id,v\n1,10\n2,20\n")
    (inbox / "skip.txt").write_text("id,v\n9,90\n")
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([], "id long, v long"))
    rep = t.copy_into(
        str(inbox), file_format="csv", pattern="*.csv",
        options={"header": "true", "inferSchema": "true"},
    )
    assert rep["files_loaded"] == 1
    assert sorted((r.id, r.v) for r in t.read().collect()) == [(1, 10), (2, 20)]


def test_copy_into_survives_checkpoint(spark, tmp_path):
    """The loaded-file set must fold into checkpoints: after enough
    commits to roll one, a fresh handle still skips loaded files."""
    from wopen_spark.snapshot_table import CHECKPOINT_EVERY

    inbox = tmp_path / "inbox"
    _write_file(spark, str(inbox / "a.parquet"), 0, 5)
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([], "id long, v long"))
    t.copy_into(str(inbox))
    for i in range(CHECKPOINT_EVERY + 1):
        t.append(spark.createDataFrame([(1000 + i, 0)], "id long, v long"))
    t2 = SnapshotTable(spark, str(tmp_path / "t"))
    assert t2.copy_into(str(inbox))["files_loaded"] == 0


def test_sql_copy_into(spark, tmp_path):
    from wopen_spark.catalog import Catalog

    inbox = tmp_path / "inbox"
    _write_file(spark, str(inbox / "a.parquet"), 0, 7)
    cat = Catalog(str(tmp_path / "cat"))
    execute_sql(
        spark,
        f"CREATE TABLE lake.t (id BIGINT, v BIGINT) "
        f"LOCATION '{tmp_path / 't'}'",
        catalog=cat,
    )
    rep = execute_sql(
        spark,
        f"COPY INTO lake.t FROM '{inbox}' FILEFORMAT = PARQUET",
        catalog=cat,
    )
    assert rep["files_loaded"] == 1
    rep2 = execute_sql(
        spark, f"COPY INTO lake.t FROM '{inbox}'", catalog=cat
    )
    assert rep2["files_loaded"] == 0
    assert cat.handle(spark, "lake.t").read().count() == 7
    with pytest.raises(ValueError, match="FORMAT_OPTIONS"):
        execute_sql(
            spark,
            f"COPY INTO lake.t FROM '{inbox}' FORMAT_OPTIONS (bad)",
            catalog=cat,
        )


def test_copy_into_refusals(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([], "id long, v long"))
    with pytest.raises(ValueError, match="not a directory"):
        t.copy_into(str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="FILEFORMAT"):
        t.copy_into(str(tmp_path), file_format="avro")


def test_streaming_landing_zone_composition(spark, tmp_path):
    """Spark's built-in file streaming source over a landing directory
    composed with the exactly-once wopen_snapshot sink: the standard
    'auto-ingest' topology needs zero custom code — checkpointed file
    tracking upstream, txn-versioned commits downstream."""
    from wopen_spark.datasource import register_snapshot_datasource

    register_snapshot_datasource(spark)
    inbox = tmp_path / "inbox"
    _write_file(spark, str(inbox / "a.parquet"), 0, 10)
    _write_file(spark, str(inbox / "b.parquet"), 10, 15)
    out = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")

    def run():
        (
            spark.readStream.schema("id long, v long")
            .parquet(str(inbox))
            .writeStream.format("wopen_snapshot")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .option("txnApp", "landing_zone")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    run()
    t = SnapshotTable(spark, out)
    assert t.read().count() == 15
    # new file lands; a second availableNow run ingests ONLY it
    _write_file(spark, str(inbox / "c.parquet"), 15, 18)
    run()
    assert sorted(r.id for r in t.read().collect()) == list(range(18))
