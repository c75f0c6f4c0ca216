"""wopen_snapshot over REMOTE roots (r8 verdict #1): the standard
reader/writer surfaces must reach object-store tables like the
SnapshotTable class does — partitions carry a store spec, executors
open bytes through it. S3 is exercised against a moto SERVER (real
HTTP, so the separate executor Python processes reach it — in-process
``mock_aws`` only covers the driver); file:// against the HadoopFs
stores the class auto-routes to.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo

from wopen_spark.datasource import (
    _SnapshotBatchReaderPushdown,
    register_snapshot_datasource,
)
from wopen_spark.snapshot_table import (
    S3ConditionalPutLogStore,
    S3DataStore,
    SnapshotTable,
)

moto = pytest.importorskip("moto")
pytest.importorskip("moto.server")

BUCKET = "wopen-ds-remote"


@pytest.fixture(scope="module")
def ds_spark(spark):
    register_snapshot_datasource(spark)
    return spark


@pytest.fixture(scope="module")
def s3env():
    """A real-HTTP moto S3 endpoint + a driver-side client against it."""
    import boto3
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    client = boto3.client(
        "s3",
        endpoint_url=endpoint,
        region_name="us-east-1",
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )
    client.create_bucket(Bucket=BUCKET)
    yield endpoint, client
    server.stop()


def _s3_table(spark, s3env, name, tmp_path) -> SnapshotTable:
    endpoint, client = s3env
    uri = f"s3://{BUCKET}/{name}"
    return SnapshotTable(
        spark,
        uri,
        log_store=S3ConditionalPutLogStore(f"{uri}/_log", client=client),
        data_store=S3DataStore(uri, str(tmp_path / "scratch"), client=client),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_s3_batch_read_applies_dv_and_mapping(ds_spark, s3env, tmp_path):
    """spark.read.format('wopen_snapshot').load('s3://...') — executors
    GET objects through boto3 from the partition spec; deletion vectors
    and column mapping apply exactly as on local roots."""
    endpoint, _ = s3env
    t = _s3_table(ds_spark, s3env, "t_read", tmp_path)
    df = ds_spark.range(0, 120).select(
        F.col("id").cast("long").alias("id"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    t.create(df.repartition(3), cluster_by=["id"])
    t.delete_where("id % 10 = 3", mode="dv")
    t.rename_column("name", "label")

    got = (
        ds_spark.read.format("wopen_snapshot")
        .option("s3_endpoint", endpoint)
        .load(t.path)
    )
    assert got.schema.simpleString() == t.read().schema.simpleString()
    assert _rows(got) == _rows(t.read())
    # time travel still works over s3
    v1 = (
        ds_spark.read.format("wopen_snapshot")
        .option("s3_endpoint", endpoint)
        .option("version", 1)
        .load(t.path)
    )
    assert v1.count() == 120


def test_s3_pushdown_prunes_files_without_changing_answers(
    ds_spark, s3env, tmp_path
):
    """The file-skip path (footer stats + bloom sidecars) reads its
    metadata through the S3 store: a point read plans fewer tasks than
    the table has files, and answers are unchanged."""
    endpoint, _ = s3env
    t = _s3_table(ds_spark, s3env, "t_prune", tmp_path)
    df = ds_spark.range(0, 900).select(F.col("id").cast("long").alias("id"))
    t.create(df.repartitionByRange(6, "id"), cluster_by=["id"])
    n_files = len(t._state()["files"])
    assert n_files >= 4

    opts = {"path": t.path, "s3_endpoint": endpoint}
    reader = _SnapshotBatchReaderPushdown(t.path, opts)
    reader.pushFilters([EqualTo(("id",), 17)])
    parts = reader.partitions()
    assert 0 < len(parts) < n_files, (len(parts), n_files)
    rows = [
        r
        for p in parts
        for b in reader.read(p)
        for r in b.to_pylist()
        if r["id"] == 17
    ]
    assert len(rows) == 1


def test_s3_cdf_stream_and_datasource_write(ds_spark, s3env, tmp_path):
    """writeStream CDF source over s3 + df.write through the data source
    into a NEW s3 table (executors spool shards locally and upload)."""
    endpoint, client = s3env
    src = _s3_table(ds_spark, s3env, "t_cdf", tmp_path)
    src.create(ds_spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    src.append(ds_spark.createDataFrame([(3, "c")], "id long, v string"))
    src.delete_where("id = 1")

    out_dir = str(tmp_path / "out")
    q = (
        ds_spark.readStream.format("wopen_snapshot")
        .option("readChangeFeed", "true")
        .option("s3_endpoint", endpoint)
        .load(src.path)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None, q.exception()
    got = sorted(
        (r.id, r.v, r["_change_type"], r["_commit_version"])
        for r in ds_spark.read.parquet(out_dir).collect()
    )
    assert got == [
        (1, "a", "delete", 3),
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
        (3, "c", "insert", 2),
    ]

    # batch write path to a fresh s3 table
    w_uri = f"s3://{BUCKET}/t_written"
    df = ds_spark.range(0, 50).select(F.col("id").cast("long").alias("id"))
    (
        df.repartition(3)
        .write.format("wopen_snapshot")
        .option("s3_endpoint", endpoint)
        .mode("append")
        .save(w_uri)
    )
    back = (
        ds_spark.read.format("wopen_snapshot")
        .option("s3_endpoint", endpoint)
        .load(w_uri)
    )
    assert sorted(r.id for r in back.collect()) == list(range(50))
    # and the engine class sees the same table
    t2 = SnapshotTable(
        ds_spark,
        w_uri,
        log_store=S3ConditionalPutLogStore(f"{w_uri}/_log", client=client),
        data_store=S3DataStore(w_uri, str(tmp_path / "s2"), client=client),
    )
    assert t2.read().count() == 50


def test_file_uri_roundtrip_via_hadoopfs_created_table(ds_spark, tmp_path):
    """A table created through the class's auto-routed HadoopFs stores
    (file:// URI) is readable AND appendable through the data source —
    the two surfaces share one on-disk protocol."""
    uri = f"file://{tmp_path}/t"
    t = SnapshotTable(ds_spark, uri)
    t.create(
        ds_spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    got = ds_spark.read.format("wopen_snapshot").load(uri)
    assert _rows(got) == _rows(t.read())

    ds_spark.createDataFrame([(3, "c")], "id long, v string").write.format(
        "wopen_snapshot"
    ).mode("append").save(uri)
    assert t.read().count() == 3
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]


def test_catalog_on_s3_resolves_s3_table(ds_spark, s3env, tmp_path):
    """The named-table catalog living ON the object store: registry
    commits ride the conditional-PUT log store, and a registered s3
    table resolves through every by-name surface — Catalog.handle,
    execute_sql, and the datasource's wopen:// route (the entry's
    s3_endpoint option reaches the partitions executors read with)."""
    from wopen_spark.catalog import Catalog
    from wopen_spark.sql_dml import execute_sql

    endpoint, client = s3env
    t = _s3_table(ds_spark, s3env, "cat_tbl", tmp_path)
    t.create(
        ds_spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, val double"
        ).coalesce(1)
    )

    cat = Catalog(f"s3://{BUCKET}/catalog", s3_endpoint=endpoint)
    cat.register(
        "crm.remote", f"s3://{BUCKET}/cat_tbl",
        options={"s3_endpoint": endpoint},
    )
    # a second handle on the same root sees the registration (registry
    # state lives in the store, not the object)
    cat2 = Catalog(f"s3://{BUCKET}/catalog", s3_endpoint=endpoint)
    assert cat2.tables() == ["crm.remote"]

    h = cat2.handle(ds_spark, "crm.remote")
    assert sorted(r.id for r in h.read().collect()) == [1, 2]

    execute_sql(
        ds_spark, "UPDATE crm.remote SET val = val * 2 WHERE id = 2",
        catalog=cat2,
    )
    df = (
        ds_spark.read.format("wopen_snapshot")
        .option("catalogRoot", f"s3://{BUCKET}/catalog")
        .option("s3_endpoint", endpoint)  # for the catalog root itself
        .load("wopen://crm.remote")
    )
    assert sorted((r.id, r.val) for r in df.collect()) == [(1, 1.0), (2, 4.0)]
