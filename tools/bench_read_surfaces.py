"""Measure the standard-surface (Python datasource) read overhead vs the
engine class on the SAME snapshot table (r9 verdict #7).

The engine class scans through Spark's native parquet reader (JVM
vectorized, whole-stage codegen); the datasource path runs pyarrow in
Python workers with Arrow batches crossing the socket. Both are
one-task-per-file with dv merge-on-read, so the delta IS the
Python-worker tax — the number that justifies "use the engine class for
hot paths, the datasource for tool compatibility".

Builds one snapshot table from ``lineitem`` (the largest table) with a
dv delete so merge-on-read is exercised on both surfaces, then times an
identical full-scan aggregate three ways:

- ``engine_class_read``: ``SnapshotTable.read()`` -> groupBy/agg
- ``datasource_read``: ``spark.read.format("wopen_snapshot")`` -> same
- ``datasource_read_projected``: same, but selecting only the two
  aggregate columns — how much of the tax column pruning claws back
  (the engine path prunes via parquet automatically; the datasource
  reads what the plan asks of the Python worker).

Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 python tools/bench_read_surfaces.py
Prints one JSON line; paste the numbers into the BENCH_SF*.md base.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.queries.registry import _t
    from wopen_spark.session import get_spark
    from wopen_spark.snapshot_table import SnapshotTable

    spark = get_spark("wopen-read-surfaces")
    spark.sparkContext.setLogLevel("ERROR")
    register_snapshot_datasource(spark)

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="wopen_rs_") + "/li")
    t0 = time.perf_counter()
    t.create(li.repartition(32), cluster_by=["l_orderkey"])
    t.delete_where("l_orderkey % 10 = 3", mode="dv")
    build = round(time.perf_counter() - t0, 3)

    def agg(df):
        return (
            df.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                # decimal sums: order-independent, so the three surfaces
                # compare EQUAL (double sums drift with task ordering)
                F.sum(F.col("l_quantity").cast("decimal(28,2)")).alias("q"),
                F.sum(F.col("l_extendedprice").cast("decimal(28,2)")).alias("p"),
            )
            .collect()
        )

    def timed(fn):
        t0 = time.perf_counter()
        rows = fn()
        return round(time.perf_counter() - t0, 3), sorted(map(tuple, rows))

    # warm both code paths once (worker pool, footer caches)
    agg(t.read().limit(100000))
    agg(spark.read.format("wopen_snapshot").load(t.path).limit(100000))

    t_engine, r_engine = timed(lambda: agg(t.read()))
    t_ds, r_ds = timed(
        lambda: agg(spark.read.format("wopen_snapshot").load(t.path))
    )
    t_ds_proj, r_proj = timed(
        lambda: agg(
            spark.read.format("wopen_snapshot")
            .load(t.path)
            .select("l_returnflag", "l_quantity", "l_extendedprice")
        )
    )
    assert r_engine == r_ds == r_proj, "surfaces disagree"

    # dv-free twin: same bytes, no deletion vectors — isolates the dv
    # merge-on-read strategy (engine: (file,row) anti-join; datasource:
    # per-task pyarrow row mask) from the raw scan tax
    t2 = SnapshotTable(spark, tempfile.mkdtemp(prefix="wopen_rs_") + "/li2")
    t2.create(li.filter("l_orderkey % 10 <> 3").repartition(32),
              cluster_by=["l_orderkey"])
    agg(t2.read().limit(100000))
    t2_engine, r2_engine = timed(lambda: agg(t2.read()))
    t2_ds, r2_ds = timed(
        lambda: agg(spark.read.format("wopen_snapshot").load(t2.path))
    )
    assert r2_engine == r2_ds == r_engine, "dv-free twin disagrees"

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": t.read().count(),
                "build_sec": build,
                "engine_class_read_sec": t_engine,
                "datasource_read_sec": t_ds,
                "datasource_read_projected_sec": t_ds_proj,
                "datasource_over_engine": round(t_ds / t_engine, 2),
                "nodv_engine_class_read_sec": t2_engine,
                "nodv_datasource_read_sec": t2_ds,
                "nodv_datasource_over_engine": round(t2_ds / t2_engine, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
