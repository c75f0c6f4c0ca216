"""Throwaway experiment: engine dv merge-on-read anti-join keyed on the
string file basename (current) vs a minted int file id (tiny broadcast
dim maps basename -> id on both sides). Measures whether primitive join
keys reduce the dv tax enough to justify the extra plumbing."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from wopen_spark.queries.registry import _t
    from wopen_spark.session import get_spark
    from wopen_spark.snapshot_table import SnapshotTable, _DV_FILE, _DV_ROW

    spark = get_spark("wopen-dv-exp")
    spark.sparkContext.setLogLevel("ERROR")

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="wopen_dvx_") + "/li")
    t.create(li.repartition(32), cluster_by=["l_orderkey"])
    t.delete_where("l_orderkey % 10 = 3", mode="dv")

    state = t._state()
    schema_json, mapping = state["schema"], state["column_mapping"]
    masked = sorted(state["dvs"])
    dv_rels = sorted({p for r in masked for p in state["dvs"][r]})
    dv_bytes = sum(t._data.size(r) for r in dv_rels)
    print("masked files:", len(masked), "dv parquets:", len(dv_rels),
          "dv bytes:", dv_bytes)

    def agg(df):
        return (
            df.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(28,2)")).alias("q"),
            )
            .collect()
        )

    def timed(label, fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            rows = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"{label}: best {best:.3f}s")
        return sorted(map(tuple, rows))

    scan = t._read_files(masked, schema_json, mapping, lineage=True)
    dvf = t._dv_frame(dv_rels)

    # A: current — broadcast anti-join on (string file, long row)
    a = lambda: agg(
        scan.join(F.broadcast(dvf), [_DV_FILE, _DV_ROW], "left_anti")
        .drop(_DV_FILE, _DV_ROW)
    )

    # B: int file-id keys — tiny dim maps basename->id on both sides
    basenames = [r.rsplit("/", 1)[-1] for r in masked]
    dim = spark.createDataFrame(
        [(b, i) for i, b in enumerate(basenames)], f"{_DV_FILE} string, _fid int"
    )
    dv2 = (
        dvf.join(F.broadcast(dim), _DV_FILE)
        .select("_fid", _DV_ROW)
    )
    b = lambda: agg(
        scan.join(F.broadcast(dim), _DV_FILE)
        .join(F.broadcast(dv2), ["_fid", _DV_ROW], "left_anti")
        .drop("_fid", _DV_FILE, _DV_ROW)
    )

    # C: no dv at all (floor)
    c = lambda: agg(scan.drop(_DV_FILE, _DV_ROW))

    ra = timed("A string-key anti-join", a)
    rb = timed("B int-key anti-join  ", b)
    timed("C no-dv floor         ", c)
    assert ra == rb, "variants disagree"


if __name__ == "__main__":
    main()
