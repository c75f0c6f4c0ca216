import sys, time, os
repo = sys.argv[1]
sys.path.insert(0, repo)
os.chdir(repo)
from wopen_spark.session import get_spark
from wopen_spark.snapshot_table import SnapshotTable
from wopen_spark.datasource import _SnapshotBatchReader, register_snapshot_datasource
from pyspark.sql import functions as F
import tempfile
spark = get_spark("ds-demo")
spark.sparkContext.setLogLevel("ERROR")
register_snapshot_datasource(spark)
root = tempfile.mkdtemp() + "/t"
t = SnapshotTable(spark, root)
# 600 one-file commits -> 600 data files (a CDC-accreted table shape)
df = spark.range(0, 600_000).select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
t.create(df.repartition(600), cluster_by=None)
n_files = len(t._state()["files"])
parts = _SnapshotBatchReader(t.path, {}).partitions()
print(f"files={n_files} planned_tasks={len(parts)}")
got = spark.read.format("wopen_snapshot").load(t.path)
t0 = time.perf_counter()
assert got.count() == 600_000
print(f"read_wall={time.perf_counter()-t0:.2f}s")
