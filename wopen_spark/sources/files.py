"""Local file sources/sinks (SURVEY §2.1 S7, §2.2 K4)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def csv_source(
    spark: SparkSession, path: str, sep: str = ";", header: bool = True
) -> DataFrame:
    """S7: read a hand-off CSV (update_open_data.py:68)."""
    return (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("escape", '"')  # RFC-4180 doubled quotes, like pandas
        .csv(path)
    )


def csv_sink(df: DataFrame, path: str, sep: str = ";", header: bool = True) -> str:
    """K4: write a single ``;``-separated UTF-8 CSV with a stable filename
    (process_open_data.py:273 hand-off to WP All Import).

    ``coalesce(1)`` is deliberate: the hand-off contract is ONE file a
    downstream system polls by name. Only use for export-sized results —
    big outputs should stay partitioned (``df.write.csv(dir)``).
    """
    tmp = tempfile.mkdtemp(prefix="wopen_csv_")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", header)
        .option("sep", sep)
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)
    return path


def jsonl_sink(df: DataFrame, path: str, partitions: int | None = None) -> str:
    """Write a DataFrame as JSON-Lines — the interchange format every
    training-data pipeline ultimately emits (one JSON doc per line,
    splittable, streamable). Stays PARTITIONED (a directory of part
    files): JSONL exports are corpus-sized, so there is deliberately no
    coalesce(1) here — the single-file contract belongs to csv_sink.
    """
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
    return path


def jsonl_source(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a JSONL directory/file. An explicit schema skips the
    inference scan (one full read of the data!) — always pass one in
    production; inference is for exploration only."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def orc_sink(df: DataFrame, path: str, partition_by: list[str] | None = None) -> str:
    """Write a DataFrame as ORC — the columnar interchange format for
    Hive-ecosystem consumers (predicate pushdown and column pruning work
    the same as parquet on the read side). Partitioned layout when
    ``partition_by`` is given, mirroring the parquet Table layer."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path


def orc_source(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC directory/file; partition-directory columns come back
    as real columns, filters and projections push into the ORC reader."""
    return spark.read.orc(path)
