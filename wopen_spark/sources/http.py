"""HTTP sources (SURVEY §2.1 S1-S3).

The reference reads CSVs straight off HTTP into pandas
(process_open_data.py:34-36 ';'-sep UTF-8; wp_export_data.py:24-32) and a
zip of CSVs (custom_search_extraction.py:69-87, ISO-8859-1, usecols,
bad-line skip). Spark cannot stream an HTTP body directly, so the
connector downloads to a local spool (driver-side — these feeds are
single files; a 100 TB ingest would land on object storage first and use
a plain distributed ``spark.read``) and hands the path to the distributed
CSV reader, keeping header/`sep`/encoding/malformed-row semantics.

``url_opener`` is injectable for tests (file:// URLs work out of the box
via urllib).
"""

from __future__ import annotations

import os
import tempfile
import urllib.request
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Opener = Callable[[str], bytes]


def _default_opener(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.read()


def _spool(data: bytes, suffix: str) -> str:
    fd, path = tempfile.mkstemp(suffix=suffix, prefix="wopen_src_")
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    return path


def http_csv_source(
    spark: SparkSession,
    url: str,
    sep: str = ";",
    encoding: str = "UTF-8",
    opener: Opener = _default_opener,
) -> DataFrame:
    """S1: GET a CSV and read it distributed, dropping malformed lines
    (the reference's ``error_bad_lines=False``)."""
    path = _spool(opener(url), ".csv")
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("escape", '"')  # RFC-4180 doubled quotes, like pandas
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def http_zip_csv_source(
    spark: SparkSession,
    url: str,
    columns: list[str] | None = None,
    sep: str = ";",
    encoding: str = "ISO-8859-1",
    opener: Opener = _default_opener,
) -> DataFrame:
    """S2: GET a zip, extract every member, read them as one DataFrame.

    The member union is free: all extracted files go to one directory and
    the distributed CSV reader globs it (the reference concats member
    frames in memory, custom_search_extraction.py:83-87). ``columns``
    replicates ``usecols`` — applied as a select so column pruning reaches
    the scan.
    """
    zpath = _spool(opener(url), ".zip")
    out_dir = tempfile.mkdtemp(prefix="wopen_zip_")
    with zipfile.ZipFile(zpath) as zf:
        for member in zf.namelist():
            # zip-slip guard: reject absolute or dir-escaping member paths
            norm = os.path.normpath(member)
            if os.path.isabs(norm) or norm.startswith("..") or ":" in norm.split(os.sep)[0]:
                raise ValueError(f"unsafe zip member path: {member!r}")
        zf.extractall(out_dir)
    df = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("escape", '"')  # RFC-4180 doubled quotes, like pandas
        .option("mode", "DROPMALFORMED")
        .csv(os.path.join(out_dir, "*"))
    )
    if columns:
        df = df.select(*columns)
    return df


def http_excel_source(
    spark: SparkSession,
    url: str,
    sheet: int | str = 0,
    opener: Opener = _default_opener,
) -> DataFrame:
    """S3: remote .xlsx lookup table (custom_search_extraction.py:92-94).

    Tiny dimension tables only (the reference's social-object
    nomenclature): parsed driver-side with the pure-stdlib xlsx reader
    (sources/xlsx.py — no Excel engine in this container), then
    parallelized as the broadcast-join side of J1.
    """
    from pyspark.sql import types as T

    from wopen_spark.sources.xlsx import read_xlsx

    names, rows = read_xlsx(opener(url), sheet=sheet)
    if not names:
        raise ValueError(f"empty xlsx sheet at {url}")

    # explicit schema: per-column from the values (all-null -> string;
    # int+float mix -> double), so Spark never hits "type cannot be
    # determined" on sparse lookup tables
    def col_type(i: int) -> T.DataType:
        vals = [r[i] for r in rows if r[i] is not None]
        if any(isinstance(v, str) for v in vals) or not vals:
            return T.StringType()
        if any(isinstance(v, bool) for v in vals):
            return T.BooleanType()
        if any(isinstance(v, float) for v in vals):
            return T.DoubleType()
        return T.LongType()

    types = [col_type(i) for i in range(len(names))]
    schema = T.StructType(
        [T.StructField(n, t, True) for n, t in zip(names, types)]
    )

    def coerce(v, t):
        if v is None:
            return None
        if isinstance(t, T.StringType):
            return str(v)
        if isinstance(t, T.DoubleType):
            return float(v)
        return v

    data = [tuple(coerce(v, t) for v, t in zip(r, types)) for r in rows]
    return spark.createDataFrame(data, schema=schema)
