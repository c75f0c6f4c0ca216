"""Structured Streaming coverage in the correctness gate.

AvailableNow over a static input is deterministic (every file processed in
this run, no late data), so the streaming windowed aggregate must equal
the equivalent batch GROUP BY — which is exactly what the DuckDB oracle
states. This pins the watermark/window semantics, not just "it runs".
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.queries.registry import query
from wopen_spark.streaming.pipeline import available_now_aggregate


@query(
    "streaming_hourly_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a watermark, executed as an
    AvailableNow streaming query over the events file; a fresh checkpoint
    per call reprocesses the full (static) input."""
    ckpt = tempfile.mkdtemp(prefix="wopen_stream_ckpt_")
    out = available_now_aggregate(spark, sf_dir, ckpt, window="1 hour")
    return out.orderBy("window_start", "event_type")
