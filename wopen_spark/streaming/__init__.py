"""Structured Streaming wrappers (SURVEY §1.1 'stream' row, §7 M5)."""

from wopen_spark.streaming.pipeline import (
    available_now_aggregate,
    event_stream,
    windowed_counts,
)

__all__ = ["available_now_aggregate", "event_stream", "windowed_counts"]
