"""wopen_spark — a PySpark-native batch/enrichment analytics engine.

A from-scratch rebuild of the data-processing capabilities of the
``nlisch/wopen`` reference pipeline (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame plans optimized by Catalyst, shuffle-
and broadcast-aware joins, partitioned idempotent sinks, and scalable
implementations of the reference's signature operators (fuzzy similarity
join, per-row HTTP enrichment) plus large-scale training-data-pipeline
operators (dedup, ANN similarity search, text analysis).

Designed for a 1000-executor cluster on 100 TB; tested on local[32].
"""

from wopen_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
