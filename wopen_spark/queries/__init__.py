"""Query registry package — importing this populates QUERIES/ORACLES."""

from wopen_spark.queries.registry import ORACLES, QUERIES, query

# Each module registers its queries at import time.
from wopen_spark.queries import core  # noqa: E402,F401
from wopen_spark.queries import windows  # noqa: E402,F401
from wopen_spark.queries import strings_dates  # noqa: E402,F401
from wopen_spark.queries import dedup  # noqa: E402,F401
from wopen_spark.queries import similarity  # noqa: E402,F401
from wopen_spark.queries import text_analysis  # noqa: E402,F401
from wopen_spark.queries import multimodal  # noqa: E402,F401
from wopen_spark.queries import streaming_q  # noqa: E402,F401
from wopen_spark.queries import joins_q  # noqa: E402,F401
from wopen_spark.queries import graph_q  # noqa: E402,F401
from wopen_spark.queries import analytics_q  # noqa: E402,F401
from wopen_spark.queries import curation_q  # noqa: E402,F401
from wopen_spark.queries import retrieval_q  # noqa: E402,F401
from wopen_spark.queries import relational_q  # noqa: E402,F401
from wopen_spark.queries import preprocess_q  # noqa: E402,F401
from wopen_spark.queries import scrub_q  # noqa: E402,F401
from wopen_spark.queries import tpch_q  # noqa: E402,F401
from wopen_spark.queries import index_q  # noqa: E402,F401
from wopen_spark.queries import mixture_q  # noqa: E402,F401
from wopen_spark.queries import sql_q  # noqa: E402,F401
from wopen_spark.queries import classify_q  # noqa: E402,F401

__all__ = ["ORACLES", "QUERIES", "query"]
