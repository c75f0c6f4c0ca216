"""Scalar function library — pure Column expressions (JVM-side, codegen).

Everything here stays inside whole-stage codegen: no Python UDFs. The
reference implements these with pandas ``str`` methods and row-wise
``apply`` (SURVEY §2.10); at 100 TB they must be vectorized expressions.
"""

from wopen_spark.functions.strings import (
    capitalize_first,
    clean_image,
    normalize_slug,
    sanitize_column_name,
    sanitize_columns,
)
from wopen_spark.functions.dates import availability_calendar, french_date_str
from wopen_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "availability_calendar",
    "capitalize_first",
    "clean_image",
    "doc_fingerprint",
    "french_date_str",
    "language_id",
    "normalize_slug",
    "quality_score",
    "sanitize_column_name",
    "sanitize_columns",
    "token_count",
]
