"""Source connectors (SURVEY §2.1 S1-S8)."""

from wopen_spark.sources.http import http_csv_source, http_excel_source, http_zip_csv_source
from wopen_spark.sources.files import csv_source, csv_sink

__all__ = [
    "csv_sink",
    "csv_source",
    "http_csv_source",
    "http_excel_source",
    "http_zip_csv_source",
]
