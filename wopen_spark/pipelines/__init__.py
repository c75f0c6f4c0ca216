"""End-to-end pipeline parity with the reference's three chains
(SURVEY §3): associations acquisition, events, WordPress sync-back.
External systems (WordPress, Sheets, Slack, search APIs) sit behind
injectable adapters so the chains run hermetically in tests."""

from wopen_spark.pipelines.associations import (
    AssociationsConfig,
    custom_search_stage,
    similarity_stage,
)
from wopen_spark.pipelines.events import EventsConfig, process_events, update_events
from wopen_spark.pipelines.validation import (
    CsvSheetStore,
    ValidationConfig,
    assos_to_sheet,
    update_assos,
    validation_retreatment,
)
from wopen_spark.pipelines.wp_export import wp_export

__all__ = [
    "AssociationsConfig",
    "CsvSheetStore",
    "EventsConfig",
    "ValidationConfig",
    "assos_to_sheet",
    "custom_search_stage",
    "similarity_stage",
    "process_events",
    "update_assos",
    "update_events",
    "validation_retreatment",
    "wp_export",
]
