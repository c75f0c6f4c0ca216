"""Physical-plan inspection utilities."""

from wopen_spark.plans.inspect import (
    exchanges,
    join_strategies,
    plan_string,
    pushed_filters,
    scan_schemas,
)

__all__ = [
    "exchanges",
    "join_strategies",
    "plan_string",
    "pushed_filters",
    "scan_schemas",
]
