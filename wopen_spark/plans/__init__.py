"""Physical-plan inspection utilities."""

from wopen_spark.plans.inspect import (
    exchanges,
    executed_join_strategies,
    executed_plan_string,
    join_strategies,
    plan_string,
    pushed_filters,
    scan_schemas,
)

__all__ = [
    "exchanges",
    "executed_join_strategies",
    "executed_plan_string",
    "join_strategies",
    "plan_string",
    "pushed_filters",
    "scan_schemas",
]
