"""Plan inspection utilities (scale-posture checks)."""

from agol_pandas_spark.plans.explain import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    scan_reads_only,
    uses_broadcast_join,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "scan_reads_only",
    "uses_broadcast_join",
]
